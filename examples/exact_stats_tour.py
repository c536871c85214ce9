"""Exact-statistics tour — classical inference on Spark with NO
floating-point drift:

    trend:      Theil-Sen robust slope + its Mann-Kendall significance
    drift:      two-sample Kolmogorov-Smirnov with an exact verdict
    experiment: diff-in-diff effect + Welch t^2 significance
    calibrate:  reliability deciles -> exact isotonic (minimax) fit
    associate:  Kendall tau-a (the correlation that needs no sqrt)

Every statistic is integer/fixed-point arithmetic end to end — run it
twice, on any engine, and the bytes match (each step is a hash-oracled
catalog entry; see DRIVER_COVERAGE.md).

Usage:
    python examples/exact_stats_tour.py [SF_DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> None:
    import flo_spark as fs
    from flo_spark.queries_ext import (
        diff_in_diff_revenue,
        isotonic_calibration_minimax,
        kendall_tau_user_metrics,
        ks_drift_priority,
        mann_kendall_trend_test,
        theil_sen_hourly_trend,
        welch_t2_ab_test,
    )

    spark = fs.get_spark("exact-stats-tour")

    print("== trend: Theil-Sen slope of the hourly event rate ==")
    sen = theil_sen_hourly_trend(spark, sf_dir).collect()[0]
    print(
        f"  slope {sen.sen_slope_x1e6 / 1e6:+.4f} events/hour "
        f"(median of {sen.n_pairs} pairwise slopes over "
        f"{sen.n_hours} hours)"
    )
    mk = mann_kendall_trend_test(spark, sf_dir).collect()[0]
    verdict = "significant" if mk.reject_005 else "not significant"
    print(
        f"  Mann-Kendall S={mk.s_stat}, z^2={mk.z2_x1e6 / 1e6:.3f} "
        f"-> trend {verdict} at alpha=0.05"
    )

    print("== drift: KS test, URGENT vs LOW order prices ==")
    ks = ks_drift_priority(spark, sf_dir).collect()[0]
    print(
        f"  D={ks.ks_x1e6 / 1e6:.4f} at ${ks.ks_at_cents / 100:,.2f} "
        f"(n={ks.n_1}/{ks.n_2}) -> "
        + ("REJECT same-distribution" if ks.ks_reject_005 else "no drift")
    )

    print("== experiment: diff-in-diff + Welch t^2 ==")
    did = diff_in_diff_revenue(spark, sf_dir).collect()[0]
    print(
        f"  cells ctrl {did.mean_ctrl_pre_x1e4 / 1e4:,.2f} -> "
        f"{did.mean_ctrl_post_x1e4 / 1e4:,.2f}, treat "
        f"{did.mean_treat_pre_x1e4 / 1e4:,.2f} -> "
        f"{did.mean_treat_post_x1e4 / 1e4:,.2f}; "
        f"DiD = {did.did_x1e4 / 1e4:+,.2f}"
    )
    w = welch_t2_ab_test(spark, sf_dir).collect()[0]
    print(
        f"  Welch t^2 (A vs R price) = {w.t2_x1e4 / 1e4:.3f} "
        f"(compare against t_crit^2 ~ 3.84)"
    )

    print("== calibrate: deciles then the exact isotonic fit ==")
    iso = isotonic_calibration_minimax(spark, sf_dir).orderBy("chars_lo")
    rows = iso.collect()
    assert all(r.monotone for r in rows)
    lo, hi = rows[0], rows[-1]
    print(
        f"  {len(rows)} buckets; en-rate calibrated "
        f"{lo.iso_rate_x1e6 / 1e6:.3f} (@{lo.chars_lo} chars) -> "
        f"{hi.iso_rate_x1e6 / 1e6:.3f} (@{hi.chars_lo}), provably monotone"
    )

    print("== associate: Kendall tau-a, activity vs spend ==")
    kt = kendall_tau_user_metrics(spark, sf_dir).collect()[0]
    print(
        f"  tau_a = {kt.tau_a_x1e6 / 1e6:+.4f} "
        f"({kt.concordant} concordant / {kt.discordant} discordant "
        f"of {kt.n_pairs} pairs)"
    )

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
