"""Training-data curation EVALUATION tour — the measurement half of a
data pipeline:

    select with DSIR importance weights -> split WITHOUT group leakage
    -> score the split's quality signal with an exact ROC-AUC
    -> mine hard negatives for a contrastive fine-tune
    -> catch multimodal duplicates by perceptual fingerprint

Every step is a hash-oracled catalog entry (see DRIVER_COVERAGE.md),
so this tour is a narrated walk through verified operators, not a
demo-only code path.

Usage:
    python examples/training_data_eval.py [SF_DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    import flo_spark as fs
    from flo_spark.queries_ext import (
        auc_quality_classifier,
        audio_fingerprint_neardup,
        dsir_importance_resample,
        group_leakage_safe_split,
        hard_negative_mining,
        image_dhash_neardup,
    )

    spark = fs.get_spark("training-data-eval-tour")

    print("== 1. DSIR importance resampling ==")
    picked = dsir_importance_resample(spark, sf_dir)
    top = picked.limit(5).collect()
    print(f"top-{picked.count()} raw-pool docs by target-likelihood ratio;")
    for r in top:
        print(
            f"  doc {r['doc_id']:>5}  lang={r['lang']}  "
            f"score={r['dsir_score']}  ({r['n_toks']} tokens)"
        )

    print("\n== 2. Group-leakage-safe split ==")
    for r in group_leakage_safe_split(spark, sf_dir).collect():
        print(
            f"  {r['split']:>5}: {r['n_events']:>6} events / "
            f"{r['n_users']:>4} users   no_leakage={r['no_leakage']}"
        )

    print("\n== 3. Exact ROC-AUC of the length->English signal ==")
    auc = auc_quality_classifier(spark, sf_dir).collect()[0]
    print(
        f"  AUC={auc['auc']}  (pos={auc['n_pos']}, neg={auc['n_neg']}, "
        f"tie-aware Mann-Whitney, exact integers)"
    )

    print("\n== 4. Hard negatives for contrastive training ==")
    hn = hard_negative_mining(spark, sf_dir)
    for r in hn.filter(F.col("q_id") < 3).collect():
        print(
            f"  anchor {r['q_id']} (label {r['q_label']}) <- "
            f"neg {r['neg_id']} (label {r['neg_label']}) cos={r['cos_sim']}"
        )

    print("\n== 5. Perceptual fingerprint dedup (image + audio) ==")
    n_img = image_dhash_neardup(spark, sf_dir).count()
    n_aud = audio_fingerprint_neardup(spark, sf_dir).count()
    print(f"  dHash image pairs found:    {n_img} (planted: 40)")
    print(f"  audio fingerprint pairs:    {n_aud} (planted: 40)")

    spark.stop()
    print("\ntour complete")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
