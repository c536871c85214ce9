#!/usr/bin/env python3
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "spread": {name: [min, max] of the timed samples}, "sf": ...}

value = total wall seconds across the headline query set (lower=better).
Each query is executed to completion (count + head collect) so the full
plan runs; session/JVM startup is excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flo_consume_vv",
    "flo_glob_recursive",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customers",
    "top3_customers_per_nation",
    "asof_last_click_before_purchase",
    "dedup_exact",
    "dedup_minhash_lsh",
    "token_count",
    "embedding_topk_bruteforce",
    "stream_tumbling_counts",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from flo_spark.session import get_spark
    from flo_spark.queries import queries

    # 1-min load average BEFORE the session spins up: with the "end"
    # sample this lets a reader machine-detect an externally loaded
    # host (r9's 10.0 s driver run vs 6.7 s idle runs was argued from
    # spreads; now it is a recorded field).
    load_start = round(os.getloadavg()[0], 2)

    spark = get_spark("flo_spark_bench")
    qmap = queries()

    # Warm the JVM, codegen, and parquet reader paths untimed: file
    # listing + footer reads + one real scan per table.  Steady-state
    # throughput is the metric; single-process JIT warmup is not.
    # NOTE: go through load() — events.parquet needs the nanosAsLong
    # conf it sets; a bare spark.read.parquet throws and skips the warm.
    from flo_spark.queries import load

    spark.range(1).count()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            load(spark, sf_dir, t).count()
        except Exception:
            pass
    # spawn the Arrow Python workers once (reused for every pandas-UDF
    # stage afterwards; spark.python.worker.reuse is on by default)
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # compile the common codegen shapes once (hash agg, window, join,
    # top-k): the first headline query otherwise absorbs the Janino/JIT
    # cost of every template it touches
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    _r = spark.range(10000).withColumn("g", (_F.col("id") % 10).cast("int"))
    _r.groupBy("g").agg(_F.count("*"), _F.sum("id")).count()
    _r.withColumn(
        "rn", _F.row_number().over(_W.partitionBy("g").orderBy("id"))
    ).count()
    _r.alias("a").join(_r.alias("b"), "id").count()
    _r.orderBy(_F.col("id").desc()).limit(5).count()

    # Median-of-3 after one untimed warmup execution per query: the
    # round-3 driver bench measured 41.8 s on byte-identical code that
    # ran 16.4 s the round before — single-shot numbers on a shared
    # host carry ±30%+ load noise, and the median of three absorbs a
    # transient spike without averaging it in.  The warmup execution
    # also supplies the sanity row count.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = qmap[name]
        # untimed warmup: full plan through the noop sink (count()
        # alone would let Catalyst prune computed columns and skip
        # codegen shapes the timed runs then pay for), plus the
        # 0-row-sanity count
        wdf = fn(spark, sf_dir)
        wdf.write.format("noop").mode("overwrite").save()
        n = wdf.count()
        samples: list[float] = []
        for _ in range(runs_per_query):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink: executes the FULL plan exactly once (count()
            # alone lets Catalyst prune computed columns;
            # count()+collect() would run the plan twice)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        # per-query [min, max] of the samples: the medians are now
        # dominated by ±100 ms host-load noise, and the spread lets a
        # reader separate a real regression (min moved) from load (max
        # moved) — BASELINE.md §3 methodology
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]
        detail = "/".join(f"{s:.2f}" for s in sorted(samples))
        print(
            f"# {name}: {timings[name]:.3f}s median of [{detail}] ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # proof that $SPARK_GRAFT_CPUS reached the session: the
                # scheduler's effective task-slot count (== the local[N]
                # core count), so a scaling run is verifiable from the
                # output alone
                "parallelism": spark.sparkContext.defaultParallelism,
                # 1-min load average at [session start, bench end]: an
                # externally loaded host is machine-detectable instead
                # of argued from per-query spreads (BASELINE.md §3)
                "load_avg": [load_start, round(os.getloadavg()[0], 2)],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
