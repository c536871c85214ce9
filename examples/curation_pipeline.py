"""End-to-end training-data curation demo — the pipeline a reference
user actually runs, chained from the engine's public operators:

    raw corpus -> rule-based quality filter -> MinHash near-dedup
    -> deterministic train/val/test split -> BPE token accounting
    -> per-split report

Usage:
    python examples/curation_pipeline.py [SF_DIR]

Defaults to /root/testdata/sf0.001.  Every stage is the same code the
oracle-checked catalog entries use; this script just composes them and
prints the funnel report.
"""

import os
import sys

# runnable from anywhere: put the repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from flo_spark.operators.dedup import minhash_dedup_keep
    from flo_spark.queries import load
    from flo_spark.session import get_spark

    spark = get_spark("curation-demo")
    docs = load(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. rule-based quality filter (integer-exact lexical features)
    f = docs.withColumn("ws", F.split("text", " ")).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.expr("size(ws)").alias("n_words"),
        F.expr("(1000 * size(array_distinct(ws))) div size(ws)").alias(
            "r_distinct"
        ),
    )
    kept = f.filter((F.col("n_words") >= 20) & (F.col("r_distinct") >= 300))
    n_quality = kept.count()

    # 2. MinHash LSH near-dedup (keep-first)
    deduped = minhash_dedup_keep(kept.select("doc_id", "text", "lang", "source"))
    n_dedup = deduped.count()

    # 3. deterministic multiplicative-hash split (stable under growth)
    bucket = (F.col("doc_id") * F.lit(2654435761)) % 1000
    split = deduped.withColumn(
        "split",
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test"),
    )

    # 4. token accounting per split (whitespace proxy; swap in
    #    bpe_encode_tokens for the trained-tokenizer variant)
    report = (
        split.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.expr("size(split(text, ' '))")).alias("n_tokens"),
        )
        .orderBy("split")
        .collect()
    )

    print(f"raw documents:        {n_raw}")
    print(f"after quality filter: {n_quality}")
    print(f"after near-dedup:     {n_dedup}")
    for r in report:
        print(f"  {r.split:5s}  docs={r.n_docs:6d}  tokens={r.n_tokens}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
