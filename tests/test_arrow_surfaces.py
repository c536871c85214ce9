"""Arrow-native API surface: mapInArrow (RecordBatch-level transform,
no pandas materialization), arrow-optimized Python UDFs, and the
DataFrame <-> pyarrow interchange — the zero-copy paths a Python-heavy
pipeline should prefer at scale."""

import pyarrow as pa
from pyspark.sql import functions as F


def test_map_in_arrow_matches_jvm_result(spark, sf_dir):
    """mapInArrow transforms pyarrow RecordBatches directly — one
    less conversion than mapInPandas (no pandas materialization), the
    right shape for numeric batch work."""
    from flo_spark import queries as Q

    docs = Q.load(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def double_chars(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.compute.multiply(batch.column("n_chars"), 2),
                ],
                names=["doc_id", "doubled"],
            )

    got = docs.mapInArrow(double_chars, "doc_id long, doubled long")
    expected = docs.select(
        "doc_id", (F.col("n_chars") * 2).alias("doubled")
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_arrow_optimized_python_udf(spark):
    """Spark 4 arrow-optimized scalar UDFs (useArrow=True) transfer
    batches over Arrow instead of pickled rows — same semantics,
    different (faster) serialization path."""
    from pyspark.sql.functions import udf

    @udf(returnType="long", useArrow=True)
    def plus_one(v):
        return v + 1

    out = spark.range(100).select(plus_one("id").alias("v"))
    assert out.agg(F.sum("v")).collect()[0][0] == sum(range(1, 101))


def test_dataframe_pyarrow_interchange(spark):
    """toArrow() and createDataFrame(pyarrow.Table) round-trip the
    schema and values — the interchange boundary with Arrow-native
    tools (DuckDB, polars, Ray datasets)."""
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, x double"
    )
    tbl = df.toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 2
    back = spark.createDataFrame(tbl)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
