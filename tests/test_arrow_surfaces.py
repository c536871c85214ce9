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


def test_apply_in_arrow_grouped(spark):
    """groupBy().applyInArrow — the RecordBatch-level grouped map (no
    pandas hop): per-group aggregation over pa.Table in, pa.Table out,
    with explicit result types (Arrow does not coerce int64->int32)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "k int, v int"
    )

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array([t["k"][0].as_py()], type=pa.int32()),
                "s": pa.array([pc.sum(t["v"]).as_py()], type=pa.int64()),
            }
        )

    got = sorted(
        (r["k"], r["s"])
        for r in df.groupBy("k").applyInArrow(summarize, "k int, s long").collect()
    )
    assert got == [(1, 30), (2, 30)]


def test_polymorphic_udtf_with_analyze(spark):
    """Spark 4 polymorphic UDTF: the output schema is COMPUTED at plan
    time by a static analyze() from the call's literal arguments —
    the table-function analog of schema inference, pinned here with a
    width-N expansion."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import IntegerType, StructType

    class Expand:
        @staticmethod
        def analyze(n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"c{i}", IntegerType())
            return AnalyzeResult(schema=st)

        def eval(self, n):
            yield tuple(range(n))

    spark.udtf.register("flo_expand_poly", udtf(Expand))
    three = spark.sql("SELECT * FROM flo_expand_poly(3)")
    assert three.columns == ["c0", "c1", "c2"]
    assert three.collect() == [(0, 1, 2)]
    five = spark.sql("SELECT * FROM flo_expand_poly(5)")
    assert len(five.columns) == 5  # same function, different shape


def test_scan_metadata_columns(spark, tmp_path):
    """The _metadata hidden struct + input_file_name(): row-level
    provenance from the scan itself — what a 100 TB audit joins on to
    trace a bad record back to its file without a lineage system."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "prov")
    spark.range(100).repartition(4).write.parquet(path)
    df = spark.read.parquet(path).select(
        "id",
        F.col("_metadata.file_path").alias("fp"),
        F.input_file_name().alias("ifn"),
    )
    rows = df.collect()
    assert len(rows) == 100
    assert all(r["fp"].endswith(".parquet") and r["ifn"] for r in rows)
    # one distinct provenance path per written file
    assert df.select("fp").distinct().count() == 4
    # the two mechanisms name the same file (URI escaping differs, so
    # compare the basename, not the full string)
    base = lambda c: F.element_at(F.split(c, "/"), -1)  # noqa: E731
    assert df.filter(base(F.col("fp")) != base(F.col("ifn"))).count() == 0
