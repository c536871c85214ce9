"""Skew salting + bucketed co-located joins — the explicit-partitioning
scale toolkit (SURVEY §2 Part B scale notes)."""

import pytest
from pyspark.sql import functions as F

from flo_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, dim, "k", salt=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched_left(spark, skewed):
    fact, dim = skewed
    fact2 = fact.withColumn("k", F.col("k") + 90)  # some keys miss the dim
    plain = fact2.join(dim, "k", "left")
    salted = salted_join(fact2, dim, "k", salt=4, how="left")
    assert plain.count() == salted.count()
    assert plain.filter(F.col("name").isNull()).count() == salted.filter(
        F.col("name").isNull()
    ).count()


def test_salted_join_spreads_hot_key(spark, skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, "k", salt=8)
    # the hot key's rows must carry >1 distinct salt upstream of the
    # join: verify via the internal salt expression itself
    salts = (
        fact.filter(F.col("k") == 7)
        .select(F.pmod(F.xxhash64(*fact.columns), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert salts == 8
    assert out.filter(F.col("k") == 7).count() == fact.filter(F.col("k") == 7).count()


def test_salted_join_rejects_full_outer(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full_outer")


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows:
    the join plan contains NO Exchange — the 100 TB recipe for a
    repeatedly-joined fact/dim pair."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    orders = spark.range(0, 5_000).select(
        F.col("id").alias("o_id"), (F.col("id") % 5).alias("status")
    )
    lines = spark.range(0, 20_000).select(
        (F.col("id") % 5_000).alias("o_id"), F.col("id").alias("line_id")
    )
    orders.write.bucketBy(8, "o_id").sortBy("o_id").option(
        "path", str(tmp_path / "b_orders")
    ).saveAsTable("b_orders")
    lines.write.bucketBy(8, "o_id").sortBy("o_id").option(
        "path", str(tmp_path / "b_lines")
    ).saveAsTable("b_lines")

    # force the sort-merge path (tiny test tables would broadcast,
    # which bypasses bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lines").join(spark.table("b_orders"), "o_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 20_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lines")
