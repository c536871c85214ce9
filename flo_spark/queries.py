"""Query catalog — every operator exposed as a (spark_fn, oracle_sql) pair.

Each entry is one operator/query from SURVEY.md §2 (flo semantics layer,
batch-relational layer, streaming layer, LLM-pipeline layer).  The
Spark implementation and the DuckDB oracle SQL live side by side so the
driver's correctness gate (row-count + schema + order-insensitive
value-hash at sf0.01) can verify them 1:1.

Conventions that keep the hash comparison meaningful:
- every computed column is aliased IDENTICALLY in Spark and SQL;
- floating aggregates are rounded (2dp for money sums, 4dp for ratios)
  in BOTH engines — double summation order differs between engines and
  the rounding granularity (1e-2) dwarfs the fp jitter (~1e-9 rel);
- every LIMIT/top-k orders by a unique tie-break key so both engines
  cut the same set.

The flo-semantics queries re-express the reference's consume pipeline
over the driver's `events` table by deriving flo's envelope columns:
partition := event_id % 4 (the ActorId), event_counter := event_id,
namespace := '/<event_type>/u<user_id mod 10>'.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flo_spark.functions.glob import glob_to_regex
from flo_spark.operators.consume import version_vector_filter

# --------------------------------------------------------------------------
# registry plumbing
# --------------------------------------------------------------------------


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


# -- exact money aggregation -----------------------------------------------
#
# Money columns in this testdata carry <= 4 fractional digits, so
# round(sum(x), 2) has ONE exact engine-independent answer — but double
# sums reach it order-dependently (the q7 one-cent flip), and Spark's
# decimal sums leave the long-backed fast path once the accumulator
# passes 18 digits (sum(decimal(18,4)) -> decimal(28,4)), costing
# ~3x on an aggregate-heavy scan (q1 at sf0.1: 0.25s double / 0.84s
# decimal / 0.25s scaled-long, measured interleaved).  The scaled-long
# form keeps exactness inside whole-stage codegen: each value becomes
# its exact 1e4-scaled integer, longs sum exactly, and the final
# half-up rounding to cents is integer arithmetic.
#
# Overflow contract: a single group's sum must stay under 2^63/1e4
# ~= 9.2e14 (921 trillion in money units).  Session ANSI mode (Spark 4
# default, asserted in tests) makes a breach RAISE [ARITHMETIC_OVERFLOW]
# loudly rather than wrap — at that scale switch the entry to the
# decimal(18,4) form used by the non-headline entries (exact at any
# magnitude, off the codegen fast path).  The DuckDB oracle sums BIGINT
# into HUGEINT, so the oracle side never overflows.


def money_scaled(col: Column) -> Column:
    """Exact 1e4-scaled integer of a <=4-fractional-digit money double.

    floor(x*1e4 + 0.5) rounds halves toward +INFINITY (for the
    positive money domain that is plain half-up; a negative half like
    -.00005 lands on the upper neighbor) — chosen because it is the
    one half rule both engines implement identically as pure IEEE
    floor, which is the whole point.  Property-tested against Decimal
    ground truth in tests/test_money_model.py."""
    return F.floor(col * 10000 + F.lit(0.5)).cast("long")


def money_sum(col: Column) -> Column:
    """``round(sum(col), 2)`` computed exactly: long sum of the scaled
    integers, half-up to cents in integer space, one final exact
    int->double conversion."""
    s = F.sum(money_scaled(col))
    return F.floor((s + F.lit(50)) / F.lit(100.0)) / F.lit(100.0)


def money_avg(col: Column) -> Column:
    """``round(avg(col), 4)`` computed from the exact scaled sum: the
    1e4 scale IS the 4-digit rounding grid, so avg*1e4 == s/n and one
    half-up floor lands the answer."""
    s = F.sum(money_scaled(col)).cast("double")
    return F.floor(s / F.count(F.lit(1)) + F.lit(0.5)) / F.lit(10000.0)


def money_sum_sql(expr: str) -> str:
    """DuckDB spelling of :func:`money_sum` (sum(BIGINT) is HUGEINT
    there — exact, never overflows)."""
    return (
        f"floor((sum(CAST(floor(({expr}) * 10000 + 0.5) AS BIGINT)) + 50)"
        " / 100.0) / 100.0"
    )


def money_avg_sql(expr: str) -> str:
    return (
        f"floor(CAST(sum(CAST(floor(({expr}) * 10000 + 0.5) AS BIGINT))"
        " AS DOUBLE) / count(*) + 0.5) / 10000.0"
    )


#: the TPC-H revenue aggregate, shared by several oracle strings
REVENUE_SQL = money_sum_sql("l.l_extendedprice * (1 - l.l_discount)")

_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """Fresh scratch directory under ONE session-scoped root that is
    removed at interpreter exit (ADVICE r4: per-call mkdtemp leaked
    across repeated bench/correctness runs).  Exit-time — not
    per-call — cleanup is required because the round-trip entries
    return LAZY DataFrames that read from these dirs when the caller
    collects, after the entry function has returned."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit
        import shutil
        import tempfile

        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="flo_spark_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    import tempfile

    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


def load(
    spark: SparkSession, sf_dir: str, table: str, min_ts: str | None = None
) -> DataFrame:
    """Read one testdata table.

    ``min_ts`` (UTC ``YYYY-MM-DD HH:MM:SS``, events only): time-horizon
    predicate applied to the RAW nanos column *before* the
    timestamp_micros conversion.  A filter written against the
    converted column sits above a non-invertible expression, so only
    IsNotNull reaches the scan; filtering the raw long makes the bound
    land in PushedFilters and prune parquet row groups by min/max
    stats — the difference between a TTL job scanning 100 TB and
    scanning just the expiring tail."""
    # Session TZ must be UTC for every tz-sensitive expression —
    # the events NTZ->TIMESTAMP cast below, but also date->timestamp
    # casts and epoch math in orders/lineitem queries — to agree with
    # the DuckDB oracle's naive-as-UTC reading.  get_spark pins it,
    # but the driver supplies its own session, so pin it on every
    # table load (all queries read through here).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{table}.parquet"
    if table == "events":
        # events.parquet ts encoding has varied across testdata
        # generations; normalize every shape to a session-TZ TIMESTAMP:
        #   TIMESTAMP(NANOS)        -> Spark rejects; read ns-as-long
        #   TIMESTAMP_MICROS ntz    -> Spark reads TIMESTAMP_NTZ
        #   TIMESTAMP_MICROS utc    -> Spark reads TIMESTAMP (no-op)
        # min_ts filters the RAW column before conversion so the bound
        # stays in PushedFilters and prunes row groups in every branch.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":  # legacy nanos-as-long
            if min_ts is not None:
                from datetime import datetime, timezone

                cutoff_ns = int(
                    datetime.fromisoformat(min_ts)
                    .replace(tzinfo=timezone.utc)
                    .timestamp()
                    * 1_000_000_000
                )
                df = df.filter(F.col("ts") >= F.lit(cutoff_ns))
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif dt == "timestamp_ntz":
            if min_ts is not None:
                df = df.filter(F.col("ts") >= F.lit(min_ts).cast("timestamp_ntz"))
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif min_ts is not None:
            df = df.filter(F.col("ts") >= F.lit(min_ts).cast("timestamp"))
        return df
    return spark.read.parquet(path)


def _events_envelope(
    spark: SparkSession, sf_dir: str, min_ts: str | None = None
) -> DataFrame:
    """Derive flo event-envelope columns from the driver's events table."""
    return (
        load(spark, sf_dir, "events", min_ts=min_ts)
        .withColumn("partition", (F.col("event_id") % 4).cast("int"))
        .withColumn("event_counter", F.col("event_id"))
        .withColumn(
            "namespace",
            F.concat(
                F.lit("/"),
                F.col("event_type"),
                F.lit("/u"),
                (F.col("user_id") % 10).cast("string"),
            ),
        )
    )


_ENVELOPE_SQL = """
    SELECT *,
           CAST(event_id % 4 AS INT) AS partition,
           event_id AS event_counter,
           '/' || event_type || '/u' || CAST(user_id % 10 AS VARCHAR) AS namespace
    FROM events
"""

# --------------------------------------------------------------------------
# flo semantics layer (SURVEY §2 A3-A7, A13, A16, A17)
# --------------------------------------------------------------------------

_VV = {0: 500, 1: 120, 3: 40}  # partition 2 absent => not consumed


@query(
    "flo_consume_vv",
    f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT event_counter, partition, event_type, value
    FROM env
    WHERE (partition = 0 AND event_counter > 500)
       OR (partition = 1 AND event_counter > 120)
       OR (partition = 3 AND event_counter > 40)
    ORDER BY event_counter
    LIMIT 500
    """,
)
def flo_consume_vv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consume from a version vector: per-partition exclusive lower
    bounds, absent partitions skipped, global id order, limit.
    reference: consumer/mod.rs:78-119, sync/mod.rs:124-130."""
    env = _events_envelope(spark, sf_dir)
    return (
        env.filter(version_vector_filter(_VV, counter_col="event_counter"))
        .select("event_counter", "partition", "event_type", "value")
        .orderBy("event_counter")
        .limit(500)
    )


@query(
    "flo_consume_snapshot",
    f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT event_counter, partition, event_type
    FROM env
    WHERE ((partition = 0 AND event_counter > 200)
        OR (partition = 1 AND event_counter > 50))
      AND ((partition = 0 AND event_counter <= 900)
        OR (partition = 1 AND event_counter <= 400))
    ORDER BY event_counter
    """,
)
def flo_consume_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF snapshot consume (engine extension): a version vector
    read as an INCLUSIVE ceiling gives a reproducible point-in-time
    view of the append-only stream — time travel keyed by the consumer
    cursor; paired with a floor vector it reads the (floor, snapshot]
    window of history.  Both bounds are plain counter comparisons, so
    they push into the parquet scan for row-group pruning (the same
    index-seek shape as the floor-only consume)."""
    from flo_spark.operators.consume import version_vector_ceiling

    env = _events_envelope(spark, sf_dir)
    floor = {0: 200, 1: 50}
    snapshot = {0: 900, 1: 400}
    return (
        env.filter(version_vector_filter(floor, counter_col="event_counter"))
        .filter(version_vector_ceiling(snapshot, counter_col="event_counter"))
        .select("event_counter", "partition", "event_type")
        .orderBy("event_counter")
    )


@query(
    "flo_glob_star",
    f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT event_counter, namespace FROM env WHERE event_type = 'click'
    """,
)
def flo_glob_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-segment glob: '/click/*' — '*' stays within one path
    segment (namespace.rs:47-53).  Oracle expresses the equivalent
    semantics independently (event_type = 'click')."""
    env = _events_envelope(spark, sf_dir)
    return env.filter(
        F.col("namespace").rlike(glob_to_regex("/click/*"))
    ).select("event_counter", "namespace")


@query(
    "flo_glob_recursive",
    f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT event_counter, namespace FROM env WHERE user_id % 10 = 3
    """,
)
def flo_glob_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive glob: '/**/u3' spans any number of path components
    (namespace.rs:70-79)."""
    env = _events_envelope(spark, sf_dir)
    return env.filter(
        F.col("namespace").rlike(glob_to_regex("/**/u3"))
    ).select("event_counter", "namespace")


@query(
    "flo_head_status",
    f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT partition, max(event_counter) AS head_counter, count(*) AS n_events,
           TRUE AS primary
    FROM env GROUP BY partition
    """,
)
def flo_head_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition head counters — EventStreamStatus (A13,
    connection_state.rs:94-114).  ``primary`` mirrors
    PartitionStatus.primary (flo-protocol/src/client.rs:207-221);
    constantly true in the embedded/single-engine deployment (the only
    one the reference ships — clustering is vestigial there)."""
    env = _events_envelope(spark, sf_dir)
    return env.groupBy("partition").agg(
        F.max("event_counter").alias("head_counter"),
        F.count("*").alias("n_events"),
        F.lit(True).alias("primary"),
    )


@query(
    "flo_retention_expiry",
    f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT partition,
           count(*) AS surviving,
           min(event_counter) AS new_tail,
           max(event_counter) AS head_counter
    FROM env
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY partition
    """,
)
def flo_retention_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL retention (A11, engine/controller/mod.rs:158-178,
    segment/mod.rs:52-54): flo drops whole expired segments from the
    log front on a periodic tick.  The Spark-side analog is a TTL
    predicate on event time — here previewing, per partition, what
    survives a retention horizon (count + new tail + head).  The same
    predicate drives the physical delete in
    ``EventStream.expire_old_events`` (file-level drop, tested in
    tests/test_event_stream.py); at 100 TB it prunes date-partitioned
    directories without scanning survivors."""
    # horizon applied via load(min_ts=...) so the bound is pushed to the
    # parquet scan as a raw-nanos filter (row-group min/max pruning)
    env = _events_envelope(spark, sf_dir, min_ts="2024-01-15 00:00:00")
    return (
        env.groupBy("partition")
        .agg(
            F.count("*").alias("surviving"),
            F.min("event_counter").alias("new_tail"),
            F.max("event_counter").alias("head_counter"),
        )
    )


@query(
    "flo_segment_rotation",
    f"""
    WITH env AS ({_ENVELOPE_SQL})
    SELECT partition,
           CAST(floor(epoch(ts) / 604800) AS BIGINT) AS segment_idx,
           count(*) AS n_events,
           CAST(sum(coalesce(length(props), 0) + 16) AS BIGINT) AS seg_bytes,
           min(event_counter) AS first_counter,
           max(event_counter) AS last_counter
    FROM env GROUP BY partition, segment_idx
    """,
)
def flo_segment_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based segment rotation (A12, segment/mod.rs:21-27,
    engine/controller/mod.rs:239-265): an append whose timestamp falls
    past the segment's end_time starts a new segment.  Spark-side, the
    segment id is a pure function of event time (7-day windows here),
    so rotation is a deterministic bucketing every executor computes
    independently — no coordination, unlike the reference's mutable
    writer state.  Size-based rotation maps to ``maxRecordsPerFile``
    (exercised in the EventStream tests); per-segment byte totals model
    the 16-byte record header + payload accounting."""
    env = _events_envelope(spark, sf_dir)
    return (
        env.withColumn(
            "segment_idx",
            # unix_micros-based floor: exact epoch arithmetic valid for
            # TIMESTAMP (load() normalizes ts); cast-to-double is
            # illegal on NTZ and loses precision on large epochs
            F.floor(
                F.expr("unix_micros(ts)") / F.lit(604_800 * 1_000_000)
            ).cast("bigint"),
        )
        .groupBy("partition", "segment_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.coalesce(F.length("props"), F.lit(0)) + F.lit(16)).alias(
                "seg_bytes"
            ),
            F.min("event_counter").alias("first_counter"),
            F.max("event_counter").alias("last_counter"),
        )
    )


@query(
    "flo_lineage",
    """
    SELECT c.event_id AS event_id, c.event_type AS event_type,
           p.event_id AS parent_id, p.event_type AS parent_type
    FROM events c JOIN events p ON c.event_id = p.event_id + 1000
    """,
)
def flo_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-id causal join (A16, flo-event/src/lib.rs:192-196):
    parent := event_id - 1000 models request→response lineage."""
    ev = load(spark, sf_dir, "events")
    child = ev.select(
        F.col("event_id"), F.col("event_type"), (F.col("event_id") - 1000).alias("__p")
    )
    parent = ev.select(
        F.col("event_id").alias("parent_id"), F.col("event_type").alias("parent_type")
    )
    return (
        child.join(parent, child["__p"] == parent["parent_id"], "inner")
        .select("event_id", "event_type", "parent_id", "parent_type")
    )


@query(
    "flo_codec_json",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def flo_codec_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec projection (A17, codec/serde.rs:11-62): JSON payload decode
    as a column expression, not a UDF."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# batch-relational layer (SURVEY §2 Part B-relational)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {money_sum_sql("l_quantity")} AS sum_qty,
           {money_sum_sql("l_extendedprice")} AS sum_base_price,
           {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {money_avg_sql("l_quantity")} AS avg_qty,
           {money_avg_sql("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter -> hash agg with partial
    (map-side) aggregation; scan reads only the 7 referenced columns."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            money_avg(F.col("l_quantity")).alias("avg_qty"),
            money_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey AS l_orderkey,
           {REVENUE_SQL} AS revenue,
           o.o_orderdate AS o_orderdate, o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter -> joins -> agg -> top-k.
    top-k compiles to TakeOrderedAndProject, not a global sort.

    No forced broadcast: customer SCALES with SF (a hint is a command
    that overrides the size threshold and OOMs the build side at the
    100 TB north star).  The size-based planner/AQE still picks
    broadcast whenever the filtered dim fits the 64 MB threshold
    (session.py) — asserted at bench scale by tests/test_plans.py —
    and degrades to a shuffle join at cluster scale, which is the
    correct plan there."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # reduce orders by the selective dim FIRST, so the orders->lineitem
    # join sees ~1/5 of orders; at cluster scale it's a smaller shuffle
    # on the fact's join key.
    filtered_orders = o.join(c, o["o_custkey"] == c["c_custkey"])
    return (
        li.join(filtered_orders, li["l_orderkey"] == filtered_orders["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_regional_revenue",
    f"""
    SELECT n.n_name AS n_name,
           {REVENUE_SQL} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join, single fact shuffle on the agg
    key only.  Only the FIXED-cardinality dims (nation=25, region=5)
    carry a broadcast hint; customer/supplier scale with SF, so their
    join strategy is left to the size threshold/AQE — broadcast at
    bench scale (plan-tested), shuffle at 100 TB where a forced
    broadcast would OOM.

    Join order (guide §3.2/§1.2 step 1 — Catalyst has no CBO join
    reordering, the order written IS the order planned): the selective
    region filter is applied to the DIMENSION side first — customer ⋈
    nation ⋈ region('ASIA') keeps ~1/5 of customers, orders ⋈ that
    keeps ~1/5 of orders — before anything touches lineitem, so the
    fact join's build/probe input is already region-pruned.  The
    previous shape joined full lineitem ⋈ full orders first, the
    largest possible intermediate, and filtered last.  supplier is
    additionally semi-join-pruned by the 5 ASIA nation keys (§3.2
    "pre-filter the big side"): the final join requires s_nationkey =
    c_nationkey ∈ ASIA, so dropping non-ASIA suppliers early is
    provably lossless, and the 25-row build side costs nothing at any
    scale.  Inner-join reassociation — the output is row-identical."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    asia_nations = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    asia_customers = c.join(
        F.broadcast(asia_nations), c["c_nationkey"] == n["n_nationkey"]
    )
    asia_orders = o.join(asia_customers, o["o_custkey"] == c["c_custkey"])
    asia_suppliers = s.join(
        F.broadcast(asia_nations.select("n_nationkey")),
        s["s_nationkey"] == F.col("n_nationkey"),
        "left_semi",
    )
    return (
        li.join(asia_orders, li["l_orderkey"] == o["o_orderkey"])
        .join(
            asia_suppliers,
            (li["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "top3_customers_per_nation",
    """
    SELECT n_nationkey, c_custkey, c_acctbal, rn FROM (
      SELECT c_nationkey AS n_nationkey, c_custkey, round(c_acctbal, 2) AS c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-n per group — row_number with a unique tie-break."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("c_nationkey").alias("n_nationkey"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "rn",
        )
    )


@query(
    "customer_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS DOUBLE) AS running_total
    FROM orders
    """,
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (B-relational windows)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "rollup_returnflag",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "cube_orderpriority",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orderpriority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total"),
    )


@query(
    "semi_join_customers",
    """
    SELECT c_nationkey, count(*) AS n_customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join == EXISTS."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers_with_orders"))
    )


@query(
    "anti_join_customers",
    """
    SELECT c_custkey, c_nationkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join == NOT EXISTS: customers with no urgent order.
    (Every customer in the testdata has SOME order, so an unconditional
    anti join returns 0 rows and proves nothing — the priority filter
    makes the result non-empty at every SF: 18/203/1986 rows.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_nationkey"
    )


@query(
    "set_ops_custkeys",
    """
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@query(
    "except_custkeys",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set operation: customers with no order above 300k.
    ``subtract`` is the distinct set difference — unlike
    ``exceptAll().distinct()``, which wrongly keeps a value occurring
    m>n>0 times across the two sides.  (Unfiltered, the result is
    empty at every SF; the totalprice bound yields 3/30/308 rows.)"""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)


@query(
    "scalar_string_funcs",
    r"""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           substring(p_type, 1, 5) AS type_prefix,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar function battery (B-relational scalar funcs)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
               AS days_to_2002
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar function battery."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
    )


@query(
    "range_join_ship_window",
    """
    SELECT o.o_orderpriority AS o_orderpriority, count(*) AS n_lineitems
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    """,
)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with additional range predicate (theta/range join)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li["l_orderkey"] == o["o_orderkey"])
            & (li["l_shipdate"] >= o["o_orderdate"])
            & (li["l_shipdate"] <= o["o_orderdate"] + F.expr("INTERVAL 60 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lineitems"))
    )


@query(
    "asof_last_click_before_purchase",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         ranked AS (
           SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
         )
    SELECT purchase_id, click_id FROM ranked WHERE rn = 1
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): latest 'click' at-or-before each
    'purchase' per user, as a single merged-stream window pass.

    100 TB shape: one events scan (type filter pushed to the scan) and
    ONE user shuffle — the old purchase-x-prior-clicks range join
    materialized a per-user quadratic pair set and re-shuffled it by
    purchase_id for the top-1 window; the running ``last(click_id)
    ignorenulls`` over (ts, event_type, event_id) order replaces both.
    'click' < 'purchase' sorts a click at the purchase's own ts ahead
    of it, preserving the at-or-before (<=) contract; within a tied
    click ts the last event_id in ascending order is the max, matching
    the oracle's ``ORDER BY c.ts DESC, c.event_id DESC`` pick; a
    purchase with no prior click yields NULL and is dropped exactly as
    the inner join dropped it."""
    ev = load(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn(
            "last_click",
            F.last(
                F.when(F.col("event_type") == "click", F.col("event_id")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("last_click").alias("click_id"),
        )
    )


@query(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           CAST(round(sum(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_f,
           CAST(round(sum(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation)."""
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2).cast(
                "double"
            )
        )
    )
    return out.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


@query(
    "distinct_users_per_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query("approx_distinct_users", None)  # approximate => rows-only check
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct (scale path for 100 TB:
    sketch merge instead of exact shuffle-dedup)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


# --------------------------------------------------------------------------
# LLM-pipeline layer (dedup / text analysis / embeddings)
# --------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep lowest doc_id.
    Partial aggregation makes this one shuffle of (hash, min, count) —
    at 100 TB the shuffle carries 48-byte rows, not documents."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    )


@query(
    "text_stats",
    r"""
    SELECT doc_id,
           length(text) AS n_chars_computed,
           len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
               AS n_words,
           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
               AS n_punct,
           length(regexp_extract(text, '^[a-z]*', 0)) AS first_word_len
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality stats: char/word/punct counts — all integer-valued
    (hash-stable), all JVM-side expressions, no UDF."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        F.size(words).alias("n_words"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
        ).alias("n_punct"),
        F.length(F.regexp_extract("text", r"^[a-z]*", 0)).alias("first_word_len"),
    )


@query(
    "token_count",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenizer count (word / number / punct tokens)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).alias("n_tokens"),
    )


@query(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (whitespace-collapsed, lowercased
    md5) — the cheap first pass of a dedup cascade."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).cast("binary")
        ).alias("fingerprint"),
    )


@query(
    "lang_id_heuristic",
    """
    SELECT doc_id, lang AS lang_actual,
           CASE WHEN text LIKE '% the %' OR text LIKE 'the %' THEN 'en'
                ELSE 'other' END AS lang_predicted
    FROM documents
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trivial stopword-marker language id (deterministic heuristic —
    the Spark plumbing is the point; swap in a real n-gram model as a
    pandas_udf for production)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        F.when(
            F.col("text").like("% the %") | F.col("text").like("the %"), "en"
        )
        .otherwise("other")
        .alias("lang_predicted"),
    )


@query(
    "embedding_topk_bruteforce",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id >= 5),
         scored AS (
           SELECT q_id, c_id,
                  -- DOUBLE[] cast: on FLOAT[] DuckDB computes AND
                  -- rounds in float32, whose float64 widening
                  -- (0.26010000705...) never equals Spark's rounded
                  -- double under full-precision comparison
                  round(list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
                                               CAST(c_emb AS DOUBLE[])), 4)
                      AS cos_sim,
                  row_number() OVER (
                    PARTITION BY q_id
                    ORDER BY list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
                                                    CAST(c_emb AS DOUBLE[]))
                      DESC, c_id) AS rn
           FROM q CROSS JOIN c
         )
    SELECT q_id, c_id, cos_sim, rn FROM scored WHERE rn <= 10
    """,
)
def embedding_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k, Arrow/numpy-vectorized: one matmul
    per corpus batch, batch-local top-k cut before the shuffle, global
    rank over the tiny candidate set (operators/similarity.py::
    cosine_topk_np).  (The LSH-bucketed variant is
    `embedding_ann_lsh`.)"""
    from flo_spark.operators.similarity import cosine_topk_np

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    c = e.filter(F.col("vec_id") >= 5)
    return cosine_topk_np(c, q, k=10)


# --------------------------------------------------------------------------
# streaming layer (Structured Streaming, B-streaming)
# --------------------------------------------------------------------------


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet, ts normalized to TIMESTAMP.

    The file stream source needs an explicit schema, and the testdata's
    ts encoding has varied (TIMESTAMP(NANOS) read ns-as-long vs
    TIMESTAMP_MICROS/NTZ), so sniff the actual schema from a batch read
    of the same file and branch on the observed ts type — never assume
    the unit (a hardcoded ``div 1000`` against micros compresses time
    1000x with no error raised)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see load()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source needs a directory path; select the single
    # events.parquet file via pathGlobFilter over the sf dir
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dt = dict(stream.dtypes).get("ts")
    if dt == "bigint":  # legacy nanos-as-long
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


@query(
    "stream_tumbling_counts",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type, count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_value
    FROM events GROUP BY 1, event_type
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window over a STREAMING read, drained with
    Trigger.AvailableNow (flo's await_new=false) into a memory sink;
    the result must equal the batch group-by — exactly the Structured
    Streaming prefix-integrity guarantee."""
    from flo_spark.streaming.consume_stream import run_to_memory

    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # complete mode: emit ALL windows at drain time — append mode would
    # withhold windows newer than the final watermark
    return run_to_memory(agg, await_new=False, output_mode="complete", shuffle_partitions=8)


@query(
    "stream_sliding_counts",
    """
    WITH base AS (
      SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS w0
      FROM events
    ),
    slides AS (
      SELECT w0 AS window_start FROM base
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS window_start FROM base
    )
    SELECT window_start, count(*) AS n_events FROM slides GROUP BY window_start
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h window, 30min slide) on the streaming read."""
    from flo_spark.streaming.consume_stream import run_to_memory

    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    return run_to_memory(agg, await_new=False, output_mode="complete", shuffle_partitions=8)


@query(
    "stream_distinct_pairs",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def stream_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (dropDuplicates within watermark),
    projected to the dedup keys — flo has no dedup; this is the
    B-streaming extension."""
    from flo_spark.streaming.consume_stream import run_to_memory

    ev = _events_stream(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "24 hours")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_memory(dedup, await_new=False, output_mode="append", shuffle_partitions=8)


@query(
    "session_windows_30m",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — Spark's
    session_window; the oracle derives identical sessions via the
    classic gaps-and-islands SQL."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# LLM layer wave 2: near-dup, ANN, multimodal (custom operators)
# --------------------------------------------------------------------------


# Word-3-gram jaccard over ALL pairs — ground truth for the dedup
# pipelines.  Mirrors word_shingles() exactly: lowercase, split on
# whitespace, distinct 3-grams, whole-text fallback for <3-word docs.
# The int/int quotient is bit-identical to Spark's size()/size(), and
# the floor formula is the engine-neutral half-up rounding.
_ALLPAIRS_JACCARD_SQL = r"""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS w
            FROM documents)
    ),
    j AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(a.sh || b.sh)) AS jac
      FROM g a JOIN g b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, floor(jac * 10000 + 0.5) / 10000 AS jaccard
    FROM j WHERE jac >= 0.5
"""


@query("dedup_minhash_lsh", _ALLPAIRS_JACCARD_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs over documents (shingle ->
    64-hash signature -> 16 bands -> bucket join -> exact-jaccard
    verify). See operators/dedup.py for the scale analysis.

    Oracled against brute-force all-pairs jaccard: the exact-jaccard
    VERIFY stage makes the output content-defined, and at this corpus
    every true pair has jaccard >= 0.9 (next pair is < 0.4), where the
    16-band/4-row collision probability is 1 - ~4e-8 — the banding
    cannot miss, so LSH output == ground truth deterministically."""
    from flo_spark.operators.dedup import minhash_lsh_pairs

    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.5)


# no-oracle (inherent): the output IS the xxhash64-derived simhash —
# hamming distances between 64-bit simhashes cannot be recomputed in
# SQL without reimplementing xxhash64 + the bit-vote fold in DuckDB
@query("dedup_simhash", None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup candidate pairs (16-bit band blocking)."""
    from flo_spark.operators.dedup import simhash_near_pairs

    d = load(spark, sf_dir, "documents")
    return simhash_near_pairs(d)


@query("dedup_ngram_jaccard", _ALLPAIRS_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram jaccard pairs >= 0.5 via inverted-index
    candidate generation with stop-shingle pruning.

    Oracled against brute-force all-pairs jaccard: candidate
    generation only misses a pair if EVERY shared shingle is a
    stop-shingle (bucket > max_bucket=200) — impossible here because
    true pairs share >= 1/3 of their shingles and no shingle bucket in
    this corpus approaches the cap (and at jaccard >= 0.5 a pair
    shares many rare shingles)."""
    from flo_spark.operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.5)


@query("embedding_ann_lsh", None)  # approximate by design
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (random hyperplanes; corpus
    bucketed once, queries probe their bucket only)."""
    from flo_spark.operators.similarity import ann_topk_lsh

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return ann_topk_lsh(e, q, dim=64, k=10, num_planes=6)


@query("embedding_ann_ivf", None)  # approximate by design
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: spherical-kmeans coarse quantizer (16
    cells, trained on a bounded deterministic sample), queries probe
    their 4 nearest cells, exact cosine re-rank inside probed cells."""
    from flo_spark.operators.similarity import ann_topk_ivf

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    c = e.filter(F.col("vec_id") >= 5)
    return ann_topk_ivf(c, q, k=10, n_cells=16, n_probe=4)


@query(
    "embedding_neardup_cosine",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)
      FROM embeddings WHERE vec_id < 50
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_aggregate(list_transform(list_zip(a.emb, b.emb),
                                           s -> s[1] * s[2]), 'sum')
             / (sqrt(list_aggregate(list_transform(a.emb, x -> x * x), 'sum'))
                * sqrt(list_aggregate(list_transform(b.emb, x -> x * x), 'sum')))
               AS c
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, floor(c * 10000 + 0.5) / 10000 AS cos_sim
    FROM p WHERE c >= 0.99
    """,
)
def embedding_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH blocking + exact
    cosine verify at threshold 0.99).

    The synthetic corpus has no natural near-dups (max all-pairs cosine
    is 0.513), so the query PLANTS them: the first 50 vectors re-enter
    scaled by 2 under shifted ids — the embedding-identical-duplicate
    case every production dedup sees.  Planting scaled copies keeps the
    oracle exact: positive scaling provably preserves every hyperplane
    sign, so the planted pair shares its LSH bucket with probability 1
    (not 1-epsilon) and the blocked output equals brute-force ground
    truth.  The cosine itself is the HOF sequential fold, bit-identical
    to DuckDB's list_aggregate sum."""
    from flo_spark.operators.similarity import pairwise_near_duplicates

    e = load(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = e.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 2).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    return pairwise_near_duplicates(corpus, dim=64, threshold=0.99, num_planes=8)


@query(
    "multimodal_features",
    """
    SELECT doc_id AS asset_id,
           CAST(strlen(text) AS INT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal asset metadata, JVM-side: byte length and sha256 of
    the binary payload are plain Catalyst expressions (``F.length`` /
    ``F.sha2``) — whole-stage-codegen'd, no Python worker in the plan.
    The mapInPandas decode pipeline (``operators.multimodal.
    extract_features``) remains the vehicle for real feature vectors
    (needs an actual codec) and is exercised in tests; routing the
    hash/length columns through built-ins is the 100 TB-correct split:
    never pay an Arrow round-trip for what codegen computes in place."""
    from flo_spark.operators.multimodal import documents_as_assets

    assets = documents_as_assets(load(spark, sf_dir, "documents"))
    return assets.select(
        F.col("asset_id"),
        F.length("data").cast("int").alias("n_bytes"),
        F.sha2("data", 256).alias("content_sha"),
    )


@query(
    "multimodal_frame_sample",
    """
    SELECT d.doc_id AS asset_id,
           i AS frame_idx,
           i * 1000 AS ts_ms,
           sha256(d.text || ':' || i) AS frame_sha
    FROM documents d
    CROSS JOIN unnest(generate_series(0, 7)) AS t(i)
    WHERE i < d.doc_id % 5 + 1
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling through the REAL mapInPandas fan-out
    operator (``operators.multimodal.sample_frames``): each asset row
    yields ceil(duration_ms/step) frame rows, bounded by max_frames,
    entirely inside the Python stage — one input partition -> one
    output partition, no shuffle however large the fan-out.  The corpus
    has no real video, so durations are PLANTED deterministically
    (1..5 s by doc_id) and the stub frame-grab hashes payload+':{idx}'
    — ASCII suffix precisely so the oracle can recompute it in SQL
    (bounded 0..7 series cross join; DuckDB generate_series cannot take
    lateral column args)."""
    from flo_spark.operators.multimodal import sample_frames

    d = load(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit("video/fake").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            ((F.col("doc_id") % 5 + 1) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return sample_frames(assets, every_ms=1000, max_frames=8)


@query(
    "union_all_parties",
    """
    SELECT c_name AS name, 'customer' AS kind, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
    """,
)
def union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogeneous sources via unionByName."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("nationkey"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return c.unionByName(s)


@query(
    "explode_word_freq",
    r"""
    SELECT word, count(*) AS freq FROM (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ) GROUP BY word
    """,
)
def explode_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode -> group count (word frequency over the corpus)."""
    d = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    return (
        d.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


@query(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4) AS abs_disc,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_quantity), 4) AS qty_sqrt,
           round(ln(l_extendedprice + 1), 4) AS price_ln,
           round(pow(1 + l_tax, 2), 4) AS tax_sq
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar battery."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 4).alias("tax_sq"),
    )


@query(
    "case_when_value_buckets",
    """
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
)
def case_when_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total"),
    )


@query(
    "lag_lead_orders",
    """
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           CAST(rank() OVER w2 AS BIGINT) AS price_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank window battery."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.rank().over(w2).cast("long").alias("price_rank"),
    )


@query(
    "flo_produce_roundtrip",
    """
    WITH b AS (
      SELECT doc_id,
             '/docs/' || source AS namespace,
             CAST(doc_id % 3 + 1 AS INT) AS partition
      FROM documents ORDER BY doc_id LIMIT 300
    ),
    cnt AS (
      SELECT partition, count(*) AS n FROM b GROUP BY partition
    ),
    off AS (
      SELECT partition,
             CAST(sum(n) OVER (ORDER BY partition) - n AS BIGINT) AS off
      FROM cnt
    )
    SELECT off.off
             + row_number() OVER (PARTITION BY b.partition ORDER BY b.doc_id)
             AS event_counter,
           b.partition AS actor,
           b.namespace
    FROM b JOIN off USING (partition)
    """,
)
def flo_produce_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Produce path (A1/A2/A15): write a 3-partition event stream to a
    temp dir with contiguous id assignment, read it back, return the
    consumed events.  Exercises the full write->read cycle end-to-end.

    Oracle-checkable because the id assignment is the documented
    deterministic formula (highest_counter.rs:43-62 semantics): batch
    range [head+1, head+N]; partitions take cumulative sub-ranges in
    partition order; in-partition positions follow ``order_by``
    (doc_id here) — which the SQL reproduces with window functions."""
    from flo_spark.sources.event_table import EventStream

    path = scratch_dir("flo_produce_") + "/stream"
    s = EventStream.create(spark, path, num_partitions=3)
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(300)
    batch = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("/docs/"), F.col("source")).alias("namespace"),
        F.encode("text", "utf-8").alias("data"),
        (F.col("doc_id") % 3 + 1).cast("int").alias("partition"),
    )
    s.produce(batch, order_by="doc_id")
    out = s.consume(namespace="/docs/*").select(
        "event_counter", "actor", "namespace"
    )
    return out


@query(
    "flo_interchange_roundtrip",
    """
    WITH b AS (
      SELECT doc_id, text,
             '/docs/' || source AS namespace,
             CAST(doc_id % 3 + 1 AS INT) AS partition
      FROM documents ORDER BY doc_id LIMIT 300
    ),
    cnt AS (SELECT partition, count(*) AS n FROM b GROUP BY partition),
    off AS (
      SELECT partition,
             CAST(sum(n) OVER (ORDER BY partition) - n AS BIGINT) AS off
      FROM cnt
    ),
    env AS (
      SELECT b.namespace,
             off.off + row_number()
               OVER (PARTITION BY b.partition ORDER BY b.doc_id)
               AS event_counter,
             octet_length(encode(b.text)) AS nbytes
      FROM b JOIN off USING (partition)
    ),
    both_fmts AS (SELECT * FROM env UNION ALL SELECT * FROM env)
    SELECT namespace,
           count(*) AS n_events,
           CAST(sum(event_counter) AS BIGINT) AS sum_counters,
           CAST(sum(nbytes) AS BIGINT) AS sum_bytes
    FROM both_fmts GROUP BY namespace
    """,
)
def flo_interchange_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interchange surface (A18 analog, client.rs:106-122): produce a
    stream, export it as BOTH CSV and JSON (binary payloads
    base64-encoded, the text-safe analog of flo's length-prefixed wire
    bytes), read each back through the schema-explicit scan path, and
    aggregate the union — counters, counts, and exact payload byte
    lengths per namespace survive two text round trips, hash-checked
    against SQL computing the same from the source table.  Each format
    contributes one copy, so every count is exactly doubled; a lossy
    round trip (truncated payload, re-ordered counters, dropped rows)
    breaks the hash."""
    from flo_spark.sources.event_table import EventStream

    tmp = scratch_dir("flo_interchange_")
    s = EventStream.create(spark, f"{tmp}/stream", num_partitions=3)
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(300)
    batch = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("/docs/"), F.col("source")).alias("namespace"),
        F.encode("text", "utf-8").alias("data"),
        (F.col("doc_id") % 3 + 1).cast("int").alias("partition"),
    )
    s.produce(batch, order_by="doc_id")
    s.export(f"{tmp}/csv", fmt="csv")
    s.export(f"{tmp}/json", fmt="json")
    c = EventStream.read_events(spark, f"{tmp}/csv", fmt="csv")
    j = EventStream.read_events(spark, f"{tmp}/json", fmt="json")
    return (
        c.unionByName(j)
        .groupBy("namespace")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("event_counter").alias("sum_counters"),
            F.sum(F.octet_length("data")).alias("sum_bytes"),
        )
    )


@query(
    "flo_segment_binary_roundtrip",
    """
    WITH b AS (
      SELECT event_id, ts, event_type, props
      FROM events ORDER BY event_id LIMIT 400
    )
    SELECT '/events/' || event_type AS namespace,
           count(*) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS sum_counters,
           CAST(sum(epoch_ms(ts)) AS BIGINT) AS sum_ts_millis,
           CAST(sum(octet_length(encode(coalesce(props, ''))))
                AS BIGINT) AS sum_bytes,
           CAST(sum(CASE WHEN event_id % 5 = 0
                         THEN event_id + 1000000 END)
                AS BIGINT) AS sum_parents
    FROM b GROUP BY namespace
    """,
)
def flo_segment_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native storage format (A18/A19, persistent_event.rs:20-35 +
    segment/header.rs): encode 400 events into flo's byte-exact
    ``.events`` segment layout (big-endian envelope, FLO_EVT marker,
    len-prefixed namespace/payload, ms timestamps, zero-id null
    parents), across 3 partitions with forced segment rotation, then
    scan the segment files back and aggregate.  Counters, ms-exact
    timestamps, payload byte lengths, and parent-id lineage must all
    survive the binary round trip — the oracle computes the same
    aggregates from the source table, so any framing error (offset
    drift, endianness, length mismatch, parent-null mapping) breaks
    the hash."""
    from flo_spark.sources.flo_segment import (
        read_flo_segments,
        write_flo_segments,
    )

    ev = load(spark, sf_dir, "events").orderBy("event_id").limit(400)
    batch = ev.select(
        F.col("event_id").alias("event_counter"),
        (F.col("event_id") % 3 + 1).cast("int").alias("actor"),
        F.when(F.col("event_id") % 5 == 0, F.col("event_id") + 1000000)
        .cast("long")
        .alias("parent_counter"),
        F.when(F.col("event_id") % 5 == 0, F.lit(1))
        .cast("int")
        .alias("parent_actor"),
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("/events/"), F.col("event_type")).alias("namespace"),
        F.encode(F.coalesce("props", F.lit("")), "utf-8").alias("data"),
        (F.col("event_id") % 3 + 1).cast("int").alias("partition"),
    )
    path = scratch_dir("flo_segment_") + "/native"
    write_flo_segments(batch, path, max_events_per_segment=60)
    back = read_flo_segments(spark, path)
    return back.groupBy("namespace").agg(
        F.count("*").alias("n_events"),
        F.sum("event_counter").alias("sum_counters"),
        F.sum(F.unix_millis("timestamp")).alias("sum_ts_millis"),
        F.sum(F.octet_length("data")).alias("sum_bytes"),
        F.sum("parent_counter").alias("sum_parents"),
    )


# --------------------------------------------------------------------------
# public surface consumed by __spark_entry__.py
# --------------------------------------------------------------------------

# Extended catalog (TPC-H adaptations, window frames, stats aggregates)
# registers itself into REGISTRY on import; must run before queries()
# is consumed.  Imported at the bottom to avoid a circular import.
from flo_spark import queries_ext as _queries_ext  # noqa: E402,F401


# The driver's correctness gate has checked exactly the FIRST 50 keys
# of queries() in insertion order every round (the window is positional
# and capped at 50 — see DRIVER_COVERAGE.md).  The r8/r9/r10 windows
# burn down the zero-driver-history backlog at 44 first-time keys per
# round; the round-10 window below executes the rotation plan staged
# in DRIVER_COVERAGE.md at round-9 time (storage/engine mechanisms,
# SQL/API surface suites, streaming monitors, dedup/ER operators,
# sketch set algebra, codec round trips — in mechanism-risk order).
# Every entry displaced from the window has at least one prior round
# of driver-green history AND stays hash-checked by the local replica
# gate (tests/test_oracle.py); the rotation history and displaced list
# are audited in DRIVER_COVERAGE.md and pinned by
# tests/test_driver_window.py.
DRIVER_CHECK_ORDER = [
    # Round-10 window: 44 first-time keys per the rotation plan staged
    # in DRIVER_COVERAGE.md at round-9 time ("Round-10 rotation plan"),
    # then the 6 standing canaries.  Every displaced round-9 key is
    # driver-green from CORRECTNESS_r09 (50/50) and stays hash-checked
    # by the local replica gate (tests/test_oracle.py).
    # -- storage/engine mechanisms a Spark user exercises structurally
    #    (each pins a distinct planner/layout feature) --
    "bucketed_colocated_join",
    "dpp_month_partition_prune",
    "bloom_pruned_join",
    "schema_evolution_merge_read",
    "small_file_compaction",
    "dsir_importance_resample",
    "stream_scd2_maintenance",
    "scd2_customer_versions",
    "scd2_point_in_time_join",
    "feature_store_pit_join",
    # -- SQL/API surface suites (parser/decorrelation/collation) --
    "sql_scripting_threshold_report",
    "sql_syntax_surface_suite",
    "lateral_topn_per_customer",
    "collation_case_insensitive_stats",
    "pandas_api_on_spark_stats",
    "modern_aggregates_suite",
    "map_hof_suite",
    "listagg_order_manifest",
    "transpose_quantity_buckets",
    "approx_topk_verified",
    # -- streaming monitors not yet driver-seen --
    "stream_observe_metrics",
    "stream_bitmap_distinct_monitor",
    "stream_late_data_drop_audit",
    "stream_sliding_topk_sketch",
    # -- dedup/ER/LLM-pipeline operators --
    "line_dedup_corpus",
    "image_dhash_neardup",
    "audio_fingerprint_neardup",
    "dedup_fuzzy_verify_levenshtein",
    "sorted_neighborhood_pairs",
    "golden_record_survivorship",
    "hard_negative_mining",
    "inverted_index_build",
    "tfidf_candidate_stats",
    "bpe_decode_roundtrip",
    "group_leakage_safe_split",
    "vocab_index_encode",
    "context_window_pairs",
    # -- sketch/exact-distinct set algebra --
    "countmin_heavy_hitters",
    "bitmap_exact_distinct",
    "theta_sketch_audience_diff",
    # -- native codec round trips (one per container family not yet
    #    driver-certified; pnm16/y4m/gif_anim follow in r11) --
    "multimodal_flac_roundtrip",
    "multimodal_jpeg_roundtrip",
    "multimodal_qoi_roundtrip",
    "multimodal_png_adam7_roundtrip",
    # -- rows-only companion contracts (stay pinned in every window) --
    "approx_distinct_bounded",
    "dedup_simhash_pairs",
    "embedding_ann_recall",
    # -- flo-surface canaries --
    "flo_produce_roundtrip",
    "flo_consume_vv",
    # -- the r5 failure / exact-money class-bug canary --
    "q7_volume_shipping",
]


def _ordered_registry() -> dict[str, QuerySpec]:
    missing = [n for n in DRIVER_CHECK_ORDER if n not in REGISTRY]
    assert not missing, f"DRIVER_CHECK_ORDER names absent from REGISTRY: {missing}"
    ordered = {n: REGISTRY[n] for n in DRIVER_CHECK_ORDER}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered_registry().items()
        if spec.oracle is not None
    }
