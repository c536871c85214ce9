"""Skew-handling join strategies for 100 TB-scale shuffles.

A shuffle join hashes rows to reducers by key; a hot key sends its
entire population to ONE reducer and the stage runs at the speed of
that straggler.  Two mitigations, composable with everything else in
the engine:

- ``salted_join``: explicit salting — split every hot left-side key
  into ``salt`` sub-keys and replicate the (small-ish) right side once
  per sub-key.  Deterministic-by-construction (the salt comes from a
  uniform hash of a row-stable expression, not ``rand()``), so retries
  and speculative tasks don't flap.
- AQE's ``skewJoin`` (enabled in flo_spark.session) handles the same
  problem adaptively for sort-merge joins; ``salted_join`` is for when
  the skew is known ahead of time (hot tenants, null-heavy keys) or
  the join is hash-partitioned by an upstream stage AQE can't split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    left_salt_expr: Column | None = None,
) -> DataFrame:
    """Equi-join ``left`` (large, skewed) with ``right`` (small enough
    to replicate ``salt``×) on column ``on``.

    Left rows get a deterministic salt in [0, salt) hashed from the
    whole row (xxhash64 over all columns — stable, uniform); right
    rows are exploded into ``salt`` replicas, one per salt value.  The
    shuffle key becomes (on, salt), so a key that previously landed on
    1 reducer now spreads over ``salt`` reducers.  Right-side cost:
    |right| × salt rows — keep salt modest (8-32) and the right side
    dimension-sized.

    Supports inner and left joins (the salted right side would
    duplicate unmatched right rows under right/full joins).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if left_salt_expr is None:
        left_salt_expr = F.pmod(F.xxhash64(*left.columns), F.lit(salt))
    lsalted = left.withColumn("__salt", left_salt_expr.cast("int"))
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = lsalted.join(rsalted, [on, "__salt"], how)
    return out.drop("__salt")
