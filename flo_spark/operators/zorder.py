"""Z-order (Morton) clustering — multi-dimensional data skipping for
parquet scans.

A table sorted by ONE column gives tight per-file min/max statistics
on that column only; a range predicate on any other column skips
nothing.  Interleaving the bits of several columns into one Morton
key and sorting by THAT keeps every participating column locally
dense, so per-file min/max stay tight on ALL of them and a
conjunctive range query prunes files on every dimension at once — the
standard lakehouse layout technique (Delta/Iceberg `OPTIMIZE ZORDER
BY`), re-expressed with plain Spark expressions.

Everything here is JVM-side bit arithmetic (shiftleft / bitwiseOR —
whole-stage codegen, no Python), and the write is one range
repartition + local sort: exactly the shuffle a plain `ORDER BY`
write costs.  At 100 TB the payoff is at scan time: files that cannot
match are skipped from the FOOTER statistics alone (file- and
row-group-level), before any column data is read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits encoded per dimension (16 bits x up to 4 dims stays < 2^63)
DEFAULT_BITS = 16


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map col into [0, 2^bits) with explicit bounds (clamped): the
    quantization grid must be a CONSTANT of the layout, not of the
    batch, or re-written files would interleave on different scales."""
    span = float(hi) - float(lo)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(
        float((1 << bits) - 1)
    )
    clamped = F.least(
        F.greatest(F.floor(scaled + F.lit(0.5)), F.lit(0)),
        F.lit((1 << bits) - 1),
    )
    return clamped.cast("long")


def zorder_value(
    dims: list[tuple[Column, float, float]], bits: int = DEFAULT_BITS
) -> Column:
    """Morton key of ``[(column, lo, hi), ...]``: quantize each
    dimension to ``bits`` bits, then interleave — bit i of dimension d
    lands at position i*n_dims + d."""
    n = len(dims)
    if not 1 <= n <= 4:
        raise ValueError("zorder_value supports 1-4 dimensions")
    q = [_quantize(c, lo, hi, bits) for c, lo, hi in dims]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for d, qc in enumerate(q):
            bit = F.shiftright(qc, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + d))
    return out


def zorder_value_sql(dims: list[tuple[str, float, float]], bits: int = DEFAULT_BITS) -> str:
    """The identical Morton key as DuckDB SQL (bit-for-bit: same
    quantization arithmetic, same interleave), for oracle strings."""
    n = len(dims)
    qs = []
    for expr, lo, hi in dims:
        span = float(hi) - float(lo)
        qs.append(
            "CAST(least(greatest(floor((CAST((" + expr + ") AS DOUBLE) - "
            f"{float(lo)!r}) / {span!r} * {float((1 << bits) - 1)!r} + 0.5), 0), "
            f"{(1 << bits) - 1}) AS BIGINT)"
        )
    parts = []
    for i in range(bits):
        for d, q in enumerate(qs):
            parts.append(f"((({q} >> {i}) & 1) << {i * n + d})")
    return "(" + " | ".join(parts) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[tuple[Column, float, float]],
    bits: int = DEFAULT_BITS,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet laid out in Morton order: range-
    partition on the key (one shuffle — the same cost as any sorted
    write), sort within files, one file per range so footer min/max
    form the skipping index."""
    z = zorder_value(dims, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
