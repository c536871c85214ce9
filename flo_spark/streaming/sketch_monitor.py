"""Streaming monitors over persistent sketch stores.

Three monitors share one recipe — the payoff of a MERGEABLE sketch
(operators/sketch.py): each micro-batch reduces to tiny sketch rows
persisted as the batch's own parquet shard, so the monitoring state
survives restarts, replayed batches overwrite their own shard instead
of double-counting (the flo-writer/dedup-ingest idempotency recipe),
and ANY window of history re-aggregates by merging its shards without
rescanning raw data.  Spark's built-in ``percentile_approx`` /
``approx_count_distinct`` cannot do this: their sketch state never
leaves the query that built it.

- QUANTILE monitor: one KLL-family row per batch -> all-time
  percentiles with a tracked rank-error bound;
- THETA monitor: one KMV row per (batch, segment) -> distinct counts
  AND set algebra (overlaps) across segments;
- COUNT-MIN monitor: one CM table row per (batch, sliding window) +
  exact candidate counts -> per-window heavy hitters with the
  overestimate-only invariant.

``compact_countmin_store`` folds committed batch shards into a
versioned ``base-upto-N`` shard (atomic-rename publish, stale shards
ignored by readers) so the store's read fan-in stays bounded forever.

100 TB shape: the per-batch reduction is one Arrow pass over the
batch's partitions plus a keyed merge; the store grows by O(1)/O(keys)
tiny rows per batch; querying merges O(batches) sketches — never the
stream's raw history.
"""

from __future__ import annotations

import os
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flo_spark.operators.sketch import (
    SKETCH_ROW_SCHEMA as _SCHEMA,
)
from flo_spark.operators.sketch import QuantileSketch


#: compacted shard directory prefix (see compact_countmin_store);
#: full name is ``base-upto-N`` where N is the highest folded batch id
_BASE = "base-upto-"


def _shard(store_dir: str, batch_id: int) -> str:
    return os.path.join(store_dir, f"batch={batch_id}")


def _flat_store_shards(store_dir: str) -> list[str]:
    """Current base + live batch shards for a flat (single-kind) store
    — same exclusion rule as the Count-Min store's ``_store_shards``:
    batch ids at or below the base watermark are already folded in."""
    bases = _base_dirs(store_dir)
    floor = bases[-1][0] if bases else -1
    out = [p for i, p in _batch_shards(store_dir) if i > floor]
    if bases:
        out.append(bases[-1][1])
    return out


def fold_sketch_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    value: Column,
    capacity: int = 1024,
) -> None:
    """foreachBatch body: reduce the batch to one sketch row, written
    exactly once across crash replays (overwrite-own-shard)."""
    import pandas as pd

    from flo_spark.operators.sketch import (
        merge_sketch_rows,
        sketch_partials_fn,
    )

    def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        levels, bound = merge_sketch_rows(pdf, capacity).to_row()
        return pd.DataFrame({"levels": [levels], "bound": [bound]})

    parts = batch.select(value.alias("v")).mapInPandas(
        sketch_partials_fn(capacity), _SCHEMA
    )
    merged = (
        parts.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(merge_rows, _SCHEMA)
    )
    merged.write.mode("overwrite").parquet(_shard(store_dir, batch_id))


def read_sketch(spark, store_dir: str, capacity: int = 1024) -> QuantileSketch:
    """Merge the current base (if compacted) plus every live batch
    shard into one queryable sketch.  Driver-side, but O(batches) tiny
    rows — documented, never raw data."""
    sk = QuantileSketch(capacity)
    shards = _flat_store_shards(store_dir)
    if not shards:
        return sk
    for row in spark.read.parquet(*shards).collect():
        sk.merge(
            QuantileSketch.from_row(
                [list(lv) for lv in row.levels], int(row.bound), capacity
            )
        )
    return sk


def sketch_monitor(
    stream: DataFrame,
    store_dir: str,
    value: Column,
    checkpoint_dir: str,
    capacity: int = 1024,
    timeout_sec: int = 120,
) -> QuantileSketch:
    """Drain a stream through the sketch fold; return the merged
    all-time sketch."""
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: fold_sketch_batch(b, eid, store_dir, value, capacity)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"sketch monitor did not drain within {timeout_sec}s")
    return read_sketch(stream.sparkSession, store_dir, capacity)


# -------------------------------------------------------------------------
# Theta-sketch audience monitor: per-segment distinct sets, streamed
# -------------------------------------------------------------------------

_THETA_SCHEMA = "segment string, hashes array<long>"


def fold_theta_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    segment: Column,
    item: Column,
    k: int = 256,
) -> None:
    """foreachBatch body: one theta sketch row per segment value,
    written as the batch's own replay-safe shard.  Because theta
    state is a pure function of the item SET, shards from replayed or
    reordered batches merge to the identical store."""
    import pandas as pd

    from flo_spark.operators.sketch import ThetaSketch

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = ThetaSketch(k).add(pdf["item"].tolist())
        return pd.DataFrame(
            {"segment": [pdf["segment"].iloc[0]], "hashes": [sk.to_row()]}
        )

    rows = (
        batch.select(segment.alias("segment"), item.alias("item"))
        .groupBy("segment")
        .applyInPandas(build, _THETA_SCHEMA)
    )
    rows.write.mode("overwrite").parquet(_shard(store_dir, batch_id))


def read_theta(spark, store_dir: str, k: int = 256):
    """{segment: merged ThetaSketch} across every batch shard —
    O(batches x segments) tiny rows, never the raw items."""
    from flo_spark.operators.sketch import ThetaSketch

    out: dict = {}
    shards = _flat_store_shards(store_dir)
    if not shards:
        return out
    for row in spark.read.parquet(*shards).collect():
        sk = out.setdefault(row.segment, ThetaSketch(k))
        sk.merge(ThetaSketch.from_row(list(row.hashes), k))
    return out


def theta_monitor(
    stream: DataFrame,
    store_dir: str,
    segment: Column,
    item: Column,
    checkpoint_dir: str,
    k: int = 256,
    timeout_sec: int = 120,
):
    """Drain a stream through the theta fold; return the merged
    per-segment sketches (distinct counts AND pairwise overlaps
    queryable forever without rescanning history)."""
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: fold_theta_batch(
                b, eid, store_dir, segment, item, k
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"theta monitor did not drain within {timeout_sec}s")
    return read_theta(stream.sparkSession, store_dir, k)


# -------------------------------------------------------------------------
# Count-Min sliding top-k monitor: per-window frequency sketches, streamed
# -------------------------------------------------------------------------

_CM_SK_SCHEMA = "window_start timestamp, cells array<long>, total long"
_CM_CAND_SCHEMA = "window_start timestamp, item long, cnt long"


def _expand_slides(batch: DataFrame, ts: Column, item: Column,
                   window_sec: int, slide_sec: int) -> DataFrame:
    """Assign each event to every sliding window containing it, using
    the same epoch arithmetic Spark's F.window uses (session TZ is
    pinned to UTC by flo_spark.queries.load)."""
    if window_sec % slide_sec:
        raise ValueError("window must be a multiple of the slide")
    slides = window_sec // slide_sec
    w0 = F.floor(F.unix_timestamp(ts) / slide_sec) * slide_sec
    starts = F.array(
        *[F.to_timestamp(w0 - k * slide_sec) for k in range(slides)]
    )
    return batch.select(
        F.explode(starts).alias("window_start"), item.alias("item")
    )


def fold_countmin_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    ts: Column,
    item: Column,
    window_sec: int = 3600,
    slide_sec: int = 1800,
    width: int = 1024,
    depth: int = 4,
) -> None:
    """foreachBatch body: per sliding window, one Count-Min sketch row
    (weighted add over the batch's per-item counts — provably equal to
    adding raw occurrences, tests/test_countmin.py) plus the batch's
    per-(window, item) counts, both written as the batch's own
    replay-safe shards.  CM state merges by cell-wise sum, so replayed
    batches overwrite their shard instead of double-counting."""
    import pandas as pd

    from flo_spark.operators.sketch import CountMinSketch

    cand = (
        _expand_slides(batch, ts, item, window_sec, slide_sec)
        .groupBy("window_start", "item")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = CountMinSketch(width, depth).add(
            pdf["item"].tolist(), pdf["cnt"].tolist()
        )
        cells, total = sk.to_row()
        return pd.DataFrame(
            {
                "window_start": [pdf["window_start"].iloc[0]],
                "cells": [cells],
                "total": [total],
            }
        )

    sk_rows = cand.groupBy("window_start").applyInPandas(build, _CM_SK_SCHEMA)
    sk_rows.write.mode("overwrite").parquet(
        _shard(os.path.join(store_dir, "sketch"), batch_id)
    )
    cand.write.mode("overwrite").parquet(
        _shard(os.path.join(store_dir, "cand"), batch_id)
    )
    cand.unpersist()


def _batch_shards(kind_dir: str) -> list[tuple[int, str]]:
    if not os.path.isdir(kind_dir):
        return []
    out = []
    for d in os.listdir(kind_dir):
        if d.startswith("batch="):
            out.append((int(d.split("=", 1)[1]), os.path.join(kind_dir, d)))
    return sorted(out)


def _base_dirs(kind_dir: str) -> list[tuple[int, str]]:
    """Compacted bases, named ``base-upto-N`` (N = highest batch id
    folded in).  The LARGEST N is current; smaller ones are leftovers
    of an interrupted compaction and are ignored by readers."""
    if not os.path.isdir(kind_dir):
        return []
    out = []
    for d in os.listdir(kind_dir):
        if d.startswith(_BASE):
            out.append((int(d[len(_BASE):]), os.path.join(kind_dir, d)))
    return sorted(out)


def _store_shards(store_dir: str, sub: str,
                  include_base: bool = False) -> list[str]:
    """Live shards of one store kind: the current base (largest
    ``base-upto-N``) plus batch shards with id > N.  Batch shards at or
    below the base watermark are already folded in (stale leftovers of
    a crash between publish and cleanup) and are excluded so nothing
    double-counts."""
    kind = os.path.join(store_dir, sub)
    bases = _base_dirs(kind)
    floor = bases[-1][0] if bases else -1
    out = [p for i, p in _batch_shards(kind) if i > floor]
    if include_base and bases:
        out.append(bases[-1][1])
    return out


def read_countmin_windows(spark, store_dir: str, width: int = 1024,
                          depth: int = 4) -> dict:
    """{window_start: merged CountMinSketch} across every batch shard.
    Driver-side but bounded: O(batches x windows) sketch rows of
    width*depth cells each — a real deployment compacts shards per
    window once batches pile up; raw events never move."""
    from flo_spark.operators.sketch import CountMinSketch

    out: dict = {}
    shards = _store_shards(store_dir, "sketch", include_base=True)
    if not shards:
        return out
    for row in spark.read.parquet(*shards).collect():
        sk = out.setdefault(row.window_start, CountMinSketch(width, depth))
        sk.merge(
            CountMinSketch.from_row(
                list(row.cells), int(row.total), width, depth
            )
        )
    return out


def read_candidate_counts(spark, store_dir: str) -> DataFrame:
    """Exact per-(window, item) counts from the candidate shards: each
    batch contributed its full per-window counts, and counts are
    additive, so summing shards reproduces the true sliding counts
    without touching raw history."""
    shards = _store_shards(store_dir, "cand", include_base=True)
    if not shards:
        raise ValueError("no candidate shards in store")
    return (
        spark.read.parquet(*shards)
        .groupBy("window_start", "item")
        .agg(F.sum("cnt").alias("cnt"))
    )


def countmin_topk_monitor(
    stream: DataFrame,
    store_dir: str,
    ts: Column,
    item: Column,
    checkpoint_dir: str,
    window_sec: int = 3600,
    slide_sec: int = 1800,
    width: int = 1024,
    depth: int = 4,
    timeout_sec: int = 120,
) -> DataFrame:
    """Drain a stream through the Count-Min sliding fold; return the
    exact per-(window, item) counts re-aggregated from the candidate
    shards.  The per-window sketches stay IN the store as DataFrame
    rows — merge them distributed (one cogroup per window) or via
    ``read_countmin_windows`` when the window count is small."""
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: fold_countmin_batch(
                b, eid, store_dir, ts, item, window_sec, slide_sec,
                width, depth,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"countmin monitor did not drain within {timeout_sec}s"
        )
    return read_candidate_counts(stream.sparkSession, store_dir)


def sketch_rows_df(spark, store_dir: str) -> DataFrame:
    """The raw per-(batch, window) sketch rows as a DataFrame — the
    distributed path for estimating against the store."""
    shards = _store_shards(store_dir, "sketch", include_base=True)
    if not shards:
        raise ValueError("no sketch shards in store")
    return spark.read.parquet(*shards)


# -------------------------------------------------------------------------
# store compaction — the "shards pile up" answer the fold docstrings promise
# -------------------------------------------------------------------------

def compact_countmin_store(spark, store_dir: str, width: int = 1024,
                           depth: int = 4,
                           committed_through: int | None = None) -> int:
    """Fold batch shards of a Count-Min sliding store into one
    compacted ``base-upto-N`` shard per kind (sketch rows merged
    cell-wise per window; candidate counts summed per (window, item)),
    then drop the folded shards.  Returns the number of batch shards
    folded.

    Replay safety: foreachBatch writes its shards BEFORE the
    checkpoint commits the batch, so the shard with the HIGHEST batch
    id may belong to an uncommitted batch that Structured Streaming
    will replay.  Micro-batch execution runs one batch at a time, so
    only that highest id can be in flight — by default it is excluded
    from folding; pass ``committed_through`` (e.g. the last committed
    batchId from the checkpoint or StreamingQuery progress) to fold
    through a known watermark instead.

    Crash safety: the merged result publishes by an atomic
    ``os.rename`` to ``base-upto-N`` BEFORE anything is deleted.
    Readers always use the largest base plus batch shards above its
    watermark, so every crash point leaves a consistent view: before
    the rename the old state is intact; after it, folded inputs are
    stale-but-ignored until this or the next compaction deletes them.

    100 TB shape: the whole fold is two aggregations over
    O(batches x windows) sketch/candidate rows — never raw history;
    run it whenever shard count grows past the read fan-in you want."""
    import shutil

    import pandas as pd

    from flo_spark.operators.sketch import CountMinSketch

    folded = 0
    for sub in ("sketch", "cand"):
        kind = os.path.join(store_dir, sub)
        bases = _base_dirs(kind)
        floor = bases[-1][0] if bases else -1
        live = [(i, p) for i, p in _batch_shards(kind) if i > floor]
        if committed_through is None:
            guard = max((i for i, _ in live), default=-1)
            fold = [(i, p) for i, p in live if i < guard]
        else:
            fold = [(i, p) for i, p in live if i <= committed_through]
        if fold:
            new_n = max(i for i, _ in fold)
            srcs = [p for _, p in fold] + ([bases[-1][1]] if bases else [])
            df = spark.read.parquet(*srcs)
            if sub == "cand":
                merged = df.groupBy("window_start", "item").agg(
                    F.sum("cnt").alias("cnt")
                )
            else:
                def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
                    sk = CountMinSketch(width, depth)
                    for cells, total in zip(pdf["cells"], pdf["total"]):
                        sk.merge(
                            CountMinSketch.from_row(
                                list(cells), int(total), width, depth
                            )
                        )
                    cells, total = sk.to_row()
                    return pd.DataFrame(
                        {
                            "window_start": [pdf["window_start"].iloc[0]],
                            "cells": [cells],
                            "total": [total],
                        }
                    )

                merged = df.groupBy("window_start").applyInPandas(
                    merge_rows, _CM_SK_SCHEMA
                )
            tmp_dir = os.path.join(kind, "_compacting")
            if os.path.isdir(tmp_dir):
                shutil.rmtree(tmp_dir)  # leftover of an interrupted run
            merged.write.mode("overwrite").parquet(tmp_dir)
            os.rename(tmp_dir, os.path.join(kind, f"{_BASE}{new_n}"))
            folded += len(fold)
        # cleanup AFTER publish (also sweeps a prior crash's leftovers):
        # batch shards at or below the current watermark + older bases
        bases = _base_dirs(kind)
        if bases:
            cur_n, cur_p = bases[-1]
            for i, p in _batch_shards(kind):
                if i <= cur_n:
                    shutil.rmtree(p)
            for n, p in bases[:-1]:
                shutil.rmtree(p)
    return folded


def _compact_flat(spark, store_dir: str, merge_fn,
                  committed_through: int | None) -> int:
    """Shared fold for flat stores: same watermark guard, atomic
    ``base-upto-N`` publish, and post-publish cleanup as the Count-Min
    compactor.  ``merge_fn(df) -> DataFrame`` reduces the unioned live
    rows to the compacted representation."""
    import shutil

    bases = _base_dirs(store_dir)
    floor = bases[-1][0] if bases else -1
    live = [(i, p) for i, p in _batch_shards(store_dir) if i > floor]
    if committed_through is None:
        guard = max((i for i, _ in live), default=-1)
        fold = [(i, p) for i, p in live if i < guard]
    else:
        fold = [(i, p) for i, p in live if i <= committed_through]
    folded = 0
    if fold:
        new_n = max(i for i, _ in fold)
        srcs = [p for _, p in fold] + ([bases[-1][1]] if bases else [])
        merged = merge_fn(spark.read.parquet(*srcs))
        tmp_dir = os.path.join(store_dir, "_compacting")
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        merged.write.mode("overwrite").parquet(tmp_dir)
        os.rename(tmp_dir, os.path.join(store_dir, f"{_BASE}{new_n}"))
        folded = len(fold)
    bases = _base_dirs(store_dir)
    if bases:
        cur_n, _cur_p = bases[-1]
        for i, p in _batch_shards(store_dir):
            if i <= cur_n:
                shutil.rmtree(p)
        for _n, p in bases[:-1]:
            shutil.rmtree(p)
    return folded


def compact_sketch_store(spark, store_dir: str, capacity: int = 1024,
                         committed_through: int | None = None) -> int:
    """Fold the quantile store's batch shards into one base row (KLL
    merge is associative, so the compacted sketch answers identically).
    Same replay/crash safety as ``compact_countmin_store``."""
    import pandas as pd

    from flo_spark.operators.sketch import merge_sketch_rows

    def merge_fn(df: DataFrame) -> DataFrame:
        def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            levels, bound = merge_sketch_rows(pdf, capacity).to_row()
            return pd.DataFrame({"levels": [levels], "bound": [bound]})

        return (
            df.withColumn("g", F.lit(1)).groupBy("g").applyInPandas(
                merge_rows, _SCHEMA
            )
        )

    return _compact_flat(spark, store_dir, merge_fn, committed_through)


def compact_theta_store(spark, store_dir: str, k: int = 256,
                        committed_through: int | None = None) -> int:
    """Fold the theta store's batch shards into one base row per
    segment (KMV state is a pure set function, so the compacted store
    provably equals the uncompacted one).  Same replay/crash safety as
    ``compact_countmin_store``."""
    import pandas as pd

    from flo_spark.operators.sketch import ThetaSketch

    def merge_fn(df: DataFrame) -> DataFrame:
        def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            sk = ThetaSketch(k)
            for hashes in pdf["hashes"]:
                sk.merge(ThetaSketch.from_row(list(hashes), k))
            return pd.DataFrame(
                {"segment": [pdf["segment"].iloc[0]], "hashes": [sk.to_row()]}
            )

        return df.groupBy("segment").applyInPandas(merge_rows, _THETA_SCHEMA)

    return _compact_flat(spark, store_dir, merge_fn, committed_through)
