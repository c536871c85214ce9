"""Mergeable quantile sketch — a deterministic KLL-style compactor.

The blueprint's "novel sketch" slot (SURVEY §2 B-LLM: custom operators
as Arrow-batched Python where Spark lacks a built-in): Spark exposes
``percentile_approx`` but NOT its sketch state, so partial quantile
summaries cannot be persisted per partition/day and re-aggregated the
way HLL sketches can (``hll_union_agg``).  This module fills that gap
with a compactor sketch in the KLL family (Karnin-Lang-Liberty 2016),
simplified to a DETERMINISTIC alternating compaction so results are
reproducible run to run and engine to engine:

- level k holds values with weight 2^k in an unsorted buffer;
- when a level exceeds capacity, the buffer is sorted and the
  odd-indexed half is promoted to level k+1 (weight doubles); an odd
  leftover stays at level k, so TOTAL WEIGHT IS EXACTLY PRESERVED —
  ``total_weight()`` always equals the number of inserted values;
- each compaction of level k perturbs any rank by at most 2^k, and the
  sketch tracks the accumulated worst-case ``rank_error_bound``
  (deterministic compaction trades KLL's randomized unbiasedness for a
  still-valid worst-case bound, property-tested in
  tests/test_sketch.py);
- ``merge`` concatenates levels pairwise and re-compacts — partial
  sketches built per partition combine associatively, the property
  that makes the operator distribute.

Size: O(capacity * log(n / capacity)) doubles; the relative rank error
is ~log2(n/capacity)/capacity, so capacity scales with log(n) to hold
a target epsilon (1024 keeps it under 2% out to ~1e12 rows).

Serialization is columnar (list of per-level value lists + the bound),
so sketches travel between Spark tasks as plain
``array<array<double>>`` rows — no binary codec needed.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "CountMinSketch",
    "QuantileSketch",
    "ThetaSketch",
    "SKETCH_ROW_SCHEMA",
    "sketch_partials_fn",
    "merge_sketch_rows",
]


class QuantileSketch:
    def __init__(self, capacity: int = 1024):
        if capacity < 2:
            raise ValueError("capacity must be >= 2")
        self.capacity = int(capacity)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.rank_error_bound: int = 0

    # -- building ---------------------------------------------------------

    def add(self, values) -> "QuantileSketch":
        arr = np.asarray(values, dtype=np.float64).ravel()
        if arr.size:
            self.levels[0] = np.concatenate([self.levels[0], arr])
            self._compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for k, arr in enumerate(other.levels):
            while k >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            if arr.size:
                self.levels[k] = np.concatenate([self.levels[k], arr])
        self.rank_error_bound += other.rank_error_bound
        self._compact()
        return self

    def _compact(self) -> None:
        k = 0
        while k < len(self.levels):
            buf = self.levels[k]
            if buf.size > self.capacity:
                buf = np.sort(buf)
                if buf.size % 2:  # odd leftover keeps its weight here
                    leftover, buf = buf[:1], buf[1:]
                else:
                    leftover = np.empty(0, dtype=np.float64)
                promoted = buf[1::2]  # deterministic alternating pick
                self.levels[k] = leftover
                if k + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[k + 1] = np.concatenate(
                    [self.levels[k + 1], promoted]
                )
                # any fixed rank moves by at most 2^k per compaction
                self.rank_error_bound += 1 << k
            k += 1

    # -- querying ---------------------------------------------------------

    def total_weight(self) -> int:
        return int(sum(arr.size << k for k, arr in enumerate(self.levels)))

    def n_retained(self) -> int:
        return int(sum(arr.size for arr in self.levels))

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        total = self.total_weight()
        if total == 0:
            raise ValueError("empty sketch")
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(arr.size, 1 << k) for k, arr in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        target = q * total
        cum = np.cumsum(wts)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(idx, len(vals) - 1)])

    # -- columnar (de)serialization for Spark rows ------------------------

    def to_row(self) -> tuple[list[list[float]], int]:
        return [arr.tolist() for arr in self.levels], self.rank_error_bound

    @classmethod
    def from_row(
        cls, levels: list[list[float]], bound: int, capacity: int = 1024
    ) -> "QuantileSketch":
        sk = cls(capacity)
        sk.levels = [np.asarray(lv, dtype=np.float64) for lv in levels]
        if not sk.levels:
            sk.levels = [np.empty(0, dtype=np.float64)]
        sk.rank_error_bound = int(bound)
        return sk


# -- shared Spark reduction helpers ---------------------------------------
#
# One implementation of the per-partition partial build and the
# shard-row merge, used by BOTH the batch entry and the streaming
# monitor — so a fix (e.g. the NaN filtering below) lands everywhere.

SKETCH_ROW_SCHEMA = "levels array<array<double>>, bound long"


def sketch_partials_fn(capacity: int = 1024, col: str = "v"):
    """mapInPandas body: fold a partition's values into one sketch row.
    NULL/NaN values are dropped — they carry no rank and would poison
    every quantile above their sort position."""

    def partials(it):
        import pandas as pd

        sk = QuantileSketch(capacity)
        seen = False
        for pdf in it:
            if len(pdf):
                vals = pdf[col].to_numpy(dtype=np.float64)
                vals = vals[~np.isnan(vals)]
                if vals.size:
                    seen = True
                    sk.add(vals)
        if seen:
            levels, bound = sk.to_row()
            yield pd.DataFrame({"levels": [levels], "bound": [bound]})

    return partials


def merge_sketch_rows(pdf, capacity: int = 1024) -> QuantileSketch:
    """Fold a frame of serialized sketch rows into one sketch."""
    sk = QuantileSketch(capacity)
    for levels, bound in zip(pdf["levels"], pdf["bound"]):
        sk.merge(QuantileSketch.from_row(list(levels), int(bound), capacity))
    return sk


# -------------------------------------------------------------------------
# Theta sketch (KMV) — set ALGEBRA on sketches, which HLL cannot do
# -------------------------------------------------------------------------


class ThetaSketch:
    """K-minimum-values theta sketch over hashed items (Beyer et al.;
    the DataSketches theta family).  Where HLL supports only union,
    theta sketches estimate INTERSECTIONS and differences of sets that
    were sketched independently — the "how many users did both X and
    Y" question at 100 TB without a distinct-join.

    Determinism: items hash through blake2b/8B to a uniform point in
    [0, 2^63); the sketch keeps the k smallest points, so its state is
    a pure function of the item SET — insertion order, partitioning,
    and merge order all cancel (property-tested).  With fewer than k
    distinct items the sketch is EXACT.

    Estimation: with the k-th smallest point at T (theta = T / 2^63),
    the retained points are a uniform sample of the set at rate theta,
    so |S| ~= (k - 1) / theta.  Intersection: cut both sketches to
    theta = min(theta_a, theta_b); common retained points / theta
    estimates the overlap.  Relative error ~ 1/sqrt(k)."""

    MAX_HASH = 1 << 63

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self._hashes: np.ndarray = np.empty(0, dtype=np.int64)

    @staticmethod
    def hash_items(items) -> np.ndarray:
        import hashlib

        out = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        str(x).encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                >> 1  # into [0, 2^63)
                for x in items
            ),
            dtype=np.int64,
            count=len(items),
        )
        return out

    def add_hashes(self, hashes: np.ndarray) -> "ThetaSketch":
        merged = np.unique(np.concatenate([self._hashes, hashes]))
        self._hashes = merged[: self.k]
        return self

    def add(self, items) -> "ThetaSketch":
        return self.add_hashes(self.hash_items(list(items)))

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        return self.add_hashes(other._hashes)

    def theta(self) -> float:
        if len(self._hashes) < self.k:
            return 1.0
        return float(self._hashes[-1]) / self.MAX_HASH

    def estimate(self) -> float:
        if len(self._hashes) < self.k:
            return float(len(self._hashes))  # exact below capacity
        return (self.k - 1) / self.theta()

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        th = min(self.theta(), other.theta())
        cut = int(th * self.MAX_HASH)
        a = self._hashes[self._hashes < cut] if th < 1.0 else self._hashes
        b = other._hashes[other._hashes < cut] if th < 1.0 else other._hashes
        common = np.intersect1d(a, b, assume_unique=True)
        if th >= 1.0:
            return float(len(common))  # both exact
        return len(common) / th

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """A-not-B estimate — the third set-algebra op (DataSketches'
        AnotB).  Same cut-to-common-theta rule as intersection: below
        theta both sketches retain a uniform sample at the SAME rate,
        so the retained difference scaled by 1/theta estimates
        |A \\ B|.  Exact when both sketches are below capacity.
        Identity (tested): on the cut sample, intersect + difference
        partition A's retained points exactly."""
        th = min(self.theta(), other.theta())
        cut = int(th * self.MAX_HASH)
        a = self._hashes[self._hashes < cut] if th < 1.0 else self._hashes
        b = other._hashes[other._hashes < cut] if th < 1.0 else other._hashes
        only_a = np.setdiff1d(a, b, assume_unique=True)
        if th >= 1.0:
            return float(len(only_a))  # both exact
        return len(only_a) / th

    # -- columnar (de)serialization ---------------------------------------

    def to_row(self) -> list[int]:
        return self._hashes.tolist()

    @classmethod
    def from_row(cls, hashes: list[int], k: int = 256) -> "ThetaSketch":
        sk = cls(k)
        sk._hashes = np.asarray(sorted(hashes), dtype=np.int64)[:k]
        return sk


# -------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation, overestimate-only
# -------------------------------------------------------------------------


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): a depth x width
    integer table; each item increments one cell per row, a point query
    takes the MIN over its rows.  Collisions only ADD, so the estimate
    is a deterministic one-sided bound: estimate(x) >= true_count(x),
    ALWAYS — that inequality, not the probabilistic eps*N upper bound,
    is the cross-engine contract the catalog entry hashes.

    Determinism/mergeability: items hash once through blake2b/8B (the
    ThetaSketch hash), then each row derives its cell by a fixed
    per-row uint64 multiply-add (wrap-around) followed by an xor-shift
    mix and a mod-width reduction — see ``_positions``, which IS the
    normative placement.  Merge is cell-wise integer sum,
    so the table is a pure function of the input MULTISET — insertion
    order, partitioning, and merge shape all cancel (property-tested),
    which is what lets per-partition/per-batch partials persist and
    re-aggregate at 100 TB without rescanning raw data.

    Error model (for sizing, tested statistically not hashed):
    estimate <= true + eps*N with probability >= 1 - delta for
    eps = e/width, delta = exp(-depth)."""

    _MASK = (1 << 64) - 1

    def __init__(self, width: int = 2048, depth: int = 4):
        if width < 8 or depth < 1:
            raise ValueError("width must be >= 8 and depth >= 1")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0  # total inserted weight (exact, merges by sum)
        # fixed per-row multiply-shift-xor mixers derived from the row
        # index — identical in every process, vectorizable in uint64
        self._a = [
            (2 * r * 0x9E3779B97F4A7C15 + 1) & self._MASK
            for r in range(1, depth + 1)
        ]
        self._b = [
            (r * 0xC2B2AE3D27D4EB4F + r) & self._MASK
            for r in range(1, depth + 1)
        ]

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) cell indices for pre-hashed items — uint64
        wrap-around multiply + xor-shift mixing, fully vectorized."""
        h = hashes.astype(np.uint64)
        pos = np.empty((self.depth, len(hashes)), dtype=np.int64)
        with np.errstate(over="ignore"):  # wrap-around is the point
            for r in range(self.depth):
                mixed = h * np.uint64(self._a[r]) + np.uint64(self._b[r])
                mixed ^= mixed >> np.uint64(33)
                pos[r] = (mixed % np.uint64(self.width)).astype(np.int64)
        return pos

    def add(self, items, counts=None) -> "CountMinSketch":
        items = list(items)
        if not items:
            return self
        w = (
            np.ones(len(items), dtype=np.int64)
            if counts is None
            else np.asarray(list(counts), dtype=np.int64)
        )
        if np.any(w < 0):
            raise ValueError("negative weights")
        pos = self._positions(ThetaSketch.hash_items(items))
        for r in range(self.depth):
            np.add.at(self.table[r], pos[r], w)
        self.total += int(w.sum())
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("cannot merge sketches of different shapes")
        self.table += other.table
        self.total += other.total
        return self

    def estimate(self, item) -> int:
        pos = self._positions(ThetaSketch.hash_items([item]))
        return int(min(self.table[r, pos[r, 0]] for r in range(self.depth)))

    def estimate_many(self, items) -> np.ndarray:
        items = list(items)
        if not items:
            return np.empty(0, dtype=np.int64)
        pos = self._positions(ThetaSketch.hash_items(items))
        ests = np.stack(
            [self.table[r, pos[r]] for r in range(self.depth)]
        )
        return ests.min(axis=0)

    # -- columnar (de)serialization ---------------------------------------

    def to_row(self) -> tuple[list[int], int]:
        return self.table.reshape(-1).tolist(), self.total

    @classmethod
    def from_row(
        cls, cells: list[int], total: int, width: int = 2048, depth: int = 4
    ) -> "CountMinSketch":
        sk = cls(width, depth)
        arr = np.asarray(cells, dtype=np.int64)
        if arr.size != width * depth:
            raise ValueError("cell count does not match sketch shape")
        sk.table = arr.reshape(depth, width).copy()
        sk.total = int(total)
        return sk
