"""Multimodal column handling: opaque binary payloads + typed metadata.

flo's event `data` column is deliberately opaque bytes
(flo-event/src/lib.rs:185-204); multimodal assets follow the same
model: an asset is a BINARY column plus a metadata struct, processed
by Arrow-batched Pandas functions over ``mapInPandas`` so each batch
moves to Python exactly once.

The actual image/audio decode libraries are NOT in this container, so
``decode_image``/``decode_audio`` are STUBBED behind a deterministic
fake (clearly marked).  The Spark-side plumbing — schema, batch
iteration, partition-preserving mapInPandas, output contract — is real
and tested; swapping in PIL/soundfile is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every binary asset column
ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # 'image/png', 'audio/wav', ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, feat_dim: int = 8) -> list[float]:
    """STUB decode: deterministic pseudo-features from a content hash.

    Replace with a real decoder (PIL image -> resize -> pixel stats,
    librosa frame-sample, ...) when the codec libraries are available.
    """
    if payload is None:
        return [0.0] * feat_dim
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:feat_dim]]


def extract_features(
    assets: DataFrame,
    id_col: str = "asset_id",
    data_col: str = "data",
    feat_dim: int = 8,
    fan_out: bool = False,
) -> DataFrame:
    """Binary -> feature vectors via mapInPandas (Arrow batches).

    Partition-preserving by default: each input partition maps 1:1 to
    an output partition, composing with upstream storage-key
    partitioning.  Set ``fan_out=True`` when the decode is genuinely
    expensive (real image/audio codecs) AND the input has fewer
    partitions than cores (e.g. one small file): it repartitions by id
    to defaultParallelism so the Python stage parallelizes.  Measured
    on the stub decoder at sf0.1 the shuffle costs MORE than the
    serial compute (1.1 s vs 0.63 s) — fan-out only pays when
    per-asset decode dominates the payload shuffle, which is exactly
    the real-codec regime."""
    if fan_out:
        sc = assets.sparkSession.sparkContext
        assets = assets.repartition(sc.defaultParallelism, F.col(id_col))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # one digest per payload; hex, length, and the (stub) feature
            # vector all derive from that single pass over the bytes
            n_bytes, shas, feats = [], [], []
            zero = [0.0] * feat_dim
            for b in pdf[data_col]:
                if b is None:
                    n_bytes.append(0)
                    shas.append("")
                    feats.append(zero)
                    continue
                raw = bytes(b)
                digest = hashlib.sha256(raw).digest()
                n_bytes.append(len(raw))
                shas.append(digest.hex())
                feats.append([x / 255.0 for x in digest[:feat_dim]])
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(n_bytes, dtype="int32"),
                    "content_sha": shas,
                    "feature": feats,
                }
            )

    return assets.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def decode_image(payload: bytes):
    """Decode an image payload to an (H, W, C) uint8 numpy array.

    Uses PIL when available (guarded optional import — deployments with
    codec libraries get the real decoder transparently); raises
    NotImplementedError here, where no media library is installed."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "image decode requires PIL, not present in this container; "
            "extract_features() demonstrates the Spark plumbing with a "
            "deterministic fake decoder"
        ) from exc
    import numpy as np

    with Image.open(io.BytesIO(payload)) as img:  # pragma: no cover
        return np.asarray(img.convert("RGB"))


def decode_audio(payload: bytes):
    """Decode an audio payload to (samples: float32 ndarray, rate: int).

    Uses soundfile when available (guarded optional import); raises
    NotImplementedError here, where no media library is installed."""
    try:
        import io

        import soundfile  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - not in container
        raise NotImplementedError(
            "audio decode requires soundfile, not present in this "
            "container; see extract_features()"
        ) from exc
    return soundfile.read(io.BytesIO(payload))  # pragma: no cover


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adapter: treat documents.text bytes as binary assets (the test
    corpus has no real media, so text payloads stand in)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    id_col: str = "asset_id",
    data_col: str = "data",
    meta_col: str = "meta",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling plumbing: one input asset row fans out to
    <= max_frames frame rows at a fixed time step (bounded by the
    asset's metadata duration).  The real frame grab is STUBBED (a
    per-frame content hash stands in for decoded pixels); the row
    fan-out, Arrow batch shape, and metadata-driven bounds are the real
    cluster-side mechanics.  Fan-out happens inside mapInPandas, so an
    input partition yields one output partition regardless of frame
    count — no shuffle, no skew amplification."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame_sha": [],
            }
            for aid, payload, meta in zip(
                pdf[id_col], pdf[data_col], pdf[meta_col]
            ):
                duration = None
                if meta is not None:
                    duration = meta.get("duration_ms") if isinstance(meta, dict) else meta["duration_ms"]
                if duration is None:
                    # still assets (images/text): a single frame 0
                    duration = 1
                n = min(max_frames, max(1, -(-int(duration) // every_ms)))
                body = b"" if payload is None else bytes(payload)
                for i in range(n):
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    # ASCII ":{i}" suffix (not packed bytes) so any engine
                    # can recompute the stub hash for verification
                    out["frame_sha"].append(
                        hashlib.sha256(body + b":%d" % i).hexdigest()
                    )
            yield pd.DataFrame(out)

    return assets.mapInPandas(_batches, schema=FRAME_SCHEMA)


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    data_col: str = "data",
    meta_col: str = "meta",
) -> DataFrame:
    """Image resize plumbing: rewrites the metadata struct to the
    target dimensions and passes the payload through a STUB transform
    (real implementation: PIL decode -> resize -> re-encode inside the
    same mapInPandas).  Schema contract: output rows keep every input
    column, with `meta.width/height` updated — so resize composes
    transparently with downstream feature extraction."""
    out_schema = T.StructType(assets.schema.fields)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for meta in pdf[meta_col]:
                m = dict(meta) if meta is not None else {}
                m["width"] = width
                m["height"] = height
                metas.append(m)
            pdf = pdf.copy()
            pdf[meta_col] = metas
            yield pdf

    return assets.mapInPandas(_batches, schema=out_schema)
