"""Multimodal columns: opaque binary payloads with typed metadata.

A training-data pipeline carries image/audio/video next to text as opaque
``binary`` columns plus typed metadata, decoding only inside vectorized
UDFs at the edge.  The reference treats every payload the same way — keys
are opaque ``byte[]`` all the way through (``util/bloom/Apache/Key.java:
74-113``); structure is imposed only at projection time
(``Ingest/Pub4PCapStreamKVTable.java:405-503``).

The Spark-side plumbing here (schemas, JVM-side metadata extraction,
Arrow-batched decode UDF signatures and batch shapes) is real and tested;
the actual codec calls are stubbed behind ``strict`` because the sandbox
has no image/audio libraries: ``strict=True`` raises NotImplementedError
at the decode site, ``strict=False`` substitutes a clearly-marked
deterministic fake feature (hash-derived), keeping the distributed shape
exercisable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int"
)

# magic-byte prefixes → container format (hex of first bytes)
_MAGIC = {
    "89504E47": "png",
    "FFD8FF": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi
    "664C6143": "flac",
    "1A45DFA3": "mkv/webm",
    "00000018": "mp4",
    "00000020": "mp4",
}


def binary_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """JVM-side metadata over opaque binary: size, crc32, sniffed format.

    Pure codegen'd expressions — the scan reads only (id, payload) and at
    100 TB this runs at I/O speed with no Python."""
    hex8 = F.upper(F.hex(F.substring(F.col(payload_col), 1, 4)))
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        fmt = F.when(hex8.startswith(magic), F.lit(name)).otherwise(fmt)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.crc32(F.col(payload_col)).alias("payload_crc32"),
        F.xxhash64(F.col(payload_col)).alias("payload_xxh64"),
        fmt.alias("format"),
    )


_FEATURE_DIM = 16
_DECODE_SCHEMA = "doc_id long, feature array<float>, decode_ok boolean"


def _decode_fn(strict: bool, feature_dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The real decoder (PIL / torchvision / ffmpeg → decode, resize, pool
        # to feature_dim) is NOT implemented in this environment.  strict=True
        # surfaces that as an error; strict=False always takes the
        # deterministic fake-feature path — a merely-importable image library
        # must not change behavior until a codec body is actually wired.
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            feats = np.zeros((n, feature_dim), dtype=np.float32)
            ok = np.zeros(n, dtype=bool)
            for i, payload in enumerate(pdf["payload"]):
                if payload is None:
                    continue
                if strict:
                    raise NotImplementedError(
                        "no image codec wired; pass strict=False for the "
                        "deterministic fake-feature path"
                    )
                # STUB: deterministic fake feature from payload bytes —
                # exercises schema/partitioning/batching, NOT a real decode.
                h = np.frombuffer(
                    payload[: feature_dim * 4].ljust(feature_dim * 4, b"\0"),
                    dtype=np.uint32,
                )
                feats[i] = (h % 1000).astype(np.float32) / 1000.0
                ok[i] = True
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "feature": list(feats),
                    "decode_ok": ok,
                }
            )

    return fn


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool = False,
    feature_dim: int = _FEATURE_DIM,
) -> DataFrame:
    """Arrow-batched decode → fixed-dim feature vector per payload.

    The distributed contract (pruned 2-column input, mapInPandas batch
    shape, array<float> output feeding :mod:`operators.similarity`) is the
    deliverable; the codec body is a stub (module docstring)."""
    pruned = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).alias("payload"),
    )
    return pruned.mapInPandas(_decode_fn(strict, feature_dim), _DECODE_SCHEMA)


def frame_sample_offsets(
    df: DataFrame,
    duration_col: str = "duration_ms",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    max_frames: int = 32,
) -> DataFrame:
    """Video frame-sampling plan: JVM-side exploded (doc_id, frame_idx,
    offset_ms) rows — the decode of each frame happens in
    :func:`decode_features` downstream.  Pure ``sequence``/``explode``."""
    n_frames = F.least(
        (F.col(duration_col) / every_ms).cast("int") + 1, F.lit(max_frames)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
            "frame_idx", "_i"
        ),
    ).select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("long").alias("offset_ms"),
    )
