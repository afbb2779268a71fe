"""Fixed-width binary KV record source — the reference's wire format.

The reference's universal record is ``key-bytes ∥ int32(count)``
(``Ingest/Pub4PCapStreamKVTable.java:585-611`` encodes,
``Query/AsyncFlowApps.java:246-287`` decodes 13-byte trace records with a
4-byte key, and ``Sketching/Sub4SketchingKVStream.java`` consumes the same
framing from Pulsar).  This source reads such files distributed:
``spark.read.format("binaryFile")`` lists + loads whole files (one row per
file), then an Arrow-batched numpy reshape unpacks the fixed-width records
— no per-record Python.

For multi-GB traces the Spark-native alternative is splitting files
upstream; record framing has no sync markers, so a file is the atomic unit
(exactly like the reference, which streams one file per socket).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RECORD_SCHEMA = "path string, record_idx long, key binary, count int"


def write_kv_records(path: str, records: list[tuple[bytes, int]], key_len: int) -> None:
    """Encode ``key ∥ int32BE(count)`` records (the reference's
    ``createKVByte``, ``Pub4PCapStreamKVTable.java:585-589`` — Java
    DataOutputStream is big-endian)."""
    with open(path, "wb") as f:
        for key, count in records:
            if len(key) != key_len:
                raise ValueError(f"key length {len(key)} != {key_len}")
            f.write(key + int(count).to_bytes(4, "big", signed=True))


def _parse_fn(key_len: int):
    rec_len = key_len + 4

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                buf = np.frombuffer(content, dtype=np.uint8)
                n = buf.size // rec_len
                if n == 0:
                    continue
                mat = buf[: n * rec_len].reshape(n, rec_len)
                keys = [mat[i, :key_len].tobytes() for i in range(n)]
                counts = (
                    mat[:, key_len:].astype(np.int64)
                    @ np.array([1 << 24, 1 << 16, 1 << 8, 1], dtype=np.int64)
                ).astype(np.int64)
                # big-endian signed int32
                counts = np.where(counts >= 1 << 31, counts - (1 << 32), counts)
                yield pd.DataFrame(
                    {
                        "path": [path] * n,
                        "record_idx": np.arange(n, dtype=np.int64),
                        "key": keys,
                        "count": counts.astype(np.int32),
                    }
                )

    return fn


def read_kv_records(
    spark: SparkSession, path: str, key_len: int
) -> DataFrame:
    """(path, record_idx, key, count) rows from fixed-width KV files.

    Truncated trailing bytes are dropped, matching the reference's reader
    (``AsyncFlowApps.java:246-287`` reads whole records only).
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_parse_fn(key_len), RECORD_SCHEMA)


def kv_records_to_counts(records: DataFrame) -> DataFrame:
    """A1 ingest aggregation over the wire records: per-key total count
    (``put2BuffMap``, ``Pub4PCapStreamKVTable.java:360-374``)."""
    from pyspark.sql import functions as F

    return records.groupBy("key").agg(F.sum("count").cast("long").alias("cnt"))
