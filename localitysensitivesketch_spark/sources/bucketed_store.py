"""Bucketed signature store: pay the shuffle once, join exchange-free after.

At 100 TB the signature table is the most re-joined artifact in the
engine — the incremental merge joins new-vs-old signatures per batch
(``plans/incremental.py``), verify re-checks join signatures to pairs,
and a band/row re-configuration re-joins the whole store.  A plain
parquet store re-shuffles BOTH sides of every one of those joins on
``doc_id``.

Datasource bucketing (public Spark API ``DataFrameWriter.bucketBy``)
hash-partitions the table into a fixed number of buckets at WRITE time
and records the layout in the catalog; any later equi-join or aggregate
on the bucket key reads co-located buckets with no Exchange on the
bucketed side — the reference's flush-then-serve window store
(``Sub4SketchingKVStream.java:419-452`` writes sketch windows keyed for
the consumer's lookups) realized with Spark-native machinery.  This is
also the parquet-table stand-in for the Iceberg ``bucket(N, doc_id)``
partition transform the north rule's table layout would use: the write
path and join plans are identical, only the catalog differs.

Sizing rule at scale: pick ``n_buckets`` so one bucket ≈ 100-500 MB
(e.g. 10 TB of signatures → 32-64 k buckets).  Both join sides must be
bucketed with the SAME count (or an integer multiple, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 8,
    bucket_col: str = "doc_id",
    sorted_within: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet catalog table.

    ``sorted_within=True`` additionally sorts rows inside each bucket file
    by the bucket key, so sort-merge joins on that key skip the per-task
    sort as well (plan shows SortMergeJoin with neither Exchange nor Sort
    on this side).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sorted_within:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket layout (``spark.table``
    — a raw ``spark.read.parquet`` of the same files would lose the
    bucketing metadata and re-introduce the exchange)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
