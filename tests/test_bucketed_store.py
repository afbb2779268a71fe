"""Bucketed store: the write-once shuffle must buy exchange-free joins."""

from pyspark.sql import functions as F

from localitysensitivesketch_spark.sources.bucketed_store import (
    drop_bucketed,
    read_bucketed,
    write_bucketed,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange_and_matches_plain_join(spark):
    a = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("x")
    )
    b = spark.range(0, 500, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("y")
    )
    write_bucketed(a, "t_sig_a", n_buckets=4)
    write_bucketed(b, "t_sig_b", n_buckets=4)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join strategy bucketing targets (tiny test tables would
        # otherwise broadcast and hide the exchange question entirely)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, "t_sig_a").join(
            read_bucketed(spark, "t_sig_b"), "doc_id"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        got = sorted(map(tuple, joined.collect()))
        expect = sorted(map(tuple, a.join(b, "doc_id").collect()))
        assert got == expect and len(got) == 250
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        drop_bucketed(spark, "t_sig_a")
        drop_bucketed(spark, "t_sig_b")


def test_bucketed_aggregate_has_no_exchange(spark):
    sigs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("band_key")
    )
    write_bucketed(sigs, "t_sig_agg", n_buckets=4)
    try:
        agg = (
            read_bucketed(spark, "t_sig_agg")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"))
        )
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == 300
    finally:
        drop_bucketed(spark, "t_sig_agg")
