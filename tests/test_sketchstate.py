"""Mergeable sketch state (operators/sketchstate.py).

Pins the exactness regime the module documents: below the theta nominal
(4096) / KLL capacity, every consumer answer equals the exact answer
computed from raw rows — and the state is partition-invariant, so any
executor layout produces identical answers.
"""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from localitysensitivesketch_spark.operators import sketchstate as S


@pytest.fixture(scope="module")
def events(spark):
    # 3 groups x 6 days, keys drawn so groups overlap and new keys appear
    # over time; deterministic (no RNG).
    rows = []
    base = datetime.datetime(2024, 1, 1)
    for i in range(4000):
        g = ["a", "b", "c"][i % 3]
        day = (i * 7) % 6
        key = (i * 37 + day * 11) % 311  # < theta nominal: exact regime
        val = float((i * 13) % 997) / 7.0
        rows.append((g, base + datetime.timedelta(days=day), key, val))
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id long, value double"
    )


@pytest.fixture(scope="module")
def state(events):
    return S.sketch_window_state(events).localCheckpoint()


def test_state_shape_is_groups_by_windows(events, state):
    n_cells = events.select("event_type", F.to_date("ts")).distinct().count()
    assert state.count() == n_cells
    assert set(state.columns) == {
        "group", "window_start", "key_sketch", "value_sketch", "n_rows",
    }


def test_merged_distinct_exact_below_nominal(events, state):
    got = {
        (r["group"]): (r["n_windows"], r["distinct_keys"])
        for r in S.merged_distinct(state).collect()
    }
    exact = {
        r["event_type"]: (r["w"], r["d"])
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct(F.to_date("ts")).alias("w"),
            F.countDistinct("user_id").alias("d"),
        )
        .collect()
    }
    assert got == exact


def test_first_seen_matches_min_window(events, state):
    got = {
        (r["group"], r["window_start"]): r["first_seen"]
        for r in S.first_seen_counts(state).collect()
    }
    first = (
        events.groupBy("event_type", "user_id")
        .agg(F.min(F.date_format("ts", "yyyy-MM-dd")).alias("w0"))
        .groupBy("event_type", "w0")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    exact = {(r["event_type"], r["w0"]): r["n"] for r in first}
    # every (group, window) emits a row; windows with no new keys are 0
    assert sum(got.values()) == sum(exact.values())
    for k, v in exact.items():
        assert got[k] == v
    for k, v in got.items():
        assert v == exact.get(k, 0)


def test_group_overlap_exact(events, state):
    got = {
        (r["group_a"], r["group_b"]): r["overlap_keys"]
        for r in S.group_overlap(state).collect()
    }
    sets = {
        g: {
            r["user_id"]
            for r in events.filter(F.col("event_type") == g)
            .select("user_id")
            .distinct()
            .collect()
        }
        for g in ("a", "b", "c")
    }
    assert got == {
        ("a", "b"): len(sets["a"] & sets["b"]),
        ("a", "c"): len(sets["a"] & sets["c"]),
        ("b", "c"): len(sets["b"] & sets["c"]),
    }


def test_merged_quantiles_rank_error_bound(events, state):
    # KLL k=200 guarantees ~1.65% rank error at 99% confidence; assert the
    # merged-sketch answer's TRUE rank is within 2% of the requested rank.
    got = {
        r["group"]: (r["q50"], r["q90"], r["q99"])
        for r in S.merged_quantiles(state).collect()
    }
    for g in ("a", "b", "c"):
        vals = np.sort(
            np.array(
                [
                    r["value"]
                    for r in events.filter(F.col("event_type") == g)
                    .select("value")
                    .collect()
                ]
            )
        )
        n = len(vals)
        for p, q in zip((0.5, 0.9, 0.99), got[g]):
            true_rank = np.searchsorted(vals, q, side="right") / n
            assert abs(true_rank - p) <= 0.02, (g, p, q, true_rank)


def test_state_is_partition_invariant(events, state):
    # theta consumers are bit-deterministic across partition layouts (the
    # sketch is a pure function of the key SET); KLL compaction depends on
    # merge order, so quantiles get the rank-bound test above instead.
    other = S.sketch_window_state(events.repartition(17))
    for fn in (S.merged_distinct, S.first_seen_counts, S.group_overlap):
        a = sorted(map(tuple, fn(state).collect()))
        b = sorted(map(tuple, fn(other).collect()))
        assert a == b, fn.__name__


def test_all_consumers_jvm_only(state):
    for fn in (S.merged_distinct, S.first_seen_counts, S.group_overlap,
               S.merged_quantiles):
        plan = fn(state)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__


def test_coalesce_partials_equals_direct_build(events, state):
    # split rows 3 ways by hash, build partial state per split, coalesce —
    # theta consumers must equal the single-build answers bit-for-bit
    splits = [
        events.filter(F.pmod(F.xxhash64("user_id", "ts"), F.lit(3)) == i)
        for i in range(3)
    ]
    partials = splits[0].sparkSession.createDataFrame([], S.sketch_window_state(splits[0]).schema)
    for sp in splits:
        partials = partials.unionByName(S.sketch_window_state(sp))
    merged = S.coalesce_state(partials)
    for fn in (S.merged_distinct, S.first_seen_counts, S.group_overlap):
        a = sorted(map(tuple, fn(state).collect()))
        b = sorted(map(tuple, fn(merged).collect()))
        assert a == b, fn.__name__
    # n_rows must be conserved through the merge
    assert (
        merged.agg(F.sum("n_rows")).first()[0]
        == state.agg(F.sum("n_rows")).first()[0]
    )


def test_stream_sketch_state_matches_batch(spark, events, state, tmp_path):
    from localitysensitivesketch_spark.streaming import stream as ST

    src = str(tmp_path / "events_src")
    events.repartition(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_type string, ts timestamp, user_id long, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = ST.stream_sketch_state(spark, stream, str(tmp_path / "store"))
    q.awaitTermination(120)
    got = ST.read_sketch_state(spark, str(tmp_path / "store"))
    for fn in (S.merged_distinct, S.first_seen_counts, S.group_overlap):
        a = sorted(map(tuple, fn(state).collect()))
        b = sorted(map(tuple, fn(got).collect()))
        assert a == b, fn.__name__


def test_stream_sketch_state_replay_is_idempotent(spark, events, tmp_path):
    from localitysensitivesketch_spark.operators.sketchstate import (
        sketch_window_state,
    )

    state_path = str(tmp_path / "store" / "sketch_state")

    def write_batch(df, batch_id):
        sketch_window_state(df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(state_path)

    half = events.filter(F.pmod(F.xxhash64("user_id", "ts"), F.lit(2)) == 0)
    write_batch(half, 0)
    write_batch(events.subtract(half), 1)
    once = spark.read.parquet(state_path).count()
    write_batch(events.subtract(half), 1)  # replay of batch 1
    again = spark.read.parquet(state_path).count()
    assert once == again
    from localitysensitivesketch_spark.streaming.stream import read_sketch_state

    got = sorted(
        map(tuple, S.merged_distinct(read_sketch_state(spark, str(tmp_path / "store"))).collect())
    )
    want = sorted(
        map(tuple, S.merged_distinct(sketch_window_state(events)).collect())
    )
    assert got == want


def test_novelty_report_exact(spark):
    # keys recur across snapshots: snapshot s sees keys [0, 40+10s)
    rows = [
        (s, k) for s in range(4) for k in range(40 + 10 * s) for _ in range(2)
    ]
    df = spark.createDataFrame(rows, "snap int, k int")
    got = {
        (r["snapshot"]): (r["n_docs"], r["distinct_keys"], r["first_seen_keys"], r["novelty"])
        for r in S.novelty_report(df, key="k", snapshot="snap").collect()
    }
    want = {
        0: (80, 40, 40, 1.0),
        1: (100, 50, 10, 0.2),
        2: (120, 60, 10, round(10 / 60, 6)),
        3: (140, 70, 10, round(10 / 70, 6)),
    }
    assert got == want


def test_novelty_report_grouped_and_plan(spark):
    rows = [("a", s, k) for s in range(2) for k in range(30)] + [
        ("b", s, k) for s in range(2) for k in range(s, 30 + s)
    ]
    df = spark.createDataFrame(rows, "g string, snap int, k int")
    out = S.novelty_report(df, key="k", snapshot="snap", group="g")
    got = {(r["group"], r["snapshot"]): r["first_seen_keys"] for r in out.collect()}
    assert got == {("a", 0): 30, ("a", 1): 0, ("b", 0): 30, ("b", 1): 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_key_only_state(events):
    st = S.sketch_window_state(events, value_col=None)
    assert "value_sketch" not in st.columns
    merged = S.coalesce_state(st)
    a = sorted(map(tuple, S.merged_distinct(merged).collect()))
    b = sorted(map(tuple, S.merged_distinct(S.sketch_window_state(events)).collect()))
    assert a == b
