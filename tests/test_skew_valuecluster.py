"""Skew handling (north_rule: explicit) and value-cluster (A11-A13) tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from localitysensitivesketch_spark.config import SketchConfig
from localitysensitivesketch_spark.operators import valuecluster as V
from localitysensitivesketch_spark.operators.candidates import band_candidates
from localitysensitivesketch_spark.operators.dedup import exact_dup_groups
from localitysensitivesketch_spark.operators.signatures import compute_signatures


def test_mega_hot_band_is_capped_not_exploded(spark):
    """6000 identical docs → every band bucket wider than the cap → the
    quadratic 18M-pair join must be DROPPED (logged in metrics), not run.
    Exact-dup tier still catches the group (the reference accepts sketch
    error on hot keys, SURVEY §4.1; we route them to the cheap exact tier)."""
    cfg = SketchConfig(band_width_cap=5000)
    docs = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page text repeated everywhere forever today").alias("text"),
    )
    sigs = compute_signatures(docs, cfg)
    pairs, metrics = band_candidates(sigs, cfg)
    m = {r["bucket_class"]: r for r in metrics.collect()}
    assert "dropped" in m and m["dropped"]["n_buckets"] >= 1
    assert m["dropped"]["max_width"] == 6000
    assert pairs.count() == 0  # no quadratic blowup
    g = exact_dup_groups(docs).collect()
    assert len(g) == 1 and g[0]["group_size"] == 6000


def test_hot_band_salted_path_produces_all_pairs(spark):
    """A band bucket in (hot_threshold, cap] takes the salted join and must
    produce exactly the same pair set as a plain join."""
    cfg = SketchConfig(band_width_cap=5000, salt_factor=4)
    n = 300  # > HOT_THRESHOLD=256
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical content for salting test of the hot bucket path").alias("text"),
    )
    sigs = compute_signatures(docs, cfg)
    pairs, metrics = band_candidates(sigs, cfg)
    m = {r["bucket_class"]: r for r in metrics.collect()}
    assert "salted" in m
    assert pairs.count() == n * (n - 1) // 2  # every unordered pair once


def test_kmeans_centers_and_assignment_match_numpy(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.normal(10, 1, 300), rng.normal(100, 5, 300), rng.normal(1000, 20, 300)
    ])
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    centers = V.kmeans_pp_train(df, "value", k=3, seed=1, n_iter=30)
    assert len(centers) == 3
    # centers land near the true modes
    assert abs(centers[0] - 10) < 3 and abs(centers[1] - 100) < 10 and abs(
        centers[2] - 1000
    ) < 50
    got = V.assign_nearest_center(df, "value", centers).collect()
    want = np.argmin(np.abs(vals[:, None] - centers[None, :]), axis=1)
    by_val = {}
    for r in got:
        by_val.setdefault(round(r["value"], 9), r["value_cluster"])
    for v, w in zip(vals, want):
        assert by_val[round(float(v), 9)] == int(w)


def test_proportional_allocation_sums_and_proportions():
    sizes = V.proportional_allocation(np.array([1.0, 2.0, 3.0, 4.0]), 1000)
    assert sizes.sum() == 1000
    assert sizes[0] == 100 and sizes[3] == 400
    # degenerate weights → uniform
    sizes = V.proportional_allocation(np.zeros(4), 10)
    assert sizes.sum() == 10 and sizes.max() - sizes.min() <= 1


def test_value_cluster_stats_avg_estimator(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (100.0,), (110.0,)], "value double")
    centers = np.array([1.5, 105.0])
    out = {r["value_cluster"]: r for r in V.value_cluster_stats(df, "value", centers).collect()}
    assert out[0]["cnt"] == 2 and out[0]["avg_estimate"] == pytest.approx(1.5)
    assert out[1]["cnt"] == 2 and out[1]["avg_estimate"] == pytest.approx(105.0)
