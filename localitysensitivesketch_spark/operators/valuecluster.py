"""Value-space clustering: k-means++ centers + nearest-center assignment.

This is the reference's literal core (A11/A12): the LSS sketch partitions
keys into ``c`` clusters by VALUE similarity, trained offline with
k-means++ (``Sketching/LSSFingerprintAtomic.java:436-468``, calling the
external ``ECS.ClusterStatic.KPPCluster``) and assigns each incoming key to
the nearest center (``groupInputKV``, ``:474-498``: ``argmin_i
|center_i − v|``).  Spark-first split:

* **train** — driver-side numpy k-means++ on a bounded sample (centers are
  ``c`` floats — broadcastable by construction, exactly like the
  reference's 8-float center array, ``LogicController.java:83``);
* **assign** — pure JVM expression: ``array_position(array_min(dists))``
  over a literal center array, inside whole-stage codegen.  No UDF, no
  shuffle; the reference's per-key loop becomes a columnar argmin.

Proportional capacity allocation (A13, ``LSSFingerprintAtomic.java:
173-300``) is reproduced in :func:`proportional_allocation`.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_pp_1d(
    values: np.ndarray, k: int = 8, seed: int = 42, n_iter: int = 20
) -> np.ndarray:
    """Deterministic 1-D k-means: quantile seeding + Lloyd iterations.

    Seeding is RNG-free: center ``j`` starts at the ``(2j+1)/2k`` quantile
    element of the (sorted) input — the classic 1-D initialization, mass-
    aware where farthest-point is not (a wide cluster's tail would
    otherwise steal a seed from a distinct narrow mode).  Duplicate picks
    (heavily skewed data) are topped up by greedy max-D² (first index on
    ties).  Lloyd means use ``math.fsum`` (exactly-rounded sum), so the
    centers are BIT-IDENTICAL to any faithful reimplementation regardless
    of summation order or vectorization — the independent pure-python
    shadow (``oracle.oracle_kmeans_1d``) reproduces them without numpy,
    which is what makes the ``value_cluster_stats`` golden oracle
    non-circular (the reference's shadow-map pattern,
    ``LSSFingerprintAtomic.java:77,317-360``: the exact structure is
    SEPARATE from the production one).

    Deterministic in the INPUT ORDER of ``values`` — callers canonicalize
    (sort) first so centers depend only on the value multiset.  ``seed`` is
    accepted for API compatibility; the algorithm uses no randomness."""
    sample = np.asarray(values, dtype=np.float64)
    if sample.size == 0:
        return np.zeros(k)
    n = sample.size
    k = min(k, np.unique(sample).size)
    centers: list[float] = []
    for j in range(k):
        c0 = float(sample[min(n - 1, ((2 * j + 1) * n) // (2 * k))])
        if c0 not in centers:
            centers.append(c0)
    while len(centers) < k:  # skewed data: quantile picks collided
        d2 = np.min(
            np.abs(sample[:, None] - np.array(centers)[None, :]) ** 2, axis=1
        )
        centers.append(float(sample[int(np.argmax(d2))]))
    c = np.array(centers, dtype=np.float64)
    # Lloyd — assignment argmin takes the FIRST min on ties (np.argmin),
    # matching the oracle's strict-< update loop
    for _ in range(n_iter):
        assign = np.argmin(np.abs(sample[:, None] - c[None, :]), axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = math.fsum(sample[m].tolist()) / int(m.sum())
    return np.sort(c)


def kmeans_pp_train(
    df: DataFrame,
    value_col: str,
    k: int = 8,
    seed: int = 42,
    sample_cap: int = 100_000,
    n_iter: int = 20,
) -> np.ndarray:
    """k-means++ init + Lloyd iterations on a driver-side sample (1-D).

    Mirrors ``initClusterCenters`` (``LSSFingerprintAtomic.java:436-468``):
    train once on a trace sample, reuse the centers for every window.
    Returns sorted float64 centers (sorted ⇒ deterministic cluster ids).
    The sample is sorted before training so the centers are independent of
    partition/row order (order-independence at any parallelism, like every
    other operator here).
    """
    total = df.count()
    frac = min(1.0, sample_cap / max(total, 1))
    sample = (
        df.select(F.col(value_col).cast("double").alias("v"))
        .dropna()
        .sample(fraction=frac, seed=seed)
        .toPandas()["v"]
        .to_numpy()
    )
    return kmeans_pp_1d(np.sort(sample), k=k, seed=seed, n_iter=n_iter)


def assign_nearest_center(
    df: DataFrame, value_col: str, centers: np.ndarray, out_col: str = "value_cluster"
) -> DataFrame:
    """A12 ``groupInputKV`` analogue: cluster id = argmin over |center − v|,
    as a pure codegen'd expression (0-indexed; ties → lowest id, matching
    the reference's first-match loop)."""
    v = F.col(value_col).cast("double")
    dists = F.array(*[F.abs(v - F.lit(float(cc))) for cc in centers])
    idx = F.array_position(dists, F.array_min(dists)).cast("int") - 1
    return df.withColumn(out_col, idx)


def proportional_allocation(
    weights: np.ndarray, total_buckets: int, choice: int = 3
) -> np.ndarray:
    """A13 (``LSSFingerprintAtomic.java:173-300``): split ``total_buckets``
    across clusters ∝ a per-cluster weight (the reference's choices mix
    entropy/center/density; callers pass the composed weight), normalized
    with remainder capping so the sizes sum exactly to the total."""
    w = np.asarray(weights, dtype=np.float64)
    if w.sum() <= 0:
        w = np.ones_like(w)
    raw = w / w.sum() * total_buckets
    sizes = np.floor(raw).astype(np.int64)
    rem = total_buckets - sizes.sum()
    order = np.argsort(-(raw - sizes))  # largest fractional parts first
    sizes[order[: int(rem)]] += 1
    return sizes


def value_cluster_stats(
    df: DataFrame, value_col: str, centers: np.ndarray
) -> DataFrame:
    """Per-cluster (count, sum, avg) — the (counter, sum) cell + avg
    estimator (A3/A4, ``LSSEntryFinger.java:100-117,70-80``) at cluster
    granularity."""
    assigned = assign_nearest_center(df, value_col, centers)
    return assigned.groupBy("value_cluster").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(F.col(value_col).cast("double")), 4).alias("total"),
        F.round(F.avg(F.col(value_col).cast("double")), 6).alias("avg_estimate"),
    )
