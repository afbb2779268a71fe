"""IVF (inverted-file) approximate nearest-neighbor search.

Second scale path for similarity search next to the hyperplane-LSH variant
(``similarity.ann_topk_lsh``): the corpus is coarse-quantized into
``n_cells`` Voronoi cells around k-means centroids, and a query probes only
its ``nprobe`` nearest cells — the standard IVF-Flat design from the
published ANN literature (Jégou et al., "Product quantization for nearest
neighbor search", TPAMI 2011 — only the coarse-quantizer stage; no PQ
compression here).  Reference analogue: locality-sensitive placement then
exact disambiguation (``Sketching/LSSFingerprintAtomic.java:474-498`` +
``:317-360``) — the cell id is the placement sketch, the exact cosine
re-rank is the shadow map.

Plan shape at 100 TB:

- **Train** reads a bounded sample (``orderBy(id).limit(m)`` plans as
  ``TakeOrderedAndProject`` — per-partition k-heap, no global sort) and runs
  Lloyd on the driver: k·m·dim ≈ 10⁶ flops, independent of corpus size.
- **Assign** ships the k×dim centroid matrix into the plan as literals
  (a few KB — broadcast-by-construction) and computes the argmin cell
  inside whole-stage codegen via higher-order array functions.  One map
  pass, zero shuffle, zero Python.
- **Search** explodes each query into its ``nprobe`` cell ids and
  equi-joins the (small, broadcast) query side against the assigned corpus
  on ``cell`` — the corpus side is pruned to ~``nprobe/n_cells`` of its
  rows before any cosine is computed, and only ids + scores ever shuffle.

Determinism: training is pure CPython float arithmetic — sequential
left-fold squared distances (the same fold order Spark's ``aggregate``
uses JVM-side) and exactly-rounded ``math.fsum`` means — with quantile
seeding on the norm-sorted sample (no RNG anywhere).  The independent
loop-based shadow in ``oracle.oracle_ivf_centers`` reproduces every
centroid bit-for-bit, which is what makes the hash-checked contract oracle
(``ann_topk_ivf``) possible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm


def _sqdist(vec_col, center: list[float]):
    """Squared euclidean distance vec↔center as a sequential left fold in
    coordinate order (matches the pure-python trainer's accumulation)."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(float(c)) for c in center]),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_train(
    corpus: DataFrame,
    n_cells: int = 8,
    n_iter: int = 5,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Driver-side deterministic Lloyd on a bounded sample → centroids.

    Sample = the ``sample_size`` smallest ids (``TakeOrderedAndProject``,
    one pass over the corpus).  Seeding = quantile picks on the sample
    sorted by (norm, id) — center j starts at the (2j+1)/2k-quantile row —
    duplicate picks topped up by greedy max-D² (farthest-first, first index
    on ties).  Lloyd assignment breaks distance ties toward the lower cell
    index; means use ``math.fsum`` (exactly rounded ⇒ reproducible by any
    independent implementation); an emptied cell keeps its centroid.
    """
    rows = (
        corpus.select(
            F.col(id_col).cast("long").alias("i"), F.col(vec_col).alias("v")
        )
        .orderBy("i")
        .limit(sample_size)
        .collect()
    )
    pts = [[float(x) for x in r["v"]] for r in rows]
    ids = [r["i"] for r in rows]
    if not pts:
        raise ValueError("ivf_train: empty corpus")
    order = sorted(
        range(len(pts)),
        key=lambda i: (math.sqrt(_fold_dot(pts[i], pts[i])), ids[i]),
    )
    n = len(pts)
    k = min(n_cells, n)
    centers: list[list[float]] = []
    for j in range(k):
        cand = pts[order[min(n - 1, ((2 * j + 1) * n) // (2 * k))]]
        if cand not in centers:
            centers.append(cand)
    while len(centers) < k:
        bi, bd = 0, -1.0
        for i in range(n):
            d = min(_fold_sqdist(pts[i], c) for c in centers)
            if d > bd:
                bd, bi = d, i
        centers.append(pts[bi])
    for _ in range(n_iter):
        members: list[list[int]] = [[] for _ in range(k)]
        for i in range(n):
            bj, bd = 0, _fold_sqdist(pts[i], centers[0])
            for j in range(1, k):
                d = _fold_sqdist(pts[i], centers[j])
                if d < bd:
                    bd, bj = d, j
            members[bj].append(i)
        for j in range(k):
            if members[j]:
                m = len(members[j])
                centers[j] = [
                    math.fsum(pts[i][c] for i in members[j]) / m
                    for c in range(len(centers[j]))
                ]
    return centers


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _fold_sqdist(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def ivf_assign(
    df: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): argmin-distance cell per row, entirely JVM-side.

    Distances land in an array literal-by-literal (k×dim doubles inlined —
    the "broadcast"), ``array_position(dists, array_min(dists))`` picks the
    FIRST minimal index, matching the trainer's low-index tie-break.
    """
    dists = F.array(*[_sqdist(F.col(vec_col), c) for c in centers])
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cell"),
    )


def _probe_cells(
    df: DataFrame,
    centers: list[list[float]],
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cell) exploded to the ``nprobe`` nearest cells per row: sort an
    array of (dist, idx) structs (lexicographic ⇒ dist asc, idx asc on
    ties), slice, explode — still zero Python, zero shuffle."""
    scored = F.array(
        *[
            F.struct(
                _sqdist(F.col(vec_col), c).alias("d"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centers)
        ]
    )
    probes = F.slice(F.array_sort(scored), 1, nprobe)
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(F.transform(probes, lambda s: s["idx"])).alias("cell"),
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    n_iter: int = 5,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF cell probing.

    Same output contract and tie-break as ``cosine_topk_bruteforce`` /
    ``ann_topk_lsh``: (query_id, nbr_id, cosine[r6], rank), rank by
    (cosine desc, nbr_id asc).  Recall knob = ``nprobe`` (``nprobe ==
    n_cells`` degenerates to exact brute force).  Pass pre-trained
    ``centers`` to skip training (e.g. incremental refresh reusing the
    previous epoch's centroids).
    """
    if centers is None:
        centers = ivf_train(
            corpus, n_cells, n_iter, sample_size, id_col, vec_col
        )
    corpus_cells = ivf_assign(corpus, centers, id_col, vec_col)
    c = (
        corpus.select(
            F.col(id_col).cast("long").alias("nbr_id"),
            F.col(vec_col).alias("nbr_vec"),
            _norm(F.col(vec_col)).alias("nbr_norm"),
        )
        .join(corpus_cells.withColumnRenamed(id_col, "nbr_id"), "nbr_id")
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    qp = _probe_cells(queries, centers, nprobe, id_col, vec_col)
    q = q.join(qp.withColumnRenamed(id_col, "query_id"), "query_id")
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            F.round(
                _dot(F.col("q_vec"), F.col("nbr_vec"))
                / (F.col("q_norm") * F.col("nbr_norm")),
                6,
            ).alias("cosine"),
        )
        # NO distinct here: each corpus row has exactly one cell
        # (ivf_assign argmin) and a query's probe set holds each cell at
        # most once (slice of a per-center sorted array), so (query_id,
        # nbr_id) is already unique — unlike the LSH variant, where
        # multi-bucket collisions genuinely need dedup.  A distinct would
        # add a corpus-sized exchange for zero semantic effect.
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
