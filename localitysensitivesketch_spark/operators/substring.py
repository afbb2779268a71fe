"""Exact long-substring duplicate detection (the "suffix-array pass").

North_rule requires a pass catching pairs sharing a verbatim token run of
≥ ``cfg.sa_min_len`` even when whole-document similarity is low (quoted
blocks, boilerplate, syndicated articles).  The reference has no analogue
(SURVEY §2.9) — its closest machinery is the fingerprint layer
(``Sketching/LSSFingerprintAtomic.java:382-414``).

Design — winnowing (Schleimer, Wilkerson, Aiken: "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003) instead of a
per-group suffix array, because it distributes:

1. per doc: rolling polynomial hashes of every L-token window (O(n),
   vectorized), then winnow with window ``w`` — selecting local-minimum
   fingerprints.  **Guarantee**: a shared verbatim run of ≥ L + w − 1
   tokens ⇒ ≥ 1 shared (hash) fingerprint.  With L = sa_min_len − w + 1
   every run of ≥ sa_min_len tokens is caught.
2. explode (doc_id, pos, fp) → equi-join on fp (the same salted/capped
   band-join machinery as MinHash candidates — one code path for skew).
3. per candidate pair: aligned matches lie on a diagonal (pos1 − pos2
   constant); the max aligned extent estimates the shared-run length.

A suffix array over each duplicate cluster would answer "longest common
substring" exactly but requires co-locating whole clusters; winnowing keeps
stage 1 embarrassingly parallel and stage 2 a plain shuffle join — the
100 TB-safe shape.  Density: one fingerprint per ~w/2 windows ⇒ ~2·n/w
rows per doc, tunable via ``w``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SketchConfig
from ..functions import hashing as H
from ..functions.text import tokenize
from .candidates import HOT_THRESHOLD, pairs_by_key

FINGERPRINT_SCHEMA = "doc_id long, pos int, fp long"

WINNOW_W = 64  # max winnowing window (w); L = sa_min_len - w + 1


def _winnow_params(sa_min_len: int) -> tuple[int, int]:
    """(L, w) with L + w − 1 = sa_min_len and L ≥ 2 — adaptive so small
    ``sa_min_len`` configs stay valid (w shrinks, fingerprint density
    rises)."""
    w = min(WINNOW_W, max(2, sa_min_len // 4))
    L = max(sa_min_len - w + 1, 2)
    return L, w


def _fingerprint_fn(cfg_json: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg = SketchConfig.from_json(cfg_json)
        L, w = _winnow_params(cfg.sa_min_len)
        cache: dict[str, int] = {}
        for pdf in batches:
            ids, poss, fps = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = tokenize(text, cfg.normalization)
                th = H.hash_tokens(toks, cache)
                wh = H.rolling_window_hashes(th, L)
                sel = H.winnow(wh, w)
                if sel.size == 0:
                    continue
                ids.append(np.full(sel.size, doc_id, dtype=np.int64))
                poss.append(sel.astype(np.int32))
                fps.append(H.u64_to_i64(wh[sel]))
            if len(cache) > 1_000_000:
                cache.clear()
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "fp": np.concatenate(fps),
                }
            )

    return fn


def substring_fingerprints(
    documents: DataFrame,
    cfg: SketchConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents → (doc_id, pos, fp) winnowed window fingerprints."""
    pruned = documents.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return pruned.mapInPandas(_fingerprint_fn(cfg.to_json()), FINGERPRINT_SCHEMA)


def substring_pairs(
    documents: DataFrame,
    cfg: SketchConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Pairs sharing ≥1 winnowed fingerprint, with an aligned-extent
    estimate of the shared run (``overlap_est`` in tokens, ≥ L means a
    genuine ≥L-token verbatim block given 64-bit collision odds).

    Returns (pairs, skew_metrics).  pairs: id1 < id2, n_shared_fps,
    overlap_est.
    """
    L, _ = _winnow_params(cfg.sa_min_len)
    fps = substring_fingerprints(documents, cfg, id_col, text_col)

    # same salted/capped machinery as the band join — reuse via pairs_by_key
    # on the fp key, but keep positions: join fingerprints directly.
    keyed = fps.select("doc_id", F.col("fp").alias("key"))
    _, metrics = pairs_by_key(keyed, cfg)  # metrics only (width classes)

    widths = fps.groupBy("fp").agg(F.count("*").alias("width"))
    dropped = widths.filter(F.col("width") > cfg.band_width_cap)
    hot = widths.filter(
        (F.col("width") > HOT_THRESHOLD) & (F.col("width") <= cfg.band_width_cap)
    )
    ok = fps.join(F.broadcast(dropped.select("fp")), "fp", "left_anti")
    normal = ok.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    hot_rows = ok.join(F.broadcast(hot.select("fp")), "fp", "left_semi")

    a = normal.select(
        F.col("fp"), F.col("doc_id").alias("id1"), F.col("pos").alias("pos1")
    )
    b = normal.select(
        F.col("fp"), F.col("doc_id").alias("id2"), F.col("pos").alias("pos2")
    )
    matches_normal = (
        a.join(b, "fp")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "pos1", "pos2")
    )
    # buckets in (HOT_THRESHOLD, cap] take the position-preserving version
    # of the salted scheme from pairs_by_key: one boilerplate fingerprint of
    # width ~5000 would otherwise produce its ~12.5M pair rows in a single
    # skewed task — salting the left side by doc hash and replicating the
    # right to every salt spreads that across salt_factor partitions while
    # still producing every unordered pair exactly once.
    s = cfg.salt_factor
    hl = hot_rows.select(
        F.col("fp"), F.col("doc_id").alias("id1"), F.col("pos").alias("pos1"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(s)).cast("int").alias("salt"),
    )
    hr = hot_rows.select(
        F.col("fp"), F.col("doc_id").alias("id2"), F.col("pos").alias("pos2"),
        F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("salt"),
    )
    matches_hot = (
        hl.join(hr, ["fp", "salt"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "pos1", "pos2")
    )
    matches = matches_normal.unionByName(matches_hot).select(
        "id1", "id2", "pos1", "pos2", (F.col("pos1") - F.col("pos2")).alias("diag")
    )
    pairs = (
        matches.groupBy("id1", "id2", "diag")
        .agg(
            F.count("*").alias("n_on_diag"),
            (F.max("pos1") - F.min("pos1")).alias("extent"),
        )
        .groupBy("id1", "id2")
        .agg(
            F.sum("n_on_diag").cast("long").alias("n_shared_fps"),
            (F.max("extent") + F.lit(L)).cast("long").alias("overlap_est"),
        )
    )
    return pairs, metrics


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array over an integer sequence (prefix-doubling, O(n log² n),
    pure numpy — no external SA library in this environment).  Returned
    order: indices of suffixes in lexicographic order."""
    n = len(seq)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(seq, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        if k < n:
            second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        pair = np.stack([rank[order], second[order]], axis=1)
        new_rank = np.empty(n, dtype=np.int64)
        changed = np.any(pair[1:] != pair[:-1], axis=1)
        new_rank[order] = np.concatenate([[0], np.cumsum(changed)])
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def longest_common_run(t1: np.ndarray, t2: np.ndarray) -> int:
    """Exact longest common substring (in tokens) of two hashed token
    sequences, via the generalized-suffix-array + LCP walk: concatenate
    with a unique separator, build the SA, scan adjacent suffixes from
    different documents.  O((n1+n2) log²) — the per-pair refinement of the
    winnowing detector's lower bound."""
    n1 = len(t1)
    if n1 == 0 or len(t2) == 0:
        return 0
    sep = np.uint64(0xFFFFFFFFFFFFFFFF)  # never produced by splitmix input
    seq = np.concatenate([t1, [sep], t2])
    sa = suffix_array(seq)
    # LCP of adjacent SA entries via Kasai
    n = len(seq)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    best = 0
    h = 0
    for i in range(n):
        r = rank[i]
        if r == 0:
            h = 0
            continue
        j = sa[r - 1]
        while i + h < n and j + h < n and seq[i + h] == seq[j + h]:
            h += 1
        # adjacent suffixes from different sides of the separator
        if (i < n1) != (j < n1):
            best = max(best, h)
        if h:
            h -= 1
    return best


_REFINE_SCHEMA = "id1 long, id2 long, overlap_exact long"


def refine_overlap_exact(
    pairs: DataFrame,
    documents: DataFrame,
    cfg: SketchConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SURVEY §7.8's per-cluster suffix-array pass: for each detected pair,
    the EXACT longest shared token run via a generalized suffix array
    (Arrow-batched; texts attached like the verify stage)."""
    d1 = documents.select(
        F.col(id_col).cast("long").alias("id1"), F.col(text_col).alias("text1")
    )
    d2 = documents.select(
        F.col(id_col).cast("long").alias("id2"), F.col(text_col).alias("text2")
    )
    attached = pairs.select("id1", "id2").join(d1, "id1").join(d2, "id2")

    cfg_json = cfg.to_json()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = SketchConfig.from_json(cfg_json)
        cache: dict[str, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out = np.empty(len(pdf), dtype=np.int64)
            for i, (x1, x2) in enumerate(zip(pdf["text1"], pdf["text2"])):
                h1 = H.hash_tokens(tokenize(x1, c.normalization), cache)
                h2 = H.hash_tokens(tokenize(x2, c.normalization), cache)
                out[i] = longest_common_run(h1, h2)
            yield pd.DataFrame(
                {
                    "id1": pdf["id1"].to_numpy(),
                    "id2": pdf["id2"].to_numpy(),
                    "overlap_exact": out,
                }
            )

    return attached.mapInPandas(fn, _REFINE_SCHEMA)


def substring_duplicates(
    documents: DataFrame,
    cfg: SketchConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs sharing a verbatim token run.

    Any shared fingerprint already proves a shared L-token window
    (L = sa_min_len − w + 1; 64-bit hash, collision ≈ 2⁻⁶⁴), so every pair
    returned shares ≥ L verbatim tokens; recall is guaranteed for runs
    ≥ sa_min_len (= L + w − 1, the winnowing bound).  ``overlap_est`` is a
    lower bound on the true shared-run length.
    """
    pairs, _ = substring_pairs(documents, cfg, id_col, text_col)
    return pairs.select("id1", "id2", "n_shared_fps", "overlap_est")
