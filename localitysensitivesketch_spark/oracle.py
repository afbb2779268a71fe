"""Pure-Python scalar oracle — the exact "shadow map" of this engine.

The reference keeps an exact per-key shadow map next to the approximate
sketch and validates every query against it online
(``Sketching/LSSFingerprintAtomic.java:77,317-360``;
``Query/QueryLSSFingerFlowApps.java:196-252``).  This module is our shadow:
a deliberately simple, loop-based, plain-int implementation of the pinned
signature spec plus an O(n²) exact-Jaccard oracle.  Tests assert the
vectorized Spark path matches this bit-for-bit (FIXTURES.md §3).

No numpy in the signature math here — independence from the production
kernels is the point.
"""

from __future__ import annotations

import hashlib

from .config import SketchConfig
from .functions.text import tokenize

_M64 = (1 << 64) - 1
_SM_GAMMA = 0x9E3779B97F4B7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB
_POLY = ((0x100000001B3 * 0x1000193) | 1) & _M64


def _splitmix64(x: int) -> int:
    z = (x + _SM_GAMMA) & _M64
    z = ((z ^ (z >> 30)) * _SM_M1) & _M64
    z = ((z ^ (z >> 27)) * _SM_M2) & _M64
    return z ^ (z >> 31)


def _token_hash(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
    )


def oracle_shingles(text: str, cfg: SketchConfig) -> set[int]:
    toks = tokenize(text, cfg.normalization)
    th = [_token_hash(t) for t in toks]
    k = cfg.shingle_k
    out: set[int] = set()
    if 0 < len(th) < k:
        h = th[0]
        for j in range(1, len(th)):
            h = (h * _POLY + th[j]) & _M64
        out.add(_splitmix64(h))
        return out
    for i in range(len(th) - k + 1):
        h = th[i]
        for j in range(1, k):
            h = (h * _POLY + th[i + j]) & _M64
        out.add(_splitmix64(h))
    return out


def oracle_seeds(cfg: SketchConfig) -> list[int]:
    return [
        _splitmix64((i + cfg.seed * _SM_GAMMA) & _M64) for i in range(cfg.n_hashes)
    ]


def oracle_minhash(shingles: set[int], cfg: SketchConfig) -> list[int]:
    seeds = oracle_seeds(cfg)
    if not shingles:
        return [_M64] * cfg.n_hashes
    return [min(_splitmix64(s ^ seed) for s in shingles) for seed in seeds]


def oracle_band_keys(sig: list[int], cfg: SketchConfig) -> list[int]:
    keys = []
    for b in range(cfg.bands):
        h = _splitmix64((b + 0xB0A11D) & _M64)
        for j in range(cfg.rows):
            h = _splitmix64(h ^ sig[b * cfg.rows + j])
        keys.append(h)
    return keys


def oracle_simhash(text: str, cfg: SketchConfig) -> int:
    toks = tokenize(text, cfg.normalization)
    counts: dict[int, int] = {}
    for t in toks:
        h = _token_hash(t)
        counts[h] = counts.get(h, 0) + 1
    if not counts:
        return 0
    sums = [0] * 64
    for h, w in counts.items():
        for b in range(64):
            sums[b] += w if (h >> b) & 1 else -w
    out = 0
    for b in range(64):
        if sums[b] > 0:
            out |= 1 << b
    return out


def exact_jaccard(text1: str, text2: str, cfg: SketchConfig) -> float:
    s1, s2 = oracle_shingles(text1, cfg), oracle_shingles(text2, cfg)
    if not s1 and not s2:
        return 1.0
    u = len(s1 | s2)
    return len(s1 & s2) / u if u else 0.0


def oracle_truth_pairs(
    docs: list[tuple[int, str]], cfg: SketchConfig, threshold: float | None = None
) -> list[tuple[int, int, float]]:
    """O(n²) exact-Jaccard over all pairs (id asc); sf-small only."""
    thr = cfg.jaccard_threshold if threshold is None else threshold
    sh = [(i, oracle_shingles(t, cfg)) for i, t in docs]
    out = []
    for a in range(len(sh)):
        ia, sa = sh[a]
        for b in range(a + 1, len(sh)):
            ib, sb = sh[b]
            if not sa and not sb:
                j = 1.0
            else:
                u = len(sa | sb)
                j = len(sa & sb) / u if u else 0.0
            if j >= thr:
                i1, i2 = (ia, ib) if ia < ib else (ib, ia)
                out.append((i1, i2, j))
    return out


def oracle_kmeans_1d(
    values: list[float], k: int = 8, n_iter: int = 20
) -> list[float]:
    """Loop-based plain-python shadow of ``valuecluster.kmeans_pp_1d``:
    quantile seeding (center j = the (2j+1)/2k-quantile element; duplicate
    picks topped up by greedy max-D², first index on ties) + Lloyd with
    ``math.fsum`` means.  fsum is exactly rounded, so these centers are
    bit-identical to the numpy trainer's — no shared code, no numpy, no
    RNG."""
    import math

    vals = [float(v) for v in values]
    if not vals:
        return [0.0] * k
    n = len(vals)
    k = min(k, len(set(vals)))
    centers: list[float] = []
    for j in range(k):
        c0 = vals[min(n - 1, ((2 * j + 1) * n) // (2 * k))]
        if c0 not in centers:
            centers.append(c0)
    while len(centers) < k:
        bi, bd = 0, -1.0
        for i, v in enumerate(vals):
            d = min((v - c) ** 2 for c in centers)
            if d > bd:
                bd, bi = d, i
        centers.append(vals[bi])
    for _ in range(n_iter):
        groups: list[list[float]] = [[] for _ in range(k)]
        for v in vals:
            bj, bd = 0, abs(v - centers[0])
            for j in range(1, k):
                dv = abs(v - centers[j])
                if dv < bd:
                    bd, bj = dv, j
            groups[bj].append(v)
        for j in range(k):
            if groups[j]:
                centers[j] = math.fsum(groups[j]) / len(groups[j])
    return sorted(centers)


def oracle_hyperplane_entry(idx: int, seed: int) -> float:
    """Entry ``idx`` (row-major ``i*n_bits + j``) of the deterministic
    hyperplane matrix: Box-Muller over two splitmix64 uniforms.  The pinned
    spec shared (as a SPEC, not as code) with
    ``similarity``'s plane construction — both sides call CPython's
    ``math`` on identical doubles, so entries are bit-identical."""
    import math

    h1 = _splitmix64((2 * idx + seed * _SM_GAMMA) & _M64)
    h2 = _splitmix64((2 * idx + 1 + seed * _SM_GAMMA) & _M64)
    u1 = (h1 >> 11) * 2.0**-53  # [0, 1)
    u2 = (h2 >> 11) * 2.0**-53
    return math.sqrt(-2.0 * math.log(1.0 - u1)) * math.cos(2.0 * math.pi * u2)


def oracle_hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    """dim×n_bits deterministic hyperplane matrix (see
    :func:`oracle_hyperplane_entry`)."""
    return [
        [oracle_hyperplane_entry(i * n_bits + j, seed) for j in range(n_bits)]
        for i in range(dim)
    ]


def oracle_hyperplane_bucket(vec: list[float], planes: list[list[float]]) -> int:
    """Sign-bit bucket of ``vec`` under ``planes`` — sequential fold dot
    products, pure python."""
    n_bits = len(planes[0]) if planes else 0
    out = 0
    for j in range(n_bits):
        acc = 0.0
        for i, x in enumerate(vec):
            acc += x * planes[i][j]
        if acc > 0:
            out |= 1 << j
    return out


def oracle_clusters(
    doc_ids: list[int], pairs: list[tuple[int, int]]
) -> dict[int, int]:
    """Union-find connected components; label = min doc_id of component."""
    parent = {d: d for d in doc_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {d: find(d) for d in doc_ids}


def oracle_ivf_centers(
    points: list[tuple[int, list[float]]],
    n_cells: int = 8,
    n_iter: int = 5,
) -> list[list[float]]:
    """Loop-based plain-python shadow of ``ivf.ivf_train`` (the SPEC, not
    the code): quantile seeding on the (norm, id)-sorted sample, greedy
    max-D² top-up for duplicate picks, Lloyd with low-index tie-break and
    exactly-rounded ``math.fsum`` coordinate means.  fsum makes the means
    independent of summation order, and distances fold sequentially in
    coordinate order on both sides, so these centroids are bit-identical
    to the production trainer's without sharing a line of code."""
    import math

    def sq(a: list[float], b: list[float]) -> float:
        s = 0.0
        for i in range(len(a)):
            t = a[i] - b[i]
            s = s + t * t
        return s

    if not points:
        raise ValueError("empty sample")
    by_norm = sorted(
        points,
        key=lambda p: (math.sqrt(sum_fold(p[1], p[1])), p[0]),
    )
    n = len(points)
    k = min(n_cells, n)
    centers: list[list[float]] = []
    for j in range(k):
        pick = by_norm[min(n - 1, ((2 * j + 1) * n) // (2 * k))][1]
        if pick not in centers:
            centers.append(list(pick))
    while len(centers) < k:
        far_i, far_d = 0, -1.0
        for i, (_, v) in enumerate(points):
            d = min(sq(v, c) for c in centers)
            if d > far_d:
                far_d, far_i = d, i
        centers.append(list(points[far_i][1]))
    dim = len(centers[0])
    for _ in range(n_iter):
        cells: list[list[list[float]]] = [[] for _ in range(k)]
        for _, v in points:
            best, bd = 0, sq(v, centers[0])
            for j in range(1, k):
                d = sq(v, centers[j])
                if d < bd:
                    bd, best = d, j
            cells[best].append(v)
        for j in range(k):
            if cells[j]:
                centers[j] = [
                    math.fsum(v[c] for v in cells[j]) / len(cells[j])
                    for c in range(dim)
                ]
    return centers


def sum_fold(a: list[float], b: list[float]) -> float:
    """Sequential left-fold dot product (JVM ``aggregate`` order)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc
