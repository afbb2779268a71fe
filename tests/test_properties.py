"""Property-based tests (hypothesis) over the hash kernels — SURVEY §5.2.

No Spark session needed: these pin the mathematical properties the engine's
correctness rests on (MinHash ≈ Jaccard concentration, winnowing guarantee,
hash family determinism/injectivity-in-practice).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from localitysensitivesketch_spark.config import SketchConfig
from localitysensitivesketch_spark.functions import hashing as H

CFG = SketchConfig()
SEEDS = H.minhash_seeds(CFG.n_hashes, CFG.seed)


@given(st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=200, deadline=None)
def test_splitmix64_matches_scalar_reference(x):
    """Vectorized kernel == scalar big-int arithmetic for any uint64."""
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4B7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    want = z ^ (z >> 31)
    got = int(H.splitmix64(np.array([x], dtype=np.uint64))[0])
    assert got == want


@given(st.lists(st.text(alphabet="ab ", min_size=1, max_size=40), min_size=1, max_size=10))
@settings(max_examples=50, deadline=None)
def test_token_hashes_deterministic(tokens):
    a = H.hash_tokens(tokens)
    b = H.hash_tokens(tokens, {})
    assert (a == b).all()


@given(
    st.integers(min_value=0, max_value=2**31),
    st.floats(min_value=0.0, max_value=0.5),
)
@settings(max_examples=25, deadline=None)
def test_minhash_estimates_jaccard(seed, edit_rate):
    """Fraction of agreeing MinHash slots concentrates around the true
    Jaccard of the two shingle sets (±0.2 at 128 hashes ≈ 4.5σ)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 1 << 63, size=300, dtype=np.uint64)
    n_swap = int(len(base) * edit_rate)
    other = base.copy()
    if n_swap:
        idx = rng.choice(len(base), size=n_swap, replace=False)
        other[idx] = rng.integers(0, 1 << 63, size=n_swap, dtype=np.uint64)
    s1, s2 = np.unique(base), np.unique(other)
    true_j = np.intersect1d(s1, s2).size / np.union1d(s1, s2).size
    sig1 = H.minhash_signature(s1, SEEDS)
    sig2 = H.minhash_signature(s2, SEEDS)
    est = (sig1 == sig2).mean()
    assert abs(est - true_j) <= 0.2


@given(
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=30, max_value=120),
)
@settings(max_examples=25, deadline=None)
def test_winnowing_guarantee(seed, run_len):
    """Two sequences sharing a verbatim run of ≥ L + w − 1 tokens share a
    winnowed fingerprint (the Schleimer et al. guarantee)."""
    L, w = 8, 4
    if run_len < L + w - 1:
        run_len = L + w - 1
    rng = np.random.default_rng(seed)
    run = rng.integers(0, 1 << 63, size=run_len, dtype=np.uint64)
    a = np.concatenate([
        rng.integers(0, 1 << 63, size=50, dtype=np.uint64), run,
        rng.integers(0, 1 << 63, size=50, dtype=np.uint64),
    ])
    b = np.concatenate([
        rng.integers(0, 1 << 63, size=20, dtype=np.uint64), run,
        rng.integers(0, 1 << 63, size=80, dtype=np.uint64),
    ])
    wa, wb = H.rolling_window_hashes(a, L), H.rolling_window_hashes(b, L)
    fa = set(wa[H.winnow(wa, w)].tolist())
    fb = set(wb[H.winnow(wb, w)].tolist())
    assert fa & fb


@given(st.integers(min_value=2, max_value=64), st.integers(min_value=0, max_value=2**31))
@settings(max_examples=30, deadline=None)
def test_rolling_hash_locality(L, seed):
    """Window hashes depend only on the window content: equal windows at
    different positions hash equal; a one-token change flips the hash."""
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 1 << 63, size=L * 3, dtype=np.uint64)
    dup = np.concatenate([t[:L], t, t[:L]])
    h = H.rolling_window_hashes(dup, L)
    assert h[0] == h[len(t) + L - (L - 1) + L - 1]  # same window content
    t2 = t.copy()
    t2[L // 2] ^= np.uint64(1)
    h1 = H.rolling_window_hashes(t[: L + 1], L)
    h2 = H.rolling_window_hashes(t2[: L + 1], L)
    assert h1[0] != h2[0]


def test_band_keys_agree_iff_band_equal():
    rng = np.random.default_rng(0)
    sig1 = rng.integers(0, 1 << 63, size=CFG.n_hashes, dtype=np.uint64)
    sig2 = sig1.copy()
    sig2[0] ^= np.uint64(1)  # corrupt one slot in band 0
    k1 = H.band_keys(sig1, CFG.bands, CFG.rows)
    k2 = H.band_keys(sig2, CFG.bands, CFG.rows)
    assert k1[0] != k2[0]
    assert (k1[1:] == k2[1:]).all()


@given(
    st.integers(min_value=1, max_value=10**6).map(lambda x: x / 10**6),
    st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=500, deadline=None)
def test_ceil_safe_never_overestimates_integral_products(t, n):
    """The prune bound ceil(t*n) must never exceed the TRUE ceiling
    (exact rational arithmetic) — overestimating loses boundary pairs;
    at most one below is allowed (loosens the bound, exact verify wins).
    Mirrors the Spark-side _ceil_safe (ceil of the 6-decimal round)."""
    import math
    from fractions import Fraction

    # t has ≤6 decimals by construction (the documented guarantee domain)
    true_ceil = -((-Fraction(round(t * 10**6)) * n) // 10**6)
    got = math.ceil(round(t * n, 6))
    assert got <= true_ceil
    assert got >= true_ceil - 1
    # and the bare-float version does violate this for some inputs —
    # the fix is load-bearing (regression canary: known-bad combo)
    assert math.ceil(0.07 * 100) == 8  # stays broken in raw float math
