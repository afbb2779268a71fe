"""Cluster-level MinHash signature merge (signatures.merge_cluster_signatures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from localitysensitivesketch_spark import oracle as O
from localitysensitivesketch_spark.config import SketchConfig
from localitysensitivesketch_spark.operators.signatures import (
    cluster_merge_candidates,
    compute_signatures,
    merge_cluster_signatures,
)

CFG = SketchConfig()


def _u64(v: int) -> int:
    return v % (1 << 64)


def test_merged_signature_matches_union_shadow_oracle(spark):
    # 3 clusters x 3 docs; production merge must equal the independent
    # pure-python minhash of the UNIONED shingle sets, bit-for-bit —
    # including slots above 2^63 (signed min would pick the wrong value).
    texts = {
        i: " ".join(f"tok{(i * 7 + j * 13) % 60}" for j in range(40))
        for i in range(9)
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(9)], "doc_id long, cluster_id long"
    )
    sigs = compute_signatures(docs, CFG)
    merged = merge_cluster_signatures(sigs, labels, CFG)
    got = {
        r["cluster_id"]: (list(r["minhash"]), list(r["band_keys"]), r["n_docs"])
        for r in merged.collect()
    }
    assert set(got) == {0, 1, 2}
    for c in range(3):
        union = set()
        for i in range(3 * c, 3 * c + 3):
            union |= O.oracle_shingles(texts[i], CFG)
        want_sig = O.oracle_minhash(union, CFG)
        want_keys = O.oracle_band_keys(want_sig, CFG)
        sig, keys, n = got[c]
        assert [_u64(v) for v in sig] == want_sig
        assert [_u64(v) for v in keys] == want_keys
        assert n == 3
    # note: the oracle equality above IS the unsigned-order proof — with
    # ~100 shingles per union every slot's candidate pool contains values
    # ≥ 2^63 (negative as i64), and a signed min would have picked those
    # instead of the true u64 minimum, mismatching the oracle.


def test_cluster_merge_candidates_detects_split_family(spark):
    # family A split across two "shards" as clusters 0 and 1 (near-identical
    # text), cluster 2 unrelated — the detector must pair (0, 1) only.
    base = " ".join(f"w{i}" for i in range(60))
    rows = [
        (0, base), (1, base + " extraA"),          # cluster 0
        (2, base + " extraB"), (3, base),           # cluster 1 (same family)
        (4, " ".join(f"z{i}" for i in range(60))),  # cluster 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2)], "doc_id long, cluster_id long"
    )
    sigs = compute_signatures(docs, CFG)
    merged = merge_cluster_signatures(sigs, labels, CFG)
    pairs, _ = cluster_merge_candidates(merged, CFG)
    got = {(r["cluster_1"], r["cluster_2"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert not any(2 in p for p in got)


def test_merge_partial_aggregation_in_plan(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    labels = spark.createDataFrame([(1, 1)], "doc_id long, cluster_id long")
    merged = merge_cluster_signatures(compute_signatures(docs, CFG), labels, CFG)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    # min per (cluster, pos) must partial-aggregate map-side (partial_min)
    assert "partial_min" in plan


def test_cluster_merge_scores_match_shadow_slot_agreement(spark):
    from localitysensitivesketch_spark.operators.signatures import (
        cluster_merge_scores,
    )

    base = " ".join(f"w{i}" for i in range(60))
    rows = [
        (0, base), (1, base + " extraA"),
        (2, base + " extraB"), (3, base),
        (4, " ".join(f"z{i}" for i in range(60))),
    ]
    texts = dict(rows)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2)], "doc_id long, cluster_id long"
    )
    merged = merge_cluster_signatures(
        compute_signatures(docs, CFG), labels, CFG
    )
    got = {
        (r["cluster_1"], r["cluster_2"]): r["est_jaccard"]
        for r in cluster_merge_scores(merged, CFG).collect()
    }
    assert (0, 1) in got and got[(0, 1)] > 0.6
    # the estimate must equal the slot-agreement of the shadow-oracle
    # merged signatures exactly (sig(union) is a true MinHash)
    members = {0: (0, 1), 1: (2, 3), 2: (4,)}
    shadow = {}
    for c, ms in members.items():
        union = set()
        for m in ms:
            union |= O.oracle_shingles(texts[m], CFG)
        shadow[c] = O.oracle_minhash(union, CFG)
    for (a, b), est in got.items():
        agree = sum(x == y for x, y in zip(shadow[a], shadow[b]))
        assert est == agree / CFG.n_hashes, (a, b)
