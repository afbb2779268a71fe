"""Signature stage: documents → (MinHash, band keys, SimHash) per doc.

This is the engine's analogue of the reference's sketch-insert path
(``Sketching/LSSFingerprintAtomic.java:591-690``): key → fingerprint
(``GetItemInfoByte``, :382-409) → locality-sensitive placement.  Here the
fingerprints are a MinHash signature (seeded 64-bit family, the analogue of
the reference's per-cluster seeded xxHash64 family at :148-151), LSH band
keys (bucket position analogue, :628-636), and a 64-bit SimHash
(FingerLen-bit fingerprint analogue, :382-414).

All computation is Arrow-batched ``mapInPandas`` — numpy kernels, no
row-at-a-time Spark UDFs (input_hint).  The raw ``text`` column is read,
never rewritten.
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

SIGNATURE_SCHEMA = (
    "doc_id long, minhash array<long>, band_keys array<long>, "
    "simhash long, n_shingles int, n_tokens int"
)


def with_doc_id(df: DataFrame, url_col: str = "url") -> DataFrame:
    """doc_id = xxhash64(url) — JVM-side, codegen'd (SURVEY §1.2)."""
    return df.withColumn("doc_id", F.xxhash64(F.col(url_col)))


def _signature_batches(cfg_json: str):
    """Builds the mapInPandas function (config captured by value, not by
    driver-side global reference — re-pickled once per task, tiny)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg = SketchConfig.from_json(cfg_json)
        seeds = H.minhash_seeds(cfg.n_hashes, cfg.seed)
        token_cache: dict[str, int] = {}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            doc_ids = pdf["doc_id"].to_numpy()
            sigs = np.empty((n, cfg.n_hashes), dtype=np.uint64)
            simhashes = np.empty(n, dtype=np.uint64)
            n_shingles = np.empty(n, dtype=np.int32)
            n_tokens = np.empty(n, dtype=np.int32)
            texts = pdf["text"].tolist()
            for i in range(n):
                toks = tokenize(texts[i], cfg.normalization)
                th = H.hash_tokens(toks, token_cache)
                sh = H.shingle_hashes(th, cfg.shingle_k)
                sigs[i] = H.minhash_signature(sh, seeds)
                simhashes[i] = H.simhash64(th)
                n_shingles[i] = sh.size
                n_tokens[i] = len(toks)
            bkeys = H.band_keys_batch(sigs, cfg.bands, cfg.rows)
            sigs_i = H.u64_to_i64(sigs)
            bkeys_i = H.u64_to_i64(bkeys)
            if len(token_cache) > 1_000_000:
                token_cache.clear()
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "minhash": list(sigs_i),
                    "band_keys": list(bkeys_i),
                    "simhash": H.u64_to_i64(simhashes),
                    "n_shingles": n_shingles,
                    "n_tokens": n_tokens,
                }
            )

    return fn


def compute_signatures(
    documents: DataFrame,
    cfg: SketchConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents(id, text, ...) → signatures(doc_id, minhash, band_keys,
    simhash, n_shingles, n_tokens).

    Selects only (id, text) first so Catalyst prunes every other column at
    the parquet scan (ReadSchema contains just the two).  The pruned rows
    are then widened to the scheduler's parallelism when the scan is
    narrower (:func:`~..session.ensure_min_partitions`): the signature
    kernel is the single most expensive per-row pass in the engine, and a
    small-file scan would otherwise run it on one core.
    """
    from ..session import ensure_min_partitions

    pruned = documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    pruned = ensure_min_partitions(pruned)
    return pruned.mapInPandas(_signature_batches(cfg.to_json()), SIGNATURE_SCHEMA)


_SIGN = -(1 << 63)  # i64 sign bit: XOR with it makes signed order == u64 order


def merge_cluster_signatures(
    signatures: DataFrame,
    labels: DataFrame,
    cfg: SketchConfig,
) -> DataFrame:
    """Cluster-level MinHash signatures by elementwise-min merge.

    MinHash is mergeable exactly like the theta sketches in
    ``operators.sketchstate``: ``sig(A ∪ B) = elementwise_min(sig(A),
    sig(B))`` over the shingle-set union, bit-for-bit — so a whole
    near-dup cluster gets ONE signature without ever re-shingling text
    (the W7 clone/merge analogue, ``LSSFingerprintAtomic.java`` sketch
    instance merging; verified against the independent pure-python shadow
    ``oracle.oracle_minhash`` on the unioned shingle sets).

    Plan shape for 10^12 docs: ``posexplode`` the signature slots and
    hash-aggregate min per (cluster, slot) — Spark's partial aggregation
    shrinks each map partition's contribution to (clusters × n_hashes)
    rows BEFORE the shuffle, so the exchange carries cluster-count-sized
    data, not doc-count-sized.  The stored slots are u64 values
    reinterpreted as i64 (``hashing.u64_to_i64``), so the min must use
    UNSIGNED order: XOR with the sign bit, min, XOR back.

    Band keys for the merged signatures are recomputed with the same
    numpy kernel (``hashing.band_keys_batch``) in one Arrow pass over the
    cluster-count-sized table, so cluster signatures join the very same
    LSH machinery doc signatures use.
    """
    member_sigs = signatures.join(labels, "doc_id").localCheckpoint(
        eager=False
    )  # two consumers: slot explode + membership count
    slots = member_sigs.select(
        "cluster_id", F.posexplode("minhash").alias("pos", "v")
    )
    mins = (
        slots.withColumn("u", F.col("v").bitwiseXOR(F.lit(_SIGN)))
        .groupBy("cluster_id", "pos")
        .agg(F.min("u").alias("u"))
        .withColumn("v", F.col("u").bitwiseXOR(F.lit(_SIGN)))
    )
    merged = mins.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda s: s["v"],
        ).alias("minhash"),
    )
    # n_docs counts the members whose shingles the merged signature
    # actually covers (the signatures ⋈ labels rows) — counting the full
    # labels table would overstate membership whenever a member lacks a
    # signature row (e.g. filtered upstream as n_shingles == 0), and a
    # cluster with NO signature-bearing members is absent from the output
    # by the same rule (there is nothing its signature could summarize).
    sizes = member_sigs.groupBy("cluster_id").agg(F.count("*").alias("n_docs"))

    def _band_batches(cfg_json: str):
        def fn(batches):
            import numpy as _np
            import pandas as _pd

            from ..functions import hashing as _H

            c = SketchConfig.from_json(cfg_json)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sigs = _np.array(
                    [_np.array(s, dtype=_np.int64) for s in pdf["minhash"]]
                ).astype(_np.uint64)
                bk = _H.u64_to_i64(_H.band_keys_batch(sigs, c.bands, c.rows))
                yield _pd.DataFrame(
                    {
                        "cluster_id": pdf["cluster_id"],
                        "minhash": pdf["minhash"],
                        "band_keys": list(bk),
                    }
                )

        return fn

    with_bands = merged.mapInPandas(
        _band_batches(cfg.to_json()),
        "cluster_id long, minhash array<long>, band_keys array<long>",
    )
    return with_bands.join(sizes, "cluster_id")


def cluster_merge_candidates(
    cluster_signatures: DataFrame, cfg: SketchConfig
) -> tuple[DataFrame, DataFrame]:
    """Cluster pairs whose shingle-set UNIONS look near-duplicate — the
    cross-shard / cross-snapshot merge detector.  Clusters built
    independently (per shard, per streaming window) that are really one
    near-dup family collide here in one LSH pass over cluster-count rows;
    re-comparing members would be quadratic in docs.  Same salted/capped
    band machinery as doc-level candidates."""
    from .candidates import pairs_by_key

    keyed = cluster_signatures.select(
        F.col("cluster_id").alias("doc_id"), F.explode("band_keys").alias("key")
    )
    pairs, metrics = pairs_by_key(keyed, cfg)
    return (
        pairs.select(
            F.col("id1").alias("cluster_1"), F.col("id2").alias("cluster_2")
        ),
        metrics,
    )


def cluster_merge_scores(
    cluster_signatures: DataFrame,
    cfg: SketchConfig,
    estimator: str = "slots",
) -> DataFrame:
    """Scored cluster-merge detection: candidate cluster pairs from the
    band join, each scored with the estimated Jaccard of the two clusters'
    shingle-set UNIONS — computed from the merged signatures alone.
    Because ``merge_cluster_signatures`` produces a TRUE MinHash of the
    union (not an approximation of one), the doc-level estimator suite
    (``analytics.minhash_estimate_for_pairs``, the reference's
    queryV0/V2/V3 strategies) applies verbatim.  Callers merge clusters
    whose score clears their threshold, or route the pair to an exact
    member-level verify first."""
    from .analytics import minhash_estimate_for_pairs

    pairs, _ = cluster_merge_candidates(cluster_signatures, cfg)
    est = minhash_estimate_for_pairs(
        pairs.select(
            F.col("cluster_1").alias("id1"), F.col("cluster_2").alias("id2")
        ),
        cluster_signatures.select(
            F.col("cluster_id").alias("doc_id"), "minhash", "band_keys"
        ),
        estimator=estimator,
    )
    return est.select(
        F.col("id1").alias("cluster_1"),
        F.col("id2").alias("cluster_2"),
        "est_jaccard",
    )
