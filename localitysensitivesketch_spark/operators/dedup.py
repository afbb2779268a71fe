"""Deduplication front door: every dedup flavor as one operator each.

The engine's reason to exist (BASELINE.json north_rule).  Four tiers, in
increasing cost — a 100 TB pipeline runs them in this order so each tier
shrinks the input of the next:

1. **exact** — fingerprint groupBy (``LSSFingerprintAtomic.java:382-414``
   fingerprint-compression analogue): one shuffle on a 16-byte key.
2. **n-gram Jaccard within blocks** — token-set overlap on a cheap blocking
   key; JVM-side array ops, SQL-expressible (oracle-checkable).
3. **MinHash + LSH banding** — the signature pipeline (signatures →
   salted band join → exact verify), sub-quadratic at corpus scale.
4. **SimHash Hamming-ball** — bit-vector near-fingerprint candidates.

Tiers 3-4 reuse the staged operators (signatures/candidates/verify/cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SketchConfig
from .candidates import band_candidates, pairs_by_key, simhash_candidates
from .cluster import connected_components
from .signatures import compute_signatures
from .verify import duplicate_edges, verify_pairs


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per duplicated text
    (group size ≥ 2) with the canonical (min) doc id.  At 100 TB this is a
    single hash-partitioned aggregation on md5 — no pairwise work at all."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("group_size") >= 2)
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one doc (min id) per distinct text — the classic
    training-data exact-dedup pass.  Aggregate-then-semi-join: the wide doc
    payload is never shuffled, only (id, md5)."""
    keep = (
        df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return df.join(keep, on=df[id_col] == keep["doc_id"], how="left_semi")


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: SketchConfig | None = None,
) -> DataFrame:
    """Token-set (1-gram) Jaccard pairs via an EXACT prefix-filter
    set-similarity join (AllPairs, Bayardo/Ma/Srikant WWW'07).

    Candidate generation: order tokens by global document frequency
    (rarest first); each doc exposes only its prefix of length
    ``|A| - ceil(t*|A|) + 1``.  Prefix-filter lemma: J(A,B) >= t implies
    the two prefixes share a token -- so joining on prefix tokens has
    **recall 1.0** (unlike MinHash banding) while the join fans out on rare
    tokens instead of the quadratic-in-block self-join.  Candidates then
    get the size-ratio prune (J <= min/max of set sizes) and the exact
    ``array_intersect/array_union`` Jaccard -- still SQL-oracle-checkable.

    ``block_cols`` optionally restricts pairs to equal block values (the
    join key becomes (block, token)); with the default ``None`` the join is
    global -- the scale-safe default, since prefix tokens are
    high-cardinality keys.  Hot prefix tokens go through the same
    salted/width-capped machinery as LSH bands (``pairs_by_key``), so a
    boilerplate token cannot go quadratic silently (drops are logged in
    the skew metrics; cap semantics match the rest of the engine).
    """
    cfg = cfg or SketchConfig()
    t = float(threshold)
    blk = (
        F.concat_ws("\x1f", *[F.col(c) for c in block_cols])
        if block_cols
        else F.lit("")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        blk.alias("blk"),
        F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "toks"
        ),
    ).withColumn("n", F.size("toks"))

    tok = base.select("doc_id", "blk", "n", F.explode("toks").alias("tok"))
    # global token document-frequency; the ordering only shapes performance
    # (rarest-first minimizes bucket widths), never correctness
    tok_df = tok.groupBy("tok").agg(F.count("*").alias("tok_df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tok_df").asc(), F.col("tok").asc()
    )
    prefix = (
        tok.join(tok_df, "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1)
    )
    keyed = prefix.select(
        "doc_id", F.xxhash64(F.col("blk"), F.col("tok")).alias("key")
    )
    pairs, _ = pairs_by_key(keyed, cfg)

    a = base.select(
        F.col("doc_id").alias("id1"), F.col("toks").alias("t1"),
        F.col("n").alias("n1"),
    )
    b = base.select(
        F.col("doc_id").alias("id2"), F.col("toks").alias("t2"),
        F.col("n").alias("n2"),
    )
    return (
        pairs.join(a, "id1")
        .join(b, "id2")
        # size-ratio prune: the expensive array_intersect runs only on pairs
        # that can still reach the threshold
        .where((F.col("n1") >= F.col("n2") * t) & (F.col("n2") >= F.col("n1") * t))
        .select(
            "id1",
            "id2",
            F.round(
                F.size(F.array_intersect("t1", "t2"))
                / F.size(F.array_union("t1", "t2")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    documents: DataFrame,
    cfg: SketchConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Full MinHash+LSH pipeline over any documents table → dict of every
    stage output (signatures, candidates, skew metrics, verified, edges,
    clusters, cluster stats).  This is the engine spine (SURVEY §3.4)."""
    cfg = cfg or SketchConfig()
    sigs = compute_signatures(documents, cfg, id_col=id_col, text_col=text_col)
    sigs = sigs.localCheckpoint(eager=False)
    candidates, skew_metrics = band_candidates(sigs, cfg)
    verified = verify_pairs(
        candidates, documents, cfg, id_col=id_col, text_col=text_col,
        signatures=sigs, min_jaccard=cfg.jaccard_threshold,
    )
    edges = duplicate_edges(verified, cfg)
    vertices = documents.select(F.col(id_col).cast("long").alias("doc_id"))
    clusters = connected_components(vertices, edges)
    stats = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("size"), F.min("doc_id").alias("canonical_doc_id")
    )
    return {
        "signatures": sigs,
        "candidates": candidates,
        "skew_metrics": skew_metrics,
        "verified": verified,
        "edges": edges,
        "clusters": clusters,
        "cluster_stats": stats,
    }


def simhash_dedup_pairs(
    documents: DataFrame,
    cfg: SketchConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-fingerprint pairs (Hamming ≤ radius) over any documents
    table — the bit-vector tier (``LSSFingerprintAtomic.java:382-414``
    FingerLen-fingerprint analogue, widened to 64 bits)."""
    cfg = cfg or SketchConfig()
    sigs = compute_signatures(documents, cfg, id_col=id_col, text_col=text_col)
    pairs, _ = simhash_candidates(sigs, cfg)
    return pairs
