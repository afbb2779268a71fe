"""Instrumented sub-step walls for containment_pairs (t=1.0 path).

Mirrors the PRODUCTION phases of operators/dedup.py::containment_pairs at
HEAD (hashed token stream as the only shared intermediate, df-cutoff
map-side prune with exact per-doc fallback, bloom index prefilter,
count(*) k-probe filter, re-tokenized verify sides), materializing each
intermediate so the phases separate.  Throwaway tuning tool for the 8v32
saturation analysis; the production operator stays the source of truth.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import build_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--probe-k", type=int, default=3)
    ap.add_argument("--no-cutoff", action="store_true")
    ap.add_argument("--no-tok-checkpoint", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from localitysensitivesketch_spark.config import SketchConfig
    from localitysensitivesketch_spark.functions.bloom import (
        bloom_build,
        bloom_supported,
        might_contain,
    )
    from localitysensitivesketch_spark.operators.candidates import probe_index_pairs
    from localitysensitivesketch_spark.operators.dedup import (
        VOCAB_BROADCAST_MAX_ROWS,
        _ceil_safe,
    )
    from localitysensitivesketch_spark.session import get_spark

    cfg = SketchConfig()
    k = args.probe_k
    t = 1.0
    data = build_corpus(args.docs)
    spark = get_spark(
        app_name="containment-steps",
        master=f"local[{args.cpus}]",
        shuffle_partitions=256,
    )
    df = spark.read.parquet(data).drop("kind")
    walls: dict[str, float] = {}
    counts: dict[str, int] = {}

    t0 = time.time()
    base = (
        df.select(
            F.col("doc_id"),
            F.array_distinct(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .filter((F.col("n") > 0) & ~((F.col("n") == 1) & (F.element_at("toks", 1) == "")))
    )
    tok = base.select(
        "doc_id", "n", F.explode("toks").alias("tok")
    ).select("doc_id", "n", F.xxhash64("tok").alias("key"))
    if not args.no_tok_checkpoint:
        tok = tok.localCheckpoint(eager=True)
        counts["tok_rows"] = tok.count()
    walls["tok_checkpoint"] = round(time.time() - t0, 2)

    t2 = time.time()
    tok_df = tok.groupBy("key").agg(F.count("*").alias("tok_df"))
    tok_df = tok_df.localCheckpoint(eager=True)
    n_vocab = tok_df.count()
    counts["vocab"] = n_vocab
    walls["tok_df_agg"] = round(time.time() - t2, 2)

    t3 = time.time()
    ranked = tok.join(
        F.broadcast(tok_df) if n_vocab <= VOCAB_BROADCAST_MAX_ROWS else tok_df,
        "key",
    )
    _m = F.col("n") - _ceil_safe(F.lit(t) * F.col("n"))
    _L = F.least(_m + F.lit(k), F.col("n"))

    def _topk(stream):
        return (
            stream.groupBy("doc_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("tok_df", "key"))
                ).alias("ms"),
                F.first("n").alias("n"),
            )
            .select("doc_id", F.explode(F.slice("ms", 1, _L)).alias("m"), "n")
            .select("doc_id", F.col("m.key").alias("key"), "n")
        )

    rho = 4.0 * (1.0 - t) + 0.08
    cutoff = None
    if rho <= 0.33 and not args.no_cutoff:
        hist = (
            tok_df.groupBy(
                F.ceil(F.log2(F.col("tok_df"))).cast("int").alias("b")
            )
            .agg(F.sum("tok_df").alias("rows"))
            .collect()
        )
        buckets = sorted((r["b"], r["rows"]) for r in hist)
        total = sum(rows for _, rows in buckets)
        cum = 0
        for b, rows in buckets:
            cum += rows
            if cum >= rho * total:
                if cum <= 0.4 * total and b < buckets[-1][0]:
                    cutoff = 2 ** b
                break
    walls["cutoff_hist"] = round(time.time() - t3, 2)
    counts["cutoff"] = cutoff if cutoff is not None else -1

    t35 = time.time()
    if cutoff is not None:
        agg_u = ranked.groupBy("doc_id").agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("tok_df") <= F.lit(cutoff),
                        F.struct("tok_df", "key"),
                    )
                )
            ).alias("ms"),
            F.first("n").alias("n"),
        )
        agg_u = agg_u.localCheckpoint(eager=True)
        sat = F.size("ms") >= _L
        prefix_main = (
            agg_u.filter(sat)
            .select("doc_id", F.explode(F.slice("ms", 1, _L)).alias("m"), "n")
            .select("doc_id", F.col("m.key").alias("key"), "n")
        )
        bad_ids = agg_u.filter(~sat).select("doc_id")
        counts["fallback_docs"] = bad_ids.count()
        prefix_fb = _topk(ranked.join(F.broadcast(bad_ids), "doc_id", "left_semi"))
        prefix = prefix_main.unionByName(prefix_fb)
    else:
        prefix = _topk(ranked)
    prefix = prefix.localCheckpoint(eager=True)
    counts["prefix_rows"] = prefix.count()
    walls["rank_and_prefix"] = round(time.time() - t35, 2)

    t4 = time.time()
    index = tok
    if bloom_supported(spark):
        n_probe = counts["prefix_rows"]
        bloom_bytes = bloom_build(
            prefix.select("key"), "key", expected_items=max(n_probe, 1)
        )
        if bloom_bytes is not None:
            pred = might_contain(tok, "key", bloom_bytes)
            if pred is not None:
                index = tok.filter(pred)
    walls["bloom_build"] = round(time.time() - t4, 2)

    t5 = time.time()
    cand, _ = probe_index_pairs(
        prefix.select("doc_id", "key", "n"),
        index,
        cfg,
        payload_cols=("n",),
        distinct=False,
    )
    m_p = F.col("n_p") - _ceil_safe(F.lit(t) * F.col("n_p"))
    req = F.least(m_p + F.lit(k), F.col("n_p")) - m_p
    cand = (
        cand.filter(F.col("n_i") >= _ceil_safe(F.lit(t) * F.col("n_p")))
        .groupBy("probe_id", "index_id", "n_p")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= req)
        .select("probe_id", "index_id")
    )
    cand = cand.localCheckpoint(eager=True)
    counts["cand_pairs"] = cand.count()
    walls["probe_join_countfilter"] = round(time.time() - t5, 2)

    t6 = time.time()
    a = base.select(F.col("doc_id").alias("probe_id"), F.col("toks").alias("ta"),
                    F.col("n").alias("na"))
    b = base.select(F.col("doc_id").alias("index_id"), F.col("toks").alias("tb"))
    out = (
        cand.join(a, "probe_id").join(b, "index_id")
        .select(
            F.col("probe_id").alias("id_contained"),
            F.col("index_id").alias("id_container"),
            F.round(F.size(F.array_intersect("ta", "tb")) / F.col("na"), 6
                    ).alias("containment"),
        )
        .filter(F.col("containment") >= t)
    )
    counts["pairs"] = out.count()
    walls["exact_verify"] = round(time.time() - t6, 2)
    walls["total"] = round(time.time() - t0, 2)

    print(json.dumps({"docs": args.docs, "cpus": args.cpus, "probe_k": k,
                      "counts": counts, "walls_s": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
