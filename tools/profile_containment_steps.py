"""Instrumented sub-step walls for containment_pairs (t=1.0 path).

Materializes each intermediate with a count() so the phases separate.
Throwaway tuning tool; the production operator is
operators/dedup.py::containment_pairs.
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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from localitysensitivesketch_spark.config import SketchConfig
    from localitysensitivesketch_spark.operators.candidates import probe_index_pairs
    from localitysensitivesketch_spark.operators.dedup import _ceil_safe
    from localitysensitivesketch_spark.session import get_spark

    cfg = SketchConfig()
    k = 3
    t = 1.0
    data = build_corpus(args.docs)
    spark = get_spark(
        app_name="containment-steps",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(2 * args.cpus, 8),
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
    tok = base.select("doc_id", "n", F.explode("toks").alias("tok"))
    counts["tok_rows"] = tok.count()
    walls["explode_count"] = round(time.time() - t0, 2)

    t1 = time.time()
    tok_df = tok.groupBy("tok").agg(F.count("*").alias("tok_df"))
    counts["vocab"] = tok_df.count()
    walls["tok_df_agg"] = round(time.time() - t1, 2)

    t2 = time.time()
    ranked = tok.join(tok_df, "tok")
    prefix = (
        ranked.groupBy("doc_id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("tok_df", "tok"))), 1, k
            ).alias("ms"),
            F.first("n").alias("n"),
        )
        .select("doc_id", F.explode("ms").alias("m"), "n")
        .select("doc_id", F.col("m.tok").alias("tok"), "n")
    )
    prefix = prefix.localCheckpoint(eager=True)
    counts["prefix_rows"] = prefix.count()
    walls["rank_and_prefix"] = round(time.time() - t2, 2)

    t3 = time.time()
    cand, _ = probe_index_pairs(
        prefix.select("doc_id", F.xxhash64("tok").alias("key"), "n",
                      F.xxhash64("tok").alias("pk")),
        tok.select("doc_id", F.xxhash64("tok").alias("key"), "n",
                   F.xxhash64("tok").alias("pk")),
        cfg,
        payload_cols=("n", "pk"),
        distinct=False,
    )
    m_p = F.col("n_p") - _ceil_safe(F.lit(t) * F.col("n_p"))
    req = F.least(m_p + F.lit(k), F.col("n_p")) - m_p
    cand = (
        cand.filter(F.col("n_i") >= _ceil_safe(F.lit(t) * F.col("n_p")))
        .groupBy("probe_id", "index_id", "n_p")
        .agg(F.count_distinct(F.col("pk_p")).alias("hits"))
        .filter(F.col("hits") >= req)
        .select("probe_id", "index_id")
    )
    cand = cand.localCheckpoint(eager=True)
    counts["cand_pairs"] = cand.count()
    walls["probe_join_countfilter"] = round(time.time() - t3, 2)

    t4 = time.time()
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
    walls["exact_verify"] = round(time.time() - t4, 2)
    walls["total"] = round(time.time() - t0, 2)

    print(json.dumps({"docs": args.docs, "cpus": args.cpus,
                      "counts": counts, "walls_s": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
