"""Per-phase wall profile of the containment tier (round-4 tuning loop).

Materializes each sub-step of ``containment_pairs`` (+ the keeper
anti-join from the curation tier) so the per-phase walls are separable,
at the funnel's exact config (t=1.0, probe_k=3).

Usage: python tools/profile_containment.py --docs 200000 --cpus 32
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
    ap.add_argument("--threshold", type=float, default=1.0)
    ap.add_argument("--materialize", default="auto",
                    choices=["auto", "base", "none"])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from localitysensitivesketch_spark.config import SketchConfig
    from localitysensitivesketch_spark.operators.dedup import containment_pairs
    from localitysensitivesketch_spark.session import get_spark

    data = build_corpus(args.docs)
    spark = get_spark(
        app_name="containment-profile",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(2 * args.cpus, 8),
    )
    docs = spark.read.parquet(data).drop("kind")
    n = docs.count()

    walls: dict[str, float] = {}
    t0 = time.time()
    pairs = containment_pairs(
        docs, threshold=args.threshold, cfg=SketchConfig(),
        materialize=args.materialize,
    )
    n_pairs = pairs.count()
    walls["containment_pairs_total"] = round(time.time() - t0, 2)

    t1 = time.time()
    sizes = docs.select(
        F.col("doc_id"),
        F.size(
            F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        ).alias("n_toks"),
    )
    na = sizes.select(F.col("doc_id").alias("id_contained"), F.col("n_toks").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_container"), F.col("n_toks").alias("n_b"))
    dropped = (
        pairs.join(na, "id_contained")
        .join(nb, "id_container")
        .filter(
            (F.col("n_b") > F.col("n_a"))
            | ((F.col("n_b") == F.col("n_a")) & (F.col("id_container") < F.col("id_contained")))
        )
        .select(F.col("id_contained").alias("doc_id"))
        .distinct()
    )
    n_dropped = dropped.count()
    walls["keeper_rule_extra"] = round(time.time() - t1, 2)
    walls["total"] = round(time.time() - t0, 2)

    from localitysensitivesketch_spark.operators.dedup import choose_materialize

    print(json.dumps({
        "docs": n, "cpus": args.cpus, "threshold": args.threshold,
        "materialize": args.materialize,
        "materialize_resolved": (
            choose_materialize(docs)
            if args.materialize == "auto"
            else args.materialize
        ),
        "n_pairs": n_pairs, "n_dropped": n_dropped, "walls_s": walls,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
