"""spark-submit entrypoint for the dedup pipeline (north_rule run mode).

The north rule requires the pipeline to run "via spark-submit --py-files on
a multi-executor cluster".  This script is that job: the package is shipped
as a zip built by ``tools/build_pyfiles.py`` and this file is the primary
resource, so the SAME command line works unchanged on a real cluster —
only ``--master`` changes:

    python tools/build_pyfiles.py                       # → dist/lss_spark.zip
    spark-submit --master local[8] \
        --py-files dist/lss_spark.zip tools/submit_job.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/lss_out [--checkpoint /tmp/lss_ckpt] \
        [--signature-slices 8]

Inputs follow the input_hint shape (url, warc_ts, html, text, lang); a
``doc_id`` is derived from ``url`` when absent (``with_doc_id``).  Outputs:
``<output>/clusters.parquet`` (doc_id → cluster_id), ``<output>/
cluster_stats.parquet``, ``<output>/keep.parquet`` (one representative doc
per cluster, text bytes untouched — the byte-identical invariant), and a
one-line metrics JSON on stdout.

On a cluster, pass ``--checkpoint`` on shared storage (HDFS/S3/Iceberg
warehouse path): every stage is then a committed, resumable table with
lineage (``DedupPipeline`` / ``CheckpointStore``), and re-running the same
command after an interruption reuses finished stages (and, with
``--signature-slices``, finished signature slices).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--checkpoint", default=None,
                    help="stage-table root (shared storage on a cluster); "
                         "default: a throwaway temp dir")
    ap.add_argument("--config-json", default=None,
                    help="SketchConfig overrides as a JSON object")
    ap.add_argument("--signature-slices", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    # imports AFTER arg parsing so --help works without the py-files zip
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from localitysensitivesketch_spark.config import SketchConfig
    from localitysensitivesketch_spark.operators.signatures import with_doc_id
    from localitysensitivesketch_spark.plans.pipeline import DedupPipeline

    cfg = (SketchConfig.from_json(args.config_json)
           if args.config_json else SketchConfig())
    # spark-submit owns master/deploy-mode; just get-or-create and apply
    # the engine's session-level tuning that doesn't conflict with it
    spark = (
        SparkSession.builder.appName("lss-dedup-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    if "doc_id" not in docs.columns:
        docs = with_doc_id(docs)

    ckpt = args.checkpoint or tempfile.mkdtemp(prefix="lss_submit_ckpt_")
    pipe = DedupPipeline(spark, ckpt, cfg)
    res = pipe.run(
        docs,
        resume=not args.no_resume,
        signature_slices=args.signature_slices,
    )

    res.clusters.write.mode("overwrite").parquet(
        f"{args.output}/clusters.parquet")
    res.cluster_stats.write.mode("overwrite").parquet(
        f"{args.output}/cluster_stats.parquet")
    # keep-list: the canonical (min doc_id) member of each cluster, with the
    # ORIGINAL row joined back so text/html bytes pass through unmodified
    keep = (
        res.cluster_stats.select(
            F.col("canonical_doc_id").alias("doc_id"))
        .join(docs, "doc_id")
    )
    keep.write.mode("overwrite").parquet(f"{args.output}/keep.parquet")

    n_docs = res.clusters.count()
    n_clusters = res.cluster_stats.count()
    print(json.dumps({
        "n_docs": n_docs,
        "n_clusters": n_clusters,
        "dup_rate": round(1.0 - n_clusters / n_docs, 4) if n_docs else 0.0,
        "stages_run": res.stages_run,
        "stages_resumed": res.stages_resumed,
        "wall_sec": round(time.time() - t0, 2),
        "output": args.output,
        "checkpoint": ckpt,
    }))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
