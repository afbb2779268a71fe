"""Deterministic sampling and corpus mixing for training-data pipelines.

A 100 TB pre-training corpus is never used whole: it is *mixed* — each
source/language stratum contributes a target share of the token budget, and
the selection must be (a) deterministic (two runs pick the same rows, so
downstream dedup/decontamination stay reproducible), (b) driver-free (no
``sample()`` RNG whose draw depends on partitioning), and (c) pushdown-
friendly (the keep predicate is a plain column expression the scan can
evaluate).

The primitive is a seeded uniform hash: ``u(id) = int(md5(id || ':' ||
seed)[:8 hex]) / 2^32`` — a pure column expression (md5 + conv, whole-stage
codegen, no shuffle, no UDF) that any engine can reproduce (DuckDB:
``('0x' || substr(md5(..),1,8))::BIGINT / 4294967296.0``), unlike Spark's
``TABLESAMPLE``/``df.sample`` whose output depends on partition layout.
Reference analogue: the deterministic seeded hash family that drives
sketch placement (``util/hash/*``, pinned seeds per SURVEY §4.2 item 3) —
here the "sketch" is a 32-bit uniform used as a keep threshold.

Plan shape at 100 TB: ``stratified_sample`` is one map-side filter — zero
shuffles, prunable to the scan.  ``mixing_rates`` aggregates one tiny
(n_strata-row) table and every downstream rate lands in a broadcast CASE
expression; the heavy table is touched exactly twice (once to count, once
to filter), never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32 = 4294967296.0  # 2^32


def uniform_hash01(col: Column | str, seed: int = 42) -> Column:
    """Deterministic uniform [0, 1) from a key column: the first 8 hex
    digits of ``md5(key || ':' || seed)`` scaled by 2⁻³².  Stable across
    partitionings, engines, and runs."""
    key = F.concat_ws(":", F.col(col).cast("string") if isinstance(col, str)
                      else col.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") / F.lit(
        _U32
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum *s* iff ``u(id) < fractions[s]`` — an exact,
    deterministic per-stratum Bernoulli sample expressed as one codegen'd
    filter.  Strata absent from ``fractions`` fall back to
    ``default_fraction`` (0.0 = drop, 1.0 = keep all).

    Unlike ``df.sampleBy`` the decision is a pure function of (id, seed):
    re-runs, retries, and different partition layouts select identical
    rows, so lineage stays reproducible end-to-end.
    """
    frac: Column = F.lit(float(default_fraction))
    for s, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == F.lit(s), F.lit(float(f))).otherwise(
            frac
        )
    return df.filter(uniform_hash01(id_col, seed) < frac)


def corpus_mix_report(
    df: DataFrame,
    strata_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """(stratum, n_docs, weight, share): the corpus' current mixture.
    ``weight_col`` is the budget unit (e.g. a token count); ``None`` counts
    documents.  One partial+final hash aggregation over n_strata groups."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    agg = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"), F.sum(w).alias("weight")
    )
    # global window over the ALREADY-AGGREGATED n_strata-row table — the
    # single-partition exchange moves n_strata rows, not the corpus
    total = F.sum("weight").over(Window.partitionBy())
    return agg.select(
        "stratum",
        "n_docs",
        "weight",
        F.round(F.col("weight") / total, 6).alias("share"),
    )


def mixing_rates(
    df: DataFrame,
    strata_col: str,
    target_shares: dict[str, float],
    budget: float,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-stratum sampling rates that hit a target mixture under a budget.

    ``rate(s) = min(1, budget · target_shares[s] / weight(s))`` — the
    standard down-sampling schedule for pre-training data mixing (e.g. the
    published C4/Pile/Gopher recipes: cap each source's contribution at its
    target share of the token budget; a stratum smaller than its allocation
    is taken whole, it is never up-sampled).  Output: (stratum, n_docs,
    weight, target_share, rate) — feed ``rate`` into
    :func:`stratified_sample` (via ``dict(rows)``) to materialize the mix.

    The aggregate is n_strata rows; everything after it is driver-free
    column arithmetic, so the heavy table is scanned once.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    tgt: Column = F.lit(0.0)
    for s, t in sorted(target_shares.items()):
        tgt = F.when(F.col("stratum") == F.lit(s), F.lit(float(t))).otherwise(
            tgt
        )
    agg = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"), F.sum(w).alias("weight")
    )
    return agg.select(
        "stratum",
        "n_docs",
        "weight",
        F.round(tgt, 6).alias("target_share"),
        F.round(
            F.least(F.lit(1.0), F.lit(float(budget)) * tgt / F.col("weight")),
            6,
        ).alias("rate"),
    )
