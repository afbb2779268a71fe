"""Deterministic stratified sampling + corpus mixing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from localitysensitivesketch_spark.operators import sampling as SA


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df.cache().count()
    return df


def _py_u(doc_id: int, seed: int = 42) -> float:
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def test_uniform_hash_matches_reference_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", SA.uniform_hash01("doc_id", seed=7).alias("u")
        ).collect()
    }
    for i in range(50):
        assert got[i] == _py_u(i, 7)  # exact float equality


def test_stratified_sample_exact_membership(spark, docs):
    fr = {"en": 0.5, "de": 0.25}
    out = SA.stratified_sample(docs, "lang", fr, seed=42)
    got = {(r["doc_id"], r["lang"]) for r in out.select("doc_id", "lang").collect()}
    for r in docs.select("doc_id", "lang").collect():
        expect = _py_u(r["doc_id"]) < fr.get(r["lang"], 0.0)
        assert ((r["doc_id"], r["lang"]) in got) == expect


def test_stratified_sample_is_partitioning_invariant(spark, docs):
    fr = {"en": 0.3, "zh": 0.9}
    a = {r["doc_id"] for r in SA.stratified_sample(docs, "lang", fr).collect()}
    b = {
        r["doc_id"]
        for r in SA.stratified_sample(
            docs.repartition(17, "lang"), "lang", fr
        ).collect()
    }
    assert a == b


def test_stratified_sample_no_shuffle_no_udf(spark, docs):
    out = SA.stratified_sample(docs, "lang", {"en": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixing_rates_schedule(spark, docs):
    rates = {
        r["stratum"]: r
        for r in SA.mixing_rates(
            docs, "lang", {"en": 0.5, "de": 0.5}, budget=40
        ).collect()
    }
    n_en = rates["en"]["weight"]
    n_de = rates["de"]["weight"]
    assert rates["en"]["rate"] == round(min(1.0, 20 / n_en), 6)
    assert rates["de"]["rate"] == round(min(1.0, 20 / n_de), 6)
    assert rates["fr"]["rate"] == 0.0 and rates["fr"]["target_share"] == 0.0


def test_mixing_rates_feed_stratified_sample(spark, docs):
    """The documented loop: rates → dict → stratified_sample hits ≈ the
    budget allocation per stratum (exact Bernoulli expectation ±4σ)."""
    rows = SA.mixing_rates(docs, "lang", {"en": 1.0}, budget=30).collect()
    fr = {r["stratum"]: r["rate"] for r in rows}
    took = SA.stratified_sample(docs, "lang", fr).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in took.collect()}
    n_en = {r["stratum"]: r["weight"] for r in rows}["en"]
    p = min(1.0, 30 / n_en)
    sigma = (n_en * p * (1 - p)) ** 0.5
    assert set(got) == {"en"}
    assert abs(got["en"] - 30) <= 4 * sigma + 1


def test_corpus_mix_report_shares_sum_to_one(spark, docs):
    rep = SA.corpus_mix_report(docs, "lang", weight_col="n_chars").collect()
    assert abs(sum(r["share"] for r in rep) - 1.0) < 1e-4
    total = sum(r["weight"] for r in rep)
    for r in rep:
        assert r["share"] == round(r["weight"] / total, 6)
