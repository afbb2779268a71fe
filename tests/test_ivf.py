"""IVF coarse-quantizer ANN: trainer≡shadow bit-identity, plan shape,
probe semantics, and nprobe=n_cells ≡ brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from localitysensitivesketch_spark import oracle as O
from localitysensitivesketch_spark.operators import ivf as V
from localitysensitivesketch_spark.operators.similarity import (
    cosine_topk_bruteforce,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df.cache().count()
    return df


def test_ivf_train_matches_pure_python_shadow(spark, emb):
    centers = V.ivf_train(emb, n_cells=8, n_iter=5, sample_size=300)
    rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(300).collect()
    )
    pts = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in rows]
    shadow = O.oracle_ivf_centers(pts, n_cells=8, n_iter=5)
    assert len(centers) == len(shadow) == 8
    for a, b in zip(centers, shadow):
        assert a == b  # bit-identical floats, no tolerance


def test_ivf_assign_is_jvm_side_and_total(spark, emb):
    centers = V.ivf_train(emb, n_cells=4, n_iter=3, sample_size=200)
    assigned = V.ivf_assign(emb, centers)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = assigned.collect()
    assert len(rows) == emb.count()
    cells = {r["cell"] for r in rows}
    assert cells <= set(range(4)) and len(cells) > 1


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """nprobe == n_cells searches every cell ⇒ exact brute-force answer."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    ivf = V.ann_topk_ivf(
        emb, queries, k=5, n_cells=4, nprobe=4, n_iter=3, sample_size=200
    )
    assert sorted(map(tuple, ivf.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_ivf_partial_probe_recall_curve(spark, emb):
    """Recall grows monotonically with nprobe (the IVF contract: probing
    more cells only adds candidates) and reaches a useful level well before
    scanning every cell.  Measured curve on this fixture: 0.28 / 0.48 /
    0.76 / 1.0 at nprobe 1 / 2 / 4 / 8."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["nbr_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    centers = V.ivf_train(emb, n_cells=8, n_iter=5, sample_size=500)
    recall = {}
    for npb in (1, 2, 4):
        got = {
            (r["query_id"], r["nbr_id"])
            for r in V.ann_topk_ivf(
                emb, queries, k=5, n_cells=8, nprobe=npb, centers=centers
            ).collect()
        }
        recall[npb] = len(got & exact) / len(exact)
        by_q = {}
        for q, n in got:
            by_q.setdefault(q, set()).add(n)
        assert all(len(v) <= 5 for v in by_q.values())
    assert recall[1] <= recall[2] <= recall[4]
    assert recall[4] >= 0.7


def test_ivf_pretrained_centers_skip_training(spark, emb):
    centers = V.ivf_train(emb, n_cells=4, n_iter=3, sample_size=200)
    a = V.ann_topk_ivf(emb, emb.filter("vec_id < 3"), k=3, centers=centers,
                       n_cells=4, nprobe=4)
    b = V.ann_topk_ivf(emb, emb.filter("vec_id < 3"), k=3, n_cells=4,
                       nprobe=4, n_iter=3, sample_size=200)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
