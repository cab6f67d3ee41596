import numpy as np
import pytest

from crawler_to_md_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    rows = emb.orderBy("vec_id").limit(3).collect()
    return spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in rows],
        "query_id long, query_vec array<float>",
    )


def test_bruteforce_self_query_rank1(emb, queries):
    out = cosine_topk_bruteforce(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert rows[0]["vec_id"] == qid          # self is the best match
        assert abs(rows[0]["cosine"] - 1.0) < 1e-4
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_recall_vs_bruteforce(emb, queries):
    exact = cosine_topk_bruteforce(emb, queries, k=10).collect()
    approx = cosine_topk_ivf(emb, queries, k=10, ncells=8, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert float(np.mean(recalls)) >= 0.6, recalls


def test_ivf_training_collect_is_bounded(emb):
    """The k-means training collect is hard-bounded regardless of corpus
    size (r1's fraction-1.0 toPandas() of the whole corpus was the
    scale-killer)."""
    from crawler_to_md_spark.operators import similarity as sim

    captured = {}
    orig = sim.np.vstack

    def spy(arrs):
        captured["n"] = len(arrs)
        return orig(arrs)

    sim.np.vstack = spy
    try:
        cent = sim.train_ivf_centroids(emb, ncells=4, max_sample_rows=32)
    finally:
        sim.np.vstack = orig
    assert captured["n"] <= 32
    assert cent.shape[0] == 4
