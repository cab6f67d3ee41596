"""Connected-components cluster resolution (operators/cluster.py).

Reference oracle: a driver-side union-find over the same edge list. The
distributed algorithm (alternating large-star/small-star) must produce
identical min-id component labels for every input shape, including the
worst case for naive propagation — a long path, where hash-to-min needs
O(n) rounds but star contraction needs O(log n)."""

import random

from pyspark.sql import functions as F

from crawler_to_md_spark.operators.cluster import (
    cluster_assignments,
    connected_components,
    keep_canonical,
)


def _union_find(edges):
    """node -> min id of its component, for nodes appearing in edges."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a: long, id_b: long"
    )


def _assert_matches_union_find(spark, edges, max_iterations=50):
    stats = {}
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            _pairs_df(spark, edges), stats=stats, max_iterations=max_iterations
        ).collect()
    }
    assert got == _union_find(edges)
    return stats


def test_cc_matches_union_find_random_graph(spark):
    rng = random.Random(1234)
    nodes = list(range(300))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(220)
    ]
    # keep self-loops and duplicates in: the operator must tolerate them
    _assert_matches_union_find(spark, edges)


def test_cc_path_graph_converges_logarithmically(spark):
    # path 0-1-2-...-63: all 64 nodes are ONE component rooted at 0;
    # star contraction must get there in far fewer than n iterations
    edges = [(i, i + 1) for i in range(63)]
    stats = _assert_matches_union_find(spark, edges)
    assert 1 <= stats["iterations"] <= 14


def test_cc_reversed_and_duplicate_edges(spark):
    edges = [(2, 1), (1, 2), (2, 1), (3, 3), (5, 4)]
    got = {
        r["id"]: r["component"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    # (3,3) is a pure self-loop: node 3 has no real edge, so it is absent
    assert got == {1: 1, 2: 1, 4: 4, 5: 4}


def test_cc_empty_input(spark):
    stats = {}
    out = connected_components(
        _pairs_df(spark, []).limit(0), stats=stats
    )
    assert out.columns == ["id", "component"]
    assert out.count() == 0
    assert stats["iterations"] == 0


def test_cluster_assignments_sizes(spark):
    edges = [(1, 2), (2, 3), (7, 9)]
    rows = {
        r["id"]: (r["cluster_id"], r["cluster_size"])
        for r in cluster_assignments(_pairs_df(spark, edges)).collect()
    }
    assert rows == {
        1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 9: (7, 2),
    }


def test_keep_canonical_drops_non_minimum_members(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 11)], "doc_id: long, text: string"
    )
    pairs = _pairs_df(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"] for r in keep_canonical(docs, pairs).collect()
    )
    # cluster {1,2,3} keeps 1; {5,6} keeps 5; singletons untouched
    assert kept == [1, 4, 5, 7, 8, 9, 10]


def test_phash_clusters_planted_dups(spark):
    """The registered image-cluster query: every planted re-encoded copy
    must land in one cluster with its original, labeled by the
    lexicographically smallest id; cluster labels match union-find over
    the same pair list."""
    from crawler_to_md_spark.queries import (
        phash_clusters_images,
        phash_pairs_images,
    )

    clusters = {
        r["image_id"]: (r["cluster_id"], r["cluster_size"])
        for r in phash_clusters_images(spark, None).collect()
    }
    pairs = [
        (r["id_a"], r["id_b"])
        for r in phash_pairs_images(spark, None).collect()
    ]
    expect = _union_find(pairs)
    assert {k: v[0] for k, v in clusters.items()} == expect
    # every planted dup shares a cluster with its source image
    for img, (cid, size) in clusters.items():
        if img.startswith("dup-"):
            assert clusters[img.removeprefix("dup-")][0] == cid
            assert size >= 2


def test_cc_max_iterations_raises(spark):
    import pytest

    with pytest.raises(RuntimeError, match="no fixpoint"):
        # a 15-node path cannot finish in 1 iteration
        connected_components(
            _pairs_df(spark, [(i, i + 1) for i in range(15)]),
            max_iterations=1,
        )


def test_neardup_cluster_queries_consistent(spark):
    """The three registered doc-level near-dup queries agree with each
    other: clusters relabel exactly the hamming pairs' nodes, and the
    kept set is documents minus non-canonical members."""
    from crawler_to_md_spark.queries import (
        dedup_keep_canonical_docs,
        hamming_pairs_docs,
        neardup_clusters_docs,
    )

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["id_a"], r["id_b"])
        for r in hamming_pairs_docs(spark, sf).collect()
    ]
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters_docs(spark, sf).collect()
    }
    assert clusters == _union_find(pairs)
    kept = {r["doc_id"] for r in dedup_keep_canonical_docs(spark, sf).collect()}
    all_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id").collect()
    }
    dropped = {d for d, c in clusters.items() if d != c}
    assert kept == all_ids - dropped


def test_reliable_checkpoint_seam(spark, tmp_path):
    """VERDICT r5 #6: with a reliable checkpoint dir configured, the
    closure's lineage truncation must go through checkpoint() (files
    under the dir), not localCheckpoint(); with none set, it must not
    require one. Results are identical either way."""
    edges = [(1, 2), (2, 3), (10, 11)]
    want = _union_find(edges)
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    base = {(r["id"], r["component"])
            for r in connected_components(_pairs_df(spark, edges)).collect()}
    assert base == set(want.items())

    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        got = {(r["id"], r["component"])
               for r in connected_components(_pairs_df(spark, edges)).collect()}
        assert got == set(want.items())
        import os

        found = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckdir) for f in fs
        ]
        assert found, "reliable checkpoint dir is set but no checkpoint files were written"
    finally:
        # tmp_path dies with the test: later tests in this session must
        # fall back to localCheckpoint, not a dangling dir
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
        assert sc.getCheckpointDir() is None
