import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    exact_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_neardup_pairs,
    word_shingles,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup
    (2, "The  Quick Brown Fox jumps over the lazy dog"),         # ws/case dup
    (3, "the quick brown fox leaps over the lazy dog today"),    # near dup
    (4, "completely different content about spark engines"),
    (5, "completely different content about spark engines here"),
    (6, "unrelated short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert kept == [0, 3, 4, 5, 6]  # 1 and 2 fold into 0


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    got = [r[0] for r in df.select(word_shingles(F.col("t"), 3)).collect()]
    assert got == [["a b c", "b c d"], ["a b"]]


def test_minhash_matches_exact_jaccard(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in exact_jaccard_pairs(docs, threshold=0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5, num_perm=128,
                                   bands=32).collect()
    }
    # LSH candidates are verified with exact jaccard, so no false positives
    assert approx <= exact
    # recall on clear duplicates (j=1.0 pairs must always be found)
    assert {(0, 1), (0, 2), (1, 2)} <= approx
    assert len(approx) >= len(exact) - 1  # allow 1 borderline miss


def test_simhash_neardup(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    assert (0, 4) not in pairs and (0, 6) not in pairs


def test_embedding_neardup(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.standard_normal(16)
    rows = [
        (0, base.tolist()),
        (1, (base + rng.standard_normal(16) * 0.01).tolist()),  # near dup
        (2, rng.standard_normal(16).tolist()),
        (3, (base * 2.0).tolist()),                             # scaled dup
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(emb, threshold=0.95).collect()
    }
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
    assert all(k != (0, 2) for k in pairs)


def test_simhash_hamming_tracks_token_edit_count(spark):
    """Property oracle for the (non-SQL-expressible) simhash fingerprint
    (VERDICT r3 #7): over >=20 generated near-duplicate pairs, hamming
    distance of the 64-bit fingerprints must grow with the number of
    edited tokens and stay far below unrelated-pair distances. Fully
    deterministic (seeded generator + xxhash64), so the bounds are exact
    regression pins, not statistical hopes."""
    import random

    from crawler_to_md_spark.operators.dedup import simhash_fingerprints

    rng = random.Random(1234)
    vocab = [f"tok{i}" for i in range(500)]
    rows, meta = [], []
    doc_id = 0
    for case in range(24):
        base = [rng.choice(vocab) for _ in range(60)]
        n_edit = 1 + case % 6  # 1..6 of 60 tokens (<=10% edit ratio)
        mutated = list(base)
        for pos in rng.sample(range(60), n_edit):
            mutated[pos] = rng.choice(vocab)
        rows.append((doc_id, " ".join(base)))
        rows.append((doc_id + 1, " ".join(mutated)))
        meta.append((doc_id, doc_id + 1, n_edit))
        doc_id += 2
    # unrelated controls
    ctrl = []
    for _ in range(10):
        rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(60))))
        ctrl.append(doc_id)
        doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["id"]: r["simhash"]
          for r in simhash_fingerprints(df).collect()}

    def ham(a, b):
        return bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1")

    near = [(ham(a, b), n) for a, b, n in meta]
    far = [ham(a, b) for i, a in enumerate(ctrl) for b in ctrl[i + 1:]]
    assert len(near) >= 20
    # every near-dup pair is closer than every unrelated pair
    assert max(h for h, _ in near) < min(far), (near, far)
    # distance grows with edit count: mean over 1-2 edits < mean over 5-6
    lo = [h for h, n in near if n <= 2]
    hi = [h for h, n in near if n >= 5]
    assert sum(lo) / len(lo) < sum(hi) / len(hi)
    # identical docs -> identical fingerprints (hamming 0)
    df2 = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp2 = [r["simhash"] for r in simhash_fingerprints(df2).collect()]
    assert fp2[0] == fp2[1]
