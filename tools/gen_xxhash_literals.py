#!/usr/bin/env python
"""Regenerate crawler_to_md_spark/_xxhash_fixture.py: pinned expected
outputs of the two xxhash64-based sketch queries at the driver's
correctness scale (sf0.01), computed INDEPENDENTLY of Spark.

xxhash64 has no DuckDB builtin, so ``simhash_docs`` and
``minhash_pairs_docs`` were rows-only until round 5. This script closes
that gap the same way tools/gen_phash_literals.py did for the image
family: recompute the full expected result with an implementation that
shares nothing with the engine —

- tools/xxh64_py.py: pure-Python XXH64 from the public spec (Spark
  hashes JVM-side in catalyst's XxHash64 expression);
- plain-Python int bit-votes / affine-min sketches (the engine uses
  numpy inside pandas UDFs, operators/dedup.py);
- Python set intersection/union for the exact-Jaccard verify (the
  engine uses JVM array_intersect/array_union);
- DuckDB for the parquet read (the engine reads through Spark).

The only shared ingredients are published constants: the XXH64 primes,
and the RandomState(7) (a, b) permutation table — which is DATA (the
same numbers any engine must use), not logic.

The DuckDB oracles built over these literals therefore value-check the
whole Spark pipeline end-to-end: a change to normalization, shingling,
the JVM hash call, the sketch UDFs, the banding join, the skew cap, or
the verify join flips the driver row red. Re-run ONLY when sketch
parameters are intentionally changed. Needs no Spark session.

Semantics mirrored (operators/dedup.py):
- normalize_text: lower, \\s+ -> ' ', trim. sf0.01 documents.text is
  pure printable ASCII (asserted below), where Java and Python regex /
  lower / trim agree exactly.
- word_shingles(n=3): toks = split(norm, ' '); len(toks) < 3 -> the
  whole normalized text as one shingle; else toks[i:i+3] joined by ' '
  for i in 0..len-3; distinct.
- minhash (num_perm=128, seed=7): h = uint64(xxh64(shingle)) & p,
  sig[k] = min over shingles of ((a_k*h + b_k) mod 2^64) mod p,
  p = 2^61 - 1 (all-uint64 wrap, exact in Python ints).
- LSH banding (bands=32): bucket = xxh64(','.join(sig slice as decimal
  strings)); candidate pairs share a (band, bucket); skew cap 10^4 is
  vacuous at 500 docs (asserted); verify = exact Jaccard >= 0.5 on the
  distinct shingle sets; output jaccard rounded HALF_UP to 6 (Spark's
  F.round semantics).
- simhash: per-token xxh64, per-bit sum of (2*bit - 1) over tokens,
  fingerprint bit i = 1 iff votes > 0, packed to signed int64.
"""
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
from xxh64_py import xxh64_i64  # noqa: E402

MERSENNE = (1 << 61) - 1
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def normalize(text: str) -> str:
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip()


def shingles3(norm: str) -> list[str]:
    toks = norm.split(" ")
    if len(toks) < 3:
        return [" ".join(toks)]
    return list(dict.fromkeys(
        " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
    ))


def simhash(norm: str) -> int:
    votes = [0] * 64
    for tok in norm.split(" "):
        h = xxh64_i64(tok) & ((1 << 64) - 1)
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    val = 0
    for i in range(64):
        if votes[i] > 0:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def minhash_sig(sh: list[str], a: list[int], b: list[int]) -> list[int]:
    hs = [(xxh64_i64(s) & ((1 << 64) - 1)) & MERSENNE for s in sh]
    return [
        min(((ak * h + bk) % (1 << 64)) % MERSENNE for h in hs)
        for ak, bk in zip(a, b)
    ]


def round_half_up6(x: float) -> float:
    """HALF_UP to 6 dp over the EXACT binary expansion of the double.

    Tie caveat (ADVICE r5): Spark's ``F.round(col, 6)`` on DoubleType
    rounds the SHORTEST decimal repr (Scala ``BigDecimal.decimal`` ==
    ``Double.toString``), while ``Decimal(x)`` here expands the full
    binary value — the two disagree on exact half-way ties at the 7th
    digit. No current fixture value sits on such a tie
    (test_xxhash_fixture_in_sync_with_queries pins the live data); if a
    regeneration on new data ever trips one, switch to
    ``Decimal(repr(x))`` to match Spark's shortest-repr semantics."""
    return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def main() -> None:
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    assert all(
        t is not None and all(" " <= c <= "~" for c in t) for _, t in rows
    ), "literal pinning assumes printable-ASCII text (Java/Python agree)"

    # simhash_docs: (id, simhash) for every doc
    sim_rows = [(did, simhash(normalize(t))) for did, t in rows]

    # minhash_pairs_docs: num_perm=128 bands=32 threshold=0.5 seed=7
    rng = np.random.RandomState(7)
    a = rng.randint(1, MERSENNE, size=128, dtype=np.int64).tolist()
    b = rng.randint(0, MERSENNE, size=128, dtype=np.int64).tolist()
    docs = [(did, shingles3(normalize(t))) for did, t in rows]
    sigs = {did: minhash_sig(sh, a, b) for did, sh in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in sigs.items():
        for band in range(32):
            key = ",".join(str(v) for v in sig[band * 4:band * 4 + 4])
            buckets.setdefault((band, xxh64_i64(key)), []).append(did)
    assert max(len(v) for v in buckets.values()) <= 10_000, "skew cap hit"
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, x in enumerate(ids):
            for y in ids[i + 1:]:
                cand.add((x, y))
    shing = {did: set(sh) for did, sh in docs}
    pair_rows = []
    for ia, ib in sorted(cand):
        inter = len(shing[ia] & shing[ib])
        union = len(shing[ia] | shing[ib])
        jac = inter / union
        if jac >= 0.5:
            pair_rows.append((ia, ib, round_half_up6(jac)))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "crawler_to_md_spark", "_xxhash_fixture.py",
    )
    with open(out, "w") as f:
        f.write('"""GENERATED by tools/gen_xxhash_literals.py — do not'
                ' edit.\n\nPinned expected outputs of the xxhash64-based'
                ' sketch queries at the\ndriver correctness scale'
                ' (sf0.01 documents), computed by a pure-Python\nXXH64 +'
                ' plain-int sketch pipeline fully independent of Spark'
                ' (see the\ngenerator docstring for the'
                ' independence argument)."""\n\n')
        f.write("# simhash_docs: (id, simhash)\nSIMHASH_XX_ROWS = [\n")
        for did, fp in sim_rows:
            f.write(f"    ({did}, {fp}),\n")
        f.write("]\n\n")
        f.write("# minhash_pairs_docs: (id_a, id_b, jaccard)\n"
                "MINHASH_XX_PAIR_ROWS = [\n")
        for ia, ib, jac in pair_rows:
            f.write(f"    ({ia}, {ib}, {jac!r}),\n")
        f.write("]\n")
    print(f"wrote {len(sim_rows)} simhash + {len(pair_rows)} pair rows"
          f" -> {out}")


if __name__ == "__main__":
    main()
