"""URL-seen set: partitioned bloom-filter shards + exact anti-join backing.

The reference's seen-set is the SQLite primary key on links.url with
INSERT OR IGNORE (database_manager.py:75-78) — an O(log n) B-tree probe per
candidate. At a 10^10-URL frontier the Spark equivalent is a shuffle
anti-join on a 64-bit key; the bloom layer below prunes the
overwhelmingly-duplicate candidate stream BEFORE that shuffle
(north_rule: "partitioned bloom/cuckoo-filter URL-seen set (broadcast
shards merged via treeReduce)").

Design:
- P shards keyed by ``pmod(url_hash, P)``. Each shard is an m-bit numpy
  bit array; k probe positions are derived from the 64-bit url_hash by
  splitmix64 remixing (vectorized numpy — no per-row Python).
- Build runs DISTRIBUTED via ``applyInPandas`` over the shard key: every
  shard's bits are OR-folded from its partition's hashes on executors and
  only the P small bitmaps travel to the driver (the treeReduce-merge
  shape; with P=64, m=2^23 that is 64 MiB total for ~10^8 URLs/shard).
- Incremental: each wave ORs the new URLs' bitmaps into the held shards
  (bloom unions are exact), persisted alongside the checkpoint manifest so
  resume skips the rebuild.
- Probe is a broadcast pandas UDF: candidates flagged "maybe-seen" go to
  the EXACT anti-join; "definitely-new" skip it. Bloom false positives
  therefore cost a join probe, never a dropped URL — exact parity with the
  reference's PK semantics is preserved by construction (SURVEY.md J1).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPLITMIX_CONSTS = (
    0x9E3779B97F4A7C15,
    0xBF58476D1CE4E5B9,
    0x94D049BB133111EB,
    0xD6E8FEB86659FD93,
    0xA3B195354A39B70D,
)
_MASK64 = (1 << 64) - 1


def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) probe positions from int64 hashes via splitmix64 remix rounds.
    Vectorized uint64 arithmetic; deterministic."""
    h = hashes.astype(np.uint64)
    out = np.empty((k, h.shape[0]), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            z = (h + np.uint64((i + 1) * _SPLITMIX_CONSTS[0] & _MASK64))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(_SPLITMIX_CONSTS[1])
            z = (z ^ (z >> np.uint64(27))) * np.uint64(_SPLITMIX_CONSTS[2])
            z = z ^ (z >> np.uint64(31))
            out[i] = z % np.uint64(m_bits)
    return out


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, (pos >> 3).astype(np.int64),
                     (1 << (pos & np.uint64(7))).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(k, n) positions -> (n,) all-bits-set boolean."""
    byte_idx = (pos >> 3).astype(np.int64)
    bit_msk = (1 << (pos & np.uint64(7))).astype(np.uint8)
    hit = (bits[byte_idx] & bit_msk) != 0
    return hit.all(axis=0)


class BloomSeenSet:
    """P-sharded bloom filter over int64 url_hash values."""

    def __init__(self, num_shards: int = 16, bits_per_shard: int = 1 << 22,
                 num_hashes: int = 5):
        self.P = num_shards
        self.m = bits_per_shard
        self.k = num_hashes
        self.shards = np.zeros((self.P, self.m // 8), dtype=np.uint8)
        self._bc = None          # cached broadcast of current shard state
        self._bc_dirty = True

    # -- build / update ------------------------------------------------------

    def add_distributed(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """OR new hashes into the shards. Bitmaps are built per-shard on
        executors (applyInPandas over pmod(hash, P)); the driver only ORs
        P small blobs (the treeReduce merge step)."""
        P, m, k = self.P, self.m, self.k
        schema = T.StructType([
            T.StructField("shard", T.IntegerType()),
            T.StructField("bits", T.BinaryType()),
        ])

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(m // 8, dtype=np.uint8)
            h = pdf["h"].to_numpy(dtype=np.int64)
            _set_bits(bits, _positions(h, k, m))
            return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                                 "bits": [bits.tobytes()]})

        blobs = (
            df.select(
                F.pmod(F.col(hash_col), F.lit(P)).cast("int").alias("shard"),
                F.col(hash_col).alias("h"),
            )
            .groupBy("shard")
            .applyInPandas(build, schema)
            .collect()
        )
        for row in blobs:
            self.shards[row["shard"]] |= np.frombuffer(row["bits"], dtype=np.uint8)
        self._bc_dirty = True

    # -- probe ---------------------------------------------------------------

    def maybe_seen_udf(self, spark: SparkSession):
        """Vectorized membership probe as a pandas UDF over (hash) batches.
        The shard array rides to executors via broadcast, re-broadcast only
        when the filter state changed since the last probe (each broadcast
        costs shard_bytes x workers in worker-side deserialization)."""
        if self._bc_dirty or self._bc is None:
            if self._bc is not None:
                self._bc.unpersist()
            self._bc = spark.sparkContext.broadcast(self.shards)
            self._bc_dirty = False
        bc = self._bc
        P, m, k = self.P, self.m, self.k

        @F.pandas_udf(T.BooleanType())
        def probe(h: pd.Series) -> pd.Series:
            arr = h.to_numpy(dtype=np.int64)
            shard_ids = (arr % P + P) % P
            pos = _positions(arr, k, m)
            shards = bc.value
            out = np.zeros(arr.shape[0], dtype=bool)
            for s in np.unique(shard_ids):
                sel = shard_ids == s
                out[sel] = _test_bits(shards[s], pos[:, sel])
            return pd.Series(out)

        return probe

    # -- persistence (checkpoint integration) --------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # uncompressed: the save runs once per wave as part of the
        # checkpoint commit; zlib over tens of MB would serialize the wave
        np.savez(path, shards=self.shards,
                 meta=np.array([self.P, self.m, self.k]))

    @classmethod
    def load(cls, path: str) -> "BloomSeenSet":
        data = np.load(path)
        P, m, k = (int(x) for x in data["meta"])
        obj = cls(P, m, k)
        obj.shards = data["shards"].copy()
        return obj


def anti_join_new(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    bloom: BloomSeenSet | None = None,
    confirm_col: str = "url",
    persist_registry: list | None = None,
) -> DataFrame:
    """Candidates not present in the seen-set (reference INSERT OR IGNORE,
    database_manager.py:75-78 — SURVEY.md J1).

    With a bloom: definitely-new rows (bloom miss) bypass the shuffle
    entirely; only maybe-seen rows pay the exact anti-join. The union of
    both branches is exact — bloom FPs are re-checked, never dropped.
    Joining on (key, confirm_col) string-confirms against 64-bit hash
    collisions when confirm_col is available on both sides.
    """
    join_keys = [key] + (
        [confirm_col]
        if confirm_col in candidates.columns and confirm_col in seen.columns
        else []
    )
    if bloom is None:
        return candidates.join(seen.select(*join_keys), join_keys, "left_anti")
    probe = bloom.maybe_seen_udf(candidates.sparkSession)
    # persist the flagged stream: both branches below consume it, and the
    # probe (an Arrow UDF pass) must run once, not once per branch. The
    # caller passes ``persist_registry`` to unpersist it after its last
    # action (a wave caches ~selected*branching candidate rows here —
    # leaking that across waves churns executor memory).
    flagged = candidates.withColumn("_maybe_seen", probe(F.col(key))).persist()
    if persist_registry is not None:
        persist_registry.append(flagged)
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    # inverted confirm shape: a direct `maybe LEFT ANTI seen` puts the
    # (huge, growing) seen-set on the BUILD side, forcing a full seen
    # shuffle every call. Instead: (1) semi-join seen against the small
    # maybe probe — build side is maybe, so AQE broadcasts it and the
    # seen-set is only SCANNED, never shuffled; (2) anti-join maybe
    # against the (small) confirmed-duplicate set — build side small
    # again. Under a dup storm (large maybe set) AQE falls back to a
    # shuffle join on its own; the result set is identical either way.
    confirmed_dup = seen.select(*join_keys).join(
        maybe.select(*join_keys), join_keys, "left_semi"
    )
    confirmed_new = maybe.join(confirmed_dup, join_keys, "left_anti")
    return definitely_new.unionByName(confirmed_new)
