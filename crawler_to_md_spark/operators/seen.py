"""URL-seen set: bloom-filter prefilter + exact anti-join backing.

The reference's seen-set is the SQLite primary key on links.url with
INSERT OR IGNORE (database_manager.py:75-78) — an O(log n) B-tree probe per
candidate. At a 10^10-URL frontier the Spark equivalent is a shuffle
anti-join on a 64-bit key; the bloom layer below prunes the
overwhelmingly-duplicate candidate stream BEFORE that shuffle
(north_rule: "partitioned bloom/cuckoo-filter URL-seen set (broadcast
shards merged via treeReduce)").

Two interchangeable implementations (same duck-type API —
``add_distributed / probe / save / load``):

- ``JvmBloomSeenSet`` (default): the filter is Spark's own sketch
  ``BloomFilter``. The BUILD is one JVM aggregation
  (``BloomFilterAggregate``): each task builds a partial filter over its
  partition and the partials are OR-merged up the agg tree — exactly the
  "per-partition shards merged via treeReduce" shape, with zero Python.
  The PROBE is the ``might_contain`` catalyst expression over the
  serialized filter literal: it runs INSIDE whole-stage codegen, so the
  hot candidate stream never pays a Python/Arrow round-trip (the r3
  pandas-UDF probe was the wave's last remaining Arrow hop). The blob
  rides to executors with the broadcast task binary, once per stage.
- ``BloomSeenSet`` (numpy fallback): P shards keyed by
  ``pmod(url_hash, P)``, built via ``applyInPandas`` per shard, probed by
  a broadcast pandas UDF. Kept as the portability fallback (the JVM path
  touches catalyst internals via py4j: ``BloomFilterAggregate`` /
  ``BloomFilterMightContain`` are not in the public function registry)
  and as the reader for stores whose persisted bloom predates the JVM
  format.

Both are PREFILTERS only: candidates flagged "maybe-seen" go to the EXACT
anti-join; "definitely-new" skip it. Bloom false positives therefore cost
a join probe, never a dropped URL — exact parity with the reference's PK
semantics is preserved by construction (SURVEY.md J1).

Scale note (10^10 frontier): a broadcast filter covering 10^10 keys is
~20 GB — too big to ship whole. The production shape keeps per-hash-range
filter shards resident on the executors that own the range (candidates
are already shuffled by url_hash for the exact join, so each task probes
only its range's shard); both classes here keep the shard/merge structure
that design needs, sized down to the sandbox.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
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

    def add_distributed(self, df: DataFrame, hash_col: str = "url_hash",
                        fold_partitions: int | None = None,
                        n_rows: int | None = None) -> None:
        """OR new hashes into the shards. Bitmaps are built per-shard on
        executors (applyInPandas over pmod(hash, P)); the driver only ORs
        P small blobs (the treeReduce merge step). ``fold_partitions`` /
        ``n_rows`` are accepted for JvmBloomSeenSet signature parity (the
        fixed-size sharded build has no use for either)."""
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

    def probe(self, spark: SparkSession, col: Column) -> Column:
        """Unified probe API (see JvmBloomSeenSet.probe): boolean
        maybe-seen Column for a hash Column."""
        return self.maybe_seen_udf(spark)(col)

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


_JBLOOM_MAGIC = b"JBLOOM1\n"


class JvmBloomSeenSet:
    """Seen-set bloom filter held as Spark's JVM sketch ``BloomFilter``.

    Build = one JVM aggregation per delta (``BloomFilterAggregate``:
    per-partition partial filters, OR-merged — the treeReduce shape);
    probe = the ``might_contain`` expression over the serialized filter
    (whole-stage codegen, no Python worker). Serialized-blob merging is
    exact (bloom union), so per-wave deltas fold into the held filter
    incrementally and persist with the checkpoint for resume.

    ``capacity`` and ``num_bits`` are FIXED for the filter's lifetime and
    must be identical for every delta build — Spark derives the hash count
    from (capacity, num_bits) and refuses to merge incompatible sketches.

    GROWTH (``growable=True``): a filter sized for the full corpus from
    wave 1 is pure overhead while the frontier is small — the serialized
    blob rides in every stage's task binary and its hex rendering is
    rebuilt for every plan-description event, so a fixed multi-MB filter
    taxes every tiny early wave with multi-MB serialization. A growable
    filter starts at ``num_bits`` and is REBUILT at ~4x headroom whenever
    the added-key count crosses half capacity (amortized-doubling, like a
    growth array): the owner (CrawlEngine) watches ``needs_grow()`` and
    re-adds the full frontier — one narrow column scan per doubling,
    O(log n) rebuilds total, and every wave ships a filter sized for the
    data it actually holds. An EMPTY growable filter auto-resizes to its
    first delta inside ``add_distributed`` (covers recover/rebuild paths
    without a pre-count).
    """

    _BITS_PER_KEY = 16  # fp ~5e-4 at capacity; degrades gracefully beyond

    def __init__(self, spark: SparkSession, num_bits: int = 1 << 25,
                 capacity: int | None = None, growable: bool = False):
        self.spark = spark
        self.num_bits = int(num_bits)
        # 16 bits/key at capacity -> fp ~5e-4; beyond capacity the fp rate
        # degrades gracefully and FPs only cost exact-join probes
        self.capacity = int(capacity if capacity is not None
                            else max(1, num_bits // self._BITS_PER_KEY))
        self.growable = bool(growable)
        self.n_added = 0  # exact added-row count (drives needs_grow)
        jvm = spark.sparkContext._jvm
        self._jbf = jvm.org.apache.spark.util.sketch.BloomFilter.create(
            self.capacity, self.num_bits
        )
        self._blob: bytes | None = None  # serialized cache for probe/save
        self._save_path: str | None = None  # last save()d file
        self._file_blob_valid = False  # file reflects current filter state

    # -- internals -----------------------------------------------------------

    def _jexpr(self, col: Column):
        jvm = self.spark.sparkContext._jvm
        return jvm.org.apache.spark.sql.classic.ExpressionUtils.expression(
            col._jc
        )

    def _col(self, jexpr) -> Column:
        from pyspark.sql.classic.column import Column as _CCol

        jvm = self.spark.sparkContext._jvm
        return _CCol(
            jvm.org.apache.spark.sql.classic.ExpressionUtils.column(jexpr)
        )

    def serialized(self) -> bytes:
        if self._blob is None:
            # py4j moves byte[] at only ~13 MB/s (measured: 0.9s for a
            # 12 MB filter), so prefer reading the blob back from the
            # last save()d file (JVM wrote it, page-cache read ~ms) and
            # fall back to the direct JVM pull only when no fresh file
            # exists (standalone/test use)
            if self._file_blob_valid and self._save_path:
                try:
                    self._blob = self._read_blob_from_file(self._save_path)
                except Exception:
                    self._blob = None
            if self._blob is None:
                jvm = self.spark.sparkContext._jvm
                baos = jvm.java.io.ByteArrayOutputStream()
                self._jbf.writeTo(baos)
                self._blob = bytes(baos.toByteArray())
        return self._blob

    @staticmethod
    def _read_blob_from_file(path: str) -> bytes:
        with open(path, "rb") as f:
            magic = f.read(len(_JBLOOM_MAGIC))
            if magic != _JBLOOM_MAGIC:
                raise ValueError("not a JVM bloom file")
            (mlen,) = struct.unpack("<q", f.read(8))
            f.read(mlen)
            return f.read()

    def _merge_blob(self, blob: bytes) -> None:
        jvm = self.spark.sparkContext._jvm
        delta = jvm.org.apache.spark.util.sketch.BloomFilter.readFrom(
            jvm.java.io.ByteArrayInputStream(bytearray(blob))
        )
        self._jbf.mergeInPlace(delta)
        self._blob = None
        self._file_blob_valid = False

    # -- build / update ------------------------------------------------------

    def _resize(self, n_keys: int) -> None:
        """Re-create the (empty) filter for ``n_keys`` current keys:
        16 bits/key of storage (fp ~5e-3), with the growth TRIGGER
        (capacity) at 4x — the next rebuild happens when the key count has
        doubled, by which point the filter has degraded to 8 bits/key
        (fp ~3% — bounded, and an FP only costs an exact-join probe).
        Storage is deliberately lean: the serialized blob is embedded in
        EVERY stage's task-binary broadcast, so 2x the bits taxes every
        stage of every wave, while the FP delta only adds a few percent
        of candidates to the (cheap, broadcast-built) exact anti-join.
        Discards contents — only valid on an empty filter or before a
        full re-add."""
        n = max(1, int(n_keys))
        self.num_bits = max(1 << 13, 16 * n)
        self.capacity = 4 * n
        jvm = self.spark.sparkContext._jvm
        self._jbf = jvm.org.apache.spark.util.sketch.BloomFilter.create(
            self.capacity, self.num_bits
        )
        self._blob = None
        self._file_blob_valid = False
        self.n_added = 0

    def needs_grow(self) -> bool:
        """True when the owner should rebuild this filter from the full
        key set (added keys crossed half capacity)."""
        return self.growable and 2 * self.n_added > self.capacity

    def _raise_runtime_filter_ceilings(self, session) -> None:
        """Spark's bloom builders SILENTLY CLAMP their size arguments to
        the runtime-filter conf ceilings (``Math.min`` in
        ``BloomFilterAggregate``, which since Spark 4 also backs
        ``Dataset.stat.bloomFilter``) — a clamped delta derives a
        DIFFERENT hash count than the held filter and ``mergeInPlace``
        throws ``IncompatibleMergeException``. The defaults
        (maxNumItems 4e6, maxNumBits 2^26) are exactly big enough for a
        1M-URL crawl's grown filter (capacity 4e6), which is why this
        only surfaced on the 4M-page e2e-convergence run. Raise the
        ceilings to this filter's size on EVERY delta-build path."""
        conf = session.conf
        for key, val in (
            ("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
             self.capacity),
            ("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
             self.num_bits),
        ):
            try:
                cur = int(conf.get(key))
            except Exception:
                cur = 0
            if cur < val:
                conf.set(key, str(val))

    def _agg_blob(self, src: DataFrame):
        """One JVM agg job over pre-shaped ``h`` rows: (serialized delta
        filter, exact row count). The count shares the job — no second
        pass."""
        jvm = self.spark.sparkContext._jvm
        self._raise_runtime_filter_ceilings(src.sparkSession)
        agg = jvm.org.apache.spark.sql.catalyst.expressions.aggregate.\
            BloomFilterAggregate(
                self._jexpr(F.col("h")),
                self._jexpr(F.lit(self.capacity).cast("long")),
                self._jexpr(F.lit(self.num_bits).cast("long")),
            )
        row = src.agg(
            self._col(agg.toAggregateExpression()).alias("b"),
            F.count(F.lit(1)).alias("c"),
        ).collect()[0]
        return row["b"], int(row["c"])

    def add_distributed(self, df: DataFrame, hash_col: str = "url_hash",
                        fold_partitions: int | None = None,
                        n_rows: int | None = None) -> None:
        """OR a delta of hashes into the filter. ``fold_partitions``
        coalesces the input first — each task's partial buffer is a
        full-size filter, so fewer tasks = less partial shuffle volume
        (the scan side stays cheap: a narrow long column).

        With ``n_rows`` (the caller's exact delta row count, which the
        engine's wave loop always has from the rank step): the delta is
        built with ``Dataset.stat().bloomFilter`` — the JVM object
        reference comes back over py4j and ``mergeInPlace`` runs entirely
        JVM-side, so the delta blob NEVER crosses the py4j socket (which
        moves byte[] at only ~13 MB/s; at a 6M-key filter the collect +
        push-back cost ~0.6s of driver wall per wave). stat-built and
        agg-built filters are bit-compatible (both putLong with the hash
        count derived from (capacity, num_bits)).

        Without ``n_rows``: one JVM agg job (``BloomFilterAggregate``
        partial filter per task, OR-merged) whose single pass also
        returns the exact row count; the blob rides through the driver.

        On an EMPTY growable filter whose first delta overflows half the
        capacity, the filter is resized for that delta and the (one) job
        re-run at the right size — so recover/rebuild paths need no
        pre-count."""
        src = df.select(F.col(hash_col).alias("h"))
        k = fold_partitions or min(
            8, self.spark.sparkContext.defaultParallelism
        )
        src = src.coalesce(k)
        if n_rows is not None:
            if n_rows <= 0:
                return
            if self.growable and self.n_added == 0 and 2 * n_rows > self.capacity:
                self._resize(n_rows)
            self._raise_runtime_filter_ceilings(src.sparkSession)
            jdelta = src._jdf.stat().bloomFilter(
                "h", self.capacity, self.num_bits
            )
            self._jbf.mergeInPlace(jdelta)
            self._blob = None
            self._file_blob_valid = False
            self.n_added += int(n_rows)
            return
        blob, cnt = self._agg_blob(src)
        if blob is None or cnt == 0:  # None <=> empty delta
            return
        if self.growable and self.n_added == 0 and 2 * cnt > self.capacity:
            self._resize(cnt)
            blob, cnt = self._agg_blob(src)
        self._merge_blob(bytes(blob))
        self.n_added += cnt

    # -- probe ---------------------------------------------------------------

    # above this size the blob enters the plan as a SCALAR SUBQUERY over a
    # one-row DataFrame instead of a literal: a multi-MB binary literal is
    # hex-rendered into EVERY plan-description string (one per AQE stage
    # event — at 8 MB that is a ~34M-char/68 MB string per event, enough
    # GC churn to 10x a wave), while a subquery prints as a schema-only
    # relation. Small blobs stay literals: the subquery costs one extra
    # (trivial) job per materializing action.
    _LITERAL_PROBE_MAX = 64 * 1024

    def probe(self, spark: SparkSession, col: Column) -> Column:
        """Boolean maybe-seen Column: ``might_contain(<filter>, col)``.
        Pure JVM codegen — no Python worker on the probe path (the r3
        pandas-UDF probe was the wave's last Arrow hop). The filter bytes
        ride as a literal when small, as a scalar subquery when large
        (class comment above) — Spark's own runtime-filter injection uses
        the same subquery shape for the same reason."""
        jvm = self.spark.sparkContext._jvm
        blob = bytearray(self.serialized())
        if len(blob) <= self._LITERAL_PROBE_MAX:
            bf_side = self._jexpr(F.lit(blob))
        else:
            # pandas-sourced one-row frame: the Arrow conversion path scans
            # JVM-side, while a list-of-tuples createDataFrame ships
            # pickled rows that cost a Python-worker launch (~1s) on EVERY
            # materializing action that executes the subquery
            blob_pdf = pd.DataFrame({"b": [bytes(blob)]})
            bf_side = self._jexpr(
                spark.createDataFrame(blob_pdf, "b binary").scalar()
            )
        expr = jvm.org.apache.spark.sql.catalyst.expressions.\
            BloomFilterMightContain(bf_side, self._jexpr(col))
        return self._col(expr)

    # -- persistence (checkpoint integration) --------------------------------

    def save(self, path: str) -> None:
        """Checkpoint the filter: Python writes the magic+meta header,
        then the JVM appends the blob straight to the file
        (``writeTo(FileOutputStream)``) — the bytes never cross py4j
        (~13 MB/s; a 12 MB filter cost ~1s per wave before this). When
        the Python-side ``_blob`` cache is already warm, writing it
        directly is cheaper than a JVM round trip."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        meta = json.dumps(
            {"num_bits": self.num_bits, "capacity": self.capacity,
             "n_added": self.n_added, "growable": self.growable}
        ).encode()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_JBLOOM_MAGIC)
            f.write(struct.pack("<q", len(meta)))
            f.write(meta)
            if self._blob is not None:
                f.write(self._blob)
        if self._blob is None:
            jvm = self.spark.sparkContext._jvm
            fos = jvm.java.io.FileOutputStream(tmp, True)  # append
            try:
                self._jbf.writeTo(fos)
            finally:
                fos.close()
        os.replace(tmp, path)
        self._save_path = path
        self._file_blob_valid = True

    @classmethod
    def load(cls, path: str, spark: SparkSession) -> "JvmBloomSeenSet":
        with open(path, "rb") as f:
            magic = f.read(len(_JBLOOM_MAGIC))
            if magic != _JBLOOM_MAGIC:
                raise ValueError("not a JVM bloom file")
            (mlen,) = struct.unpack("<q", f.read(8))
            meta = json.loads(f.read(mlen))
            blob = f.read()
        obj = cls(spark, num_bits=meta["num_bits"], capacity=meta["capacity"],
                  growable=bool(meta.get("growable", False)))
        # files written before growth tracking carry no n_added: assume
        # full (capacity) so a growable owner rebuilds to the right size
        # on its next growth check instead of silently never growing
        obj.n_added = int(meta.get("n_added", meta["capacity"]))
        obj._merge_blob(blob)
        # the file we just read IS the current state: probe/serialized can
        # reuse its blob (and _blob is already warm from this read)
        obj._blob = blob
        obj._save_path = path
        obj._file_blob_valid = True
        return obj


def new_seen_set(spark: SparkSession, num_shards: int = 16,
                 bits_per_shard: int = 1 << 21, impl: str = "jvm",
                 initial_bits: int | None = None):
    """Seen-set factory: JVM sketch filter by default (total bits =
    shards x bits/shard), numpy shard fallback when the catalyst internals
    aren't reachable (or ``impl='numpy'``). ``initial_bits`` switches the
    JVM filter to GROWABLE sizing: start that small, amortized-doubling
    rebuilds as keys accumulate (class docstring)."""
    if impl == "jvm":
        try:
            if initial_bits is not None:
                return JvmBloomSeenSet(spark, num_bits=initial_bits,
                                       growable=True)
            return JvmBloomSeenSet(spark, num_bits=num_shards * bits_per_shard)
        except Exception:  # py4j/internal-API unavailable -> numpy path
            pass
    return BloomSeenSet(num_shards, bits_per_shard)


def load_seen_set(path: str, spark: SparkSession):
    """Load a persisted seen-set, whichever format wrote it (JVM blob or
    legacy numpy npz). Returns None when the file is unreadable — callers
    must then REBUILD from the frontier (an unreadable bloom silently
    treated as empty would FALSE-NEGATIVE every seen URL and re-crawl the
    store)."""
    try:
        return JvmBloomSeenSet.load(path, spark)
    except (ValueError, OSError, KeyError):
        pass
    try:
        return BloomSeenSet.load(path)
    except Exception:
        return None


def anti_join_new(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    bloom=None,
    confirm_col: str = "url",
    persist_registry: list | None = None,
) -> DataFrame:
    """Candidates not present in the seen-set (reference INSERT OR IGNORE,
    database_manager.py:75-78 — SURVEY.md J1).

    With a bloom (``BloomSeenSet`` or ``JvmBloomSeenSet``): definitely-new
    rows (bloom miss) bypass the shuffle entirely; only maybe-seen rows
    pay the exact anti-join. The union of both branches is exact — bloom
    FPs are re-checked, never dropped. Joining on (key, confirm_col)
    string-confirms against 64-bit hash collisions when confirm_col is
    available on both sides.

    CACHE CONTRACT (bloom path only): this function ``persist()``s the
    probed candidate stream — both output branches consume it, and the
    probe + its upstream plan must run once, not once per branch. The
    cache is registered in ``persist_registry`` (pass a list and
    ``unpersist()`` every entry after the LAST action on the returned
    DataFrame); calling with ``persist_registry=None`` in a long-lived
    session LEAKS one cache entry of ~len(candidates) rows per call
    (acceptable only for run-once scripts/tests). Leak-checked by
    tests/test_seen_politeness.py::test_anti_join_persist_registry_no_leak.
    """
    join_keys = [key] + (
        [confirm_col]
        if confirm_col in candidates.columns and confirm_col in seen.columns
        else []
    )
    if bloom is None:
        return candidates.join(seen.select(*join_keys), join_keys, "left_anti")
    probe_col = bloom.probe(candidates.sparkSession, F.col(key))
    flagged = candidates.withColumn("_maybe_seen", probe_col).persist()
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
