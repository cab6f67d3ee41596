"""Distributed deterministic global ranking.

Spark has no implicit rowid (the reference leans on SQLite rowid for crawl
and export order — database_manager.py:104,142), so observable order is
materialized as an explicit ``discovery_rank`` column. A naive
``row_number() over (ORDER BY ...)`` funnels ALL rows through ONE partition
— unacceptable at frontier scale. This helper ranks in three narrow steps:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order key
   (range shuffle; ascending ranges land in ascending partition ids),
   with the partition id FROZEN into a ``_pid`` column at cache
   materialization time;
2. one cheap job counting rows per ``_pid`` -> per-partition offsets;
3. a lazy Arrow ``mapInPandas`` pass adding ``offset[_pid] + local_index``.

Step 3 keys off the frozen ``_pid`` column, NOT TaskContext.partitionId():
downstream plan changes (``coalesce`` on write, AQE) may merge partitions
into one task, where the task's partition id would mis-rank every merged
partition. Rows of each parent partition stay contiguous and ordered
through a coalesce, so a running per-pid counter reproduces the exact
local index. Rank is dense, 0-based (+ ``start``), deterministic when the
order key is a total order (callers pass unique key tuples).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def murmur3_hash_int32(x: int, seed: int = 42) -> int:
    """Spark's ``Murmur3Hash`` of one IntegerType value (Murmur3 x86_32,
    ``hashInt``), returned as the SIGNED 32-bit value Spark produces.
    Replicated here so the driver can predict, without a Spark job, which
    shuffle partition ``repartition(n, col)`` sends an int key to:
    ``partition = pmod(murmur3_hash_int32(key), n)``. Pinned against
    ``F.hash`` by tests/test_seen_politeness.py::test_murmur3_matches_spark."""
    m = 0xFFFFFFFF
    k1 = (x & m) * 0xCC9E2D51 & m
    k1 = ((k1 << 15) | (k1 >> 17)) & m
    k1 = k1 * 0x1B873593 & m
    h1 = (seed & m) ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & m
    h1 = (h1 * 5 + 0xE6546B64) & m
    h1 ^= 4  # total byte length
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & m
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


_PERFECT_KEYS: dict[int, list[int]] = {}


def perfect_partition_keys(n: int) -> list[int]:
    """``n`` small ints ``keys[p]`` with ``pmod(murmur3(keys[p]), n) == p``
    — "hash-perfect" keys: repartitioning on ``keys[p]`` places a row in
    EXACTLY partition ``p``. Hashing n arbitrary ids into n partitions
    leaves ~37% of partitions empty and stacks 2-3 ids on others
    (multinomial occupancy) — per-partition loads of 0-3x the mean that
    every downstream stage inherits as stragglers. Perfect keys make
    hash partitioning behave like explicit placement. Found by scanning
    j=0,1,2,... (coupon-collector, ~n ln n tries); memoized per n."""
    if n not in _PERFECT_KEYS:
        keys: dict[int, int] = {}
        j = 0
        while len(keys) < n:
            p = murmur3_hash_int32(j) % n
            if p not in keys:
                keys[p] = j
            j += 1
        _PERFECT_KEYS[n] = [keys[p] for p in range(n)]
    return _PERFECT_KEYS[n]


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
    bucket_col=None,
    num_buckets: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Add a dense global rank column ordered by ``order_cols``.

    Returns (ranked_df, total_rows, pinned_input). ``ranked_df`` is a LAZY
    Arrow map over the pinned (persisted) range-partitioned input — cheap
    to consume multiple times; the row total falls out of the offset
    computation for free. The CALLER unpersists ``pinned_input`` after all
    consumers have run.

    ``bucket_col``: optional Column holding a PRECOMPUTED range-bucket id
    that is monotonically non-decreasing in the ``order_cols`` total order
    (callers that know the key bounds can derive it, e.g. the crawl engine
    knows each wave's src_rank stride). When given, partitioning is ONE
    hash shuffle on the bucket id. Without it, ``repartitionByRange`` is
    used — whose RangePartitioner runs a SAMPLING pass that recomputes the
    whole upstream plan a second time (scrape UDFs, joins, and all): fine
    for one-off queries, a 2x tax in the crawl hot loop.

    ``num_buckets``: bucket_col's exclusive upper bound (values must lie in
    ``[0, num_buckets)``). When given, contiguous bucket ranges are mapped
    onto the ``n`` partitions via hash-PERFECT keys (perfect_partition_keys)
    so every partition receives exactly ``num_buckets / n`` equal-span
    buckets. Without it, bucket ids are raw-hashed into partitions —
    multinomial occupancy: with 4n buckets the fullest partition carries
    ~1.5-2x the mean, and that skew propagates into the pinned cache's
    partitions, the window-rank stage, AND the delta files a caller writes
    from it (whose read-back splits then straggle every stage of the NEXT
    wave). Equal partitions are the difference between the crawl's
    dominant stage scaling by cores or by its slowest bin.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    slot_order: dict[int, int] | None = None
    if bucket_col is not None:
        # each bucket lands wholly in one partition; the leading sort key
        # keeps its rows contiguous there, so the offset accounting below
        # works exactly as for range partition ids. With num_buckets the
        # partition id column IS the perfect key of the bucket's slot
        # (slot = bucket * n // num_buckets): one value per partition,
        # placed exactly, equal bucket spans per partition.
        pid = bucket_col.cast("int")
        if num_buckets is not None:
            keys = perfect_partition_keys(n)
            slot_keys = [keys[g * n // num_buckets] for g in range(num_buckets)]
            pid = F.element_at(
                F.array(*[F.lit(k) for k in slot_keys]), pid + 1
            )
            # offset accumulation below must walk partitions in ORDER-KEY
            # order, which for perfect keys is slot order, not numeric order
            seen_keys: dict[int, int] = {}
            for k in slot_keys:
                seen_keys.setdefault(k, len(seen_keys))
            slot_order = seen_keys
        part = (
            df.withColumn("_pid", pid)
            .repartition(n, F.col("_pid"))
            .sortWithinPartitions("_pid", *order_cols)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    else:
        part = (
            df.repartitionByRange(n, *order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    # this count job materializes the cache, freezing _pid per row
    sizes = part.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = start
    if bucket_col is not None and slot_order is not None:
        order_key = lambda p: slot_order[p]  # noqa: E731 — slot order
    else:
        order_key = lambda p: p  # noqa: E731 — numeric pid == key order
    for pid_v, cnt in sorted(
        ((r["_pid"], r["count"]) for r in sizes),
        key=lambda t: order_key(t[0]),
    ):
        offsets[pid_v] = acc
        acc += cnt

    if bucket_col is not None:
        # JVM-only rank: the cache is hash-partitioned on _pid and sorted
        # by (_pid, order), so the window needs NO exchange and NO sort —
        # and no Arrow round-trip (the mapInPandas below costs ~0.5-1s of
        # Python-stage overhead per consuming job in the crawl hot loop)
        if offsets:
            omap = F.create_map(
                *[F.lit(v) for kv in offsets.items() for v in kv]
            )
        else:
            omap = F.create_map()
        w = Window.partitionBy("_pid").orderBy(*order_cols)
        ranked = (
            part.withColumn(
                rank_col,
                (F.element_at(omap, F.col("_pid"))
                 + F.row_number().over(w) - 1).cast("long"),
            )
            .drop("_pid")
        )
        return ranked, acc - start, part

    bc = spark.sparkContext.broadcast(offsets)
    out_fields = [f for f in part.schema.fields if f.name != "_pid"]
    schema = StructType(out_fields + [StructField(rank_col, LongType(), False)])

    def add_rank(batches):
        offs = bc.value
        seen: dict[int, int] = {}
        for pdf in batches:
            pids = pdf["_pid"].to_numpy()
            ranks = np.empty(len(pdf), dtype=np.int64)
            if len(pdf):
                # contiguous segments of equal pid (parents stay contiguous
                # and ordered through any downstream coalesce)
                cuts = np.flatnonzero(np.diff(pids)) + 1
                bounds = np.concatenate(([0], cuts, [len(pdf)]))
                for i in range(len(bounds) - 1):
                    lo, hi = int(bounds[i]), int(bounds[i + 1])
                    pid = int(pids[lo])
                    base = offs.get(pid, 0) + seen.get(pid, 0)
                    ranks[lo:hi] = np.arange(base, base + (hi - lo))
                    seen[pid] = seen.get(pid, 0) + (hi - lo)
            out = pdf.drop(columns=["_pid"])
            out[rank_col] = ranks
            yield out

    ranked = part.mapInPandas(add_rank, schema)
    return ranked, acc - start, part
