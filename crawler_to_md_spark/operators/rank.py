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


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
    bucket_col=None,
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
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    if bucket_col is not None:
        # each bucket lands wholly in one partition (hash by bucket); the
        # leading sort key keeps its rows contiguous there, so the offset
        # accounting below works exactly as for range partition ids
        part = (
            df.withColumn("_pid", bucket_col.cast("int"))
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
    for pid, cnt in sorted((r["_pid"], r["count"]) for r in sizes):
        offsets[pid] = acc
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
