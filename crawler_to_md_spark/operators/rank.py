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
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Add a dense global rank column ordered by ``order_cols``.

    Returns (ranked_df, total_rows, pinned_input). ``ranked_df`` is a LAZY
    Arrow map over the pinned (persisted) range-partitioned input — cheap
    to consume multiple times; the row total falls out of the offset
    computation for free. The CALLER unpersists ``pinned_input`` after all
    consumers have run.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
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
