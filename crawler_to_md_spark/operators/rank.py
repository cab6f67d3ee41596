"""Distributed deterministic global ranking.

Spark has no implicit rowid (the reference leans on SQLite rowid for crawl
and export order — database_manager.py:104,142), so observable order is
materialized as an explicit ``discovery_rank`` column. A naive
``row_number() over (ORDER BY ...)`` funnels ALL rows through ONE partition
— unacceptable at frontier scale. This helper ranks in three narrow steps:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order key
   (range shuffle; ascending ranges land in ascending partition ids);
2. one cheap JVM-side job counting rows per partition
   (``groupBy(spark_partition_id()).count()``) -> per-partition offsets;
3. an Arrow ``mapInPandas`` pass adding ``offset[pid] + local_index``.

The input is persisted between steps 2 and 3 so both jobs see identical
partitioning. Rank is dense, 0-based (+ ``start``), and deterministic when
the order key is a total order (callers pass unique key tuples).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add a dense global rank column ordered by ``order_cols``.

    Returns (ranked_df, total_rows). The DataFrame is MATERIALIZED
    (persisted, count-forced); the row total falls out of the offset
    computation for free — callers need no extra .count() job.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = part.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    offsets: dict[int, int] = {}
    acc = start
    for pid, cnt in sorted((r["pid"], r["count"]) for r in sizes):
        offsets[pid] = acc
        acc += cnt
    bc = spark.sparkContext.broadcast(offsets)
    # fresh StructType — .add() would mutate the DataFrame's cached schema
    schema = StructType(
        list(part.schema.fields) + [StructField(rank_col, LongType(), False)]
    )

    def add_rank(batches):
        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf[rank_col] = np.arange(base + seen, base + seen + len(pdf),
                                      dtype=np.int64)
            seen += len(pdf)
            yield pdf

    ranked = part.mapInPandas(add_rank, schema).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ranked.count()  # materialize while `part` is pinned
    part.unpersist()
    return ranked, acc - start
