"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship relational query on sf0.001; ``queries`` /
``oracle_sql`` expose the full operator suite (see
crawler_to_md_spark/queries.py for the SURVEY.md §2 coverage map).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawler_to_md_spark.queries import ORACLES, QUERIES, q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
