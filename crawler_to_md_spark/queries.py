"""The oracle-checked query suite (driver contract: __spark_entry__).

Each entry: a Spark implementation (spark, sf_dir) -> DataFrame and, where
ANSI-SQL-expressible, a DuckDB oracle over the same parquet views. Column
names/aliases match EXACTLY between both sides; float aggregates are
rounded identically on both sides to absorb summation-order ulps.

Coverage mapping (SURVEY.md §2 -> queries):
- frontier/seen-set semantics     -> first_event_per_user, seen_antijoin
- politeness window quotas        -> topk_per_user
- crawl metrics aggregation       -> docs_by_source, events_hourly
- order-preserving dedup (T9/T14) -> dedup_exact_docs, first_event_per_user
- relational analytics core       -> q1/q3/q5 (TPC-H-shaped)
- sessionization (streaming-ish)  -> events_sessionize
- training-pipeline text ops      -> token_stats, quality_per_doc,
                                     lang_id_eval, fingerprint_docs,
                                     jaccard_pairs_docs
- similarity search               -> embedding_topk, embedding_pairs
- crawl engine end-to-end         -> crawl_pages / crawl_links, oracle-
                                     checked against a DuckDB wave-BFS
                                     (unrolled CTEs) over the same graph;
                                     page CONTENT byte-exactness is
                                     parity-tested against the sequential
                                     simulator in tests/test_crawl_parity.py
- sketch dedup (minhash/simhash)  -> rows-only + pytest oracles
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .crawl.corpus import synth_corpus
from .crawl.engine import CrawlConfig, CrawlEngine
from .operators.cluster import cluster_assignments, keep_canonical
from .operators.dedup import (
    exact_dedup,
    exact_jaccard_pairs,
    hamming_neardup_clusters,
    hamming_neardup_pairs,
    md5_token_hash,
    minhash_lsh_pairs,
    minhash_signatures,
    phash_neardup_pairs,
    simhash_fingerprints,
)
from .operators.textstats import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SCAN_META: dict[str, tuple[int | None, int]] = {}


def _scan_meta(path: str) -> tuple[int | None, int]:
    """(row_groups, rows) of a parquet file/dir from the footer(s) —
    driver-side metadata only, cached per path."""
    got = _SCAN_META.get(path)
    if got is not None:
        return got
    try:
        import os

        import pyarrow.parquet as pq

        files = (
            [path] if os.path.isfile(path)
            else [
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        )
        rgs = rows = 0
        for f in files:
            meta = pq.ParquetFile(f).metadata
            rgs += meta.num_row_groups
            rows += meta.num_rows
        out: tuple[int | None, int] = (rgs, rows)
    except Exception:
        out = (None, 0)
    _SCAN_META[path] = out
    return out


def _t_heavy(spark: SparkSession, sf_dir: str, name: str, key: str,
             min_rows_factor: int = 32) -> DataFrame:
    """Table read for COMPUTE-HEAVY consumers (regex/shingle/UDF per row):
    when the parquet layout cannot feed every core — parquet splits cannot
    go below row-group boundaries, and the testdata tables are one file
    with ONE row group, so scan-rooted stages run on a single core no
    matter the split config — hash-repartition on ``key`` immediately
    after the read (guide §2.5 "input skew ... repartition immediately
    after the read"). Keyed, not round-robin: round-robin pays a local
    sort per task (sortBeforeRepartition) for retry determinism; a
    deterministic id key needs none and spreads uniformly.

    Scale-adaptive, not constant: the shuffle is added ONLY when the
    row-group count is below the session's core count and there are
    enough rows to amortize it (>= 32/partition). At production scale a
    100 TB table has orders of magnitude more row groups than cores, so
    this is a no-op there — it exists for exactly the
    one-giant-row-group layout where Spark cannot manufacture scan
    parallelism. Purely relational scans (lineitem/orders/events) are
    NOT routed through this: their per-row compute is parquet decode
    itself, and a measured A/B (OPTIMIZATION_r06.md) showed the extra
    exchange is a net loss there.

    Result-identical: every consumer is a groupBy/join/window pipeline
    whose output does not depend on input partitioning; the driver's
    value gate is order-insensitive (sorted rows)."""
    df = _t(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    rgs, rows = _scan_meta(f"{sf_dir}/{name}.parquet")
    if rgs is not None and rgs < par and rows >= min_rows_factor * par:
        df = df.repartition(par, F.col(key))
    return df


def _docs(spark: SparkSession, sf_dir: str,
          min_rows_factor: int = 32) -> DataFrame:
    return _t_heavy(spark, sf_dir, "documents", "doc_id", min_rows_factor)


def _orders_joinable(spark: SparkSession, sf_dir: str,
                     max_broadcast_rows: int = 500_000) -> DataFrame:
    """The orders table prepared for an equi-join against lineitem with
    the join strategy picked DELIBERATELY (guide §3.1): under the session
    broadcast threshold Catalyst broadcasts orders, which is right while
    it is small but collapses once it is millions of rows — the
    single-threaded broadcast build dominated q5 at sf1.0 (interleaved
    A/B: broadcast 7.9 s vs shuffled-hash 2.5 s; a wash at sf0.1 where
    orders is 150k rows). Above ``max_broadcast_rows`` the SHUFFLE_HASH
    hint forces a shuffled hash join with orders as the per-partition
    build side — the strategy that stays correct at any scale (sort-merge
    only needed when a build partition would not fit memory, which AQE
    can still fall back to)."""
    orders = _t(spark, sf_dir, "orders")
    _, rows = _scan_meta(f"{sf_dir}/orders.parquet")
    if rows > max_broadcast_rows:
        orders = orders.hint("shuffle_hash")
    return orders


def _emb(spark: SparkSession, sf_dir: str,
         min_rows_factor: int = 256) -> DataFrame:
    # default floor 256 rows/core: the top-k scorer's per-row work (3
    # 64-dim folds) amortizes the exchange only for larger tables
    # (interleaved A/B: 2k rows lose ~0.06 s, 20k rows win); the
    # all-pairs caller passes 32 — its stream side does O(rows) folds
    # PER ROW, so even small tables are compute-bound single-task
    return _t_heavy(spark, sf_dir, "embeddings", "vec_id", min_rows_factor)


# ---------------------------------------------------------------------------
# Relational analytics core (TPC-H-shaped)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                    AS avg_qty,
       round(avg(l_extendedprice), 4)                               AS avg_price,
       round(avg(l_discount), 4)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_nation_revenue(spark, sf_dir):
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _orders_joinable(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        nation.join(F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .filter(cust["c_nationkey"] == sup["s_nationkey"])
        .join(F.broadcast(dims), sup["s_nationkey"] == dims["n_nationkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q5_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Crawl-shaped operators over generic tables (oracle-checkable analogs)
# ---------------------------------------------------------------------------


def first_event_per_user(spark, sf_dir):
    """First-occurrence-wins dedup (reference INSERT OR IGNORE /
    order-preserving seed dedup, utils.py:93-105): earliest event per user."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("o"))
        .select(
            "user_id",
            F.col("o.event_id").alias("first_event_id"),
            F.unix_timestamp(F.col("o.ts")).alias("first_ts_epoch"),
        )
    )


FIRST_EVENT_SQL = """
SELECT user_id,
       event_id AS first_event_id,
       floor(epoch(ts))::BIGINT AS first_ts_epoch
FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
  FROM events
) WHERE rn = 1
"""


def topk_per_user(spark, sf_dir):
    """Politeness-quota shape (operators/politeness.py): top-3 rows per
    key by priority with deterministic tie-breaks."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value"), "rnk")
    )


TOPK_SQL = """
SELECT user_id, event_id, round(value, 4) AS value, rnk
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) rnk
  FROM events
) WHERE rnk <= 3
"""


def seen_antijoin(spark, sf_dir):
    """Seen-set anti-join shape (SURVEY.md J1): events from users absent
    from the customer table, counted by type."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id")
    )
    return (
        ev.join(cust, "user_id", "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
    )


SEEN_ANTIJOIN_SQL = """
SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
GROUP BY event_type
"""


def docs_by_source(spark, sf_dir):
    """Per-host crawl-metrics aggregation shape (SURVEY.md A1/A4)."""
    # plain read: a sum/count over two narrow columns has no per-row
    # compute to parallelize — the _docs repartition would cost more
    # than the single-pass partial agg it replaces
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


DOCS_BY_SOURCE_SQL = """
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY source
"""


def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min timeout): per-user session count —
    the stateful-streaming operator expressed as batch windows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("_new", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("_new").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


SESSIONIZE_SQL = """
SELECT user_id, sum(_new)::BIGINT AS n_sessions, count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
GROUP BY user_id
"""


def events_hourly(spark, sf_dir):
    """Tumbling-window aggregation (Structured-Streaming shape, run batch)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Wider relational surface: rollup, running windows, as-of, pivot, argmax
# ---------------------------------------------------------------------------


def rollup_revenue(spark, sf_dir):
    """ROLLUP aggregation with grouping indicators (subtotal hierarchy)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .alias("gid"),
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def running_user_value(spark, sf_dir):
    """Per-user running total (cumulative window) — streaming-state shape."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


RUNNING_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             4) AS running_value
FROM events
"""


def asof_last_purchase(spark, sf_dir):
    """As-of join expressed as an IGNORE NULLS last_value window: for each
    event, the most recent prior-or-current 'purchase' event of that user."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    return ev.select(
        "event_id",
        F.last(purchase_id, ignorenulls=True).over(w).alias("last_purchase_id"),
    )


ASOF_SQL = """
SELECT event_id,
       last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_id
FROM events
"""


def supplier_distinct_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


SUPPLIER_DISTINCT_SQL = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem GROUP BY l_suppkey
"""


def orders_status_pivot(spark, sf_dir):
    """Pivot: order counts per priority x status (statuses P/O/F)."""
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_finished"),
        F.coalesce("P", F.lit(0)).alias("n_pending"),
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_open,
       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_finished,
       sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_pending
FROM orders GROUP BY o_orderpriority
"""


def top_part_per_nation(spark, sf_dir):
    """Argmax: highest-revenue part per supplier nation (struct-max)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                     2).alias("rev"))
    )
    return (
        rev.groupBy("n_name")
        .agg(F.max(F.struct("rev", "l_partkey")).alias("m"))
        .select("n_name", F.col("m.l_partkey").alias("top_partkey"),
                F.col("m.rev").alias("revenue"))
    )


TOP_PART_SQL = """
WITH rev AS (
  SELECT n_name, l_partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name, l_partkey
)
SELECT n_name, l_partkey AS top_partkey, rev AS revenue FROM (
  SELECT *, row_number() OVER (PARTITION BY n_name
                               ORDER BY rev DESC, l_partkey DESC) rn
  FROM rev
) WHERE rn = 1
"""


def events_value_histogram(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 50).cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


HISTOGRAM_SQL = """
SELECT floor(value / 50)::BIGINT AS bucket, count(*) AS n,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY 1
"""


def customer_segment_stats(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


SEGMENT_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_bal,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM customer GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Training-pipeline text/dedup/similarity operators
# ---------------------------------------------------------------------------

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def dedup_exact_docs(spark, sf_dir):
    # plain read: the per-row compute (one md5 over normalized text) is
    # too cheap to amortize a pre-shuffle — interleaved A/B showed the
    # _docs repartition costs ~2x here (the window's own exchange on _k
    # already parallelizes everything downstream of the scan)
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "lang")


DEDUP_EXACT_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) rn
  FROM documents
) WHERE rn = 1
"""

_TOKENS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_NTOK_SQL = f"CASE WHEN trim(lower(text)) = '' THEN 0 ELSE len({_TOKENS_SQL}) END"


def token_stats(spark, sf_dir):
    # floor 256 rows/core: one split()+size per row is midweight —
    # interleaved A/B showed the pre-shuffle loses at 5k docs (0.288 vs
    # 0.336) and wins at 50k (0.766 vs 0.487)
    docs = _docs(spark, sf_dir, min_rows_factor=256)
    return (
        docs.withColumn("_nt", token_count(F.col("text")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.round(F.avg("_nt"), 4).alias("avg_tokens"),
        )
    )


TOKEN_STATS_SQL = f"""
SELECT lang, count(*) AS n_docs, sum(nt)::BIGINT AS total_tokens,
       round(avg(nt), 4) AS avg_tokens
FROM (SELECT lang, {_NTOK_SQL} AS nt FROM documents)
GROUP BY lang
"""


def quality_per_doc(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return quality_features(docs).select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "quality_score"
    )


_PUNCT_SQL = "len(regexp_extract_all(text, '[^\\w\\s]'))"
_STOP_LIST = "['the','a','an','and','or','of','to','in','is','it','that','for','on','as','with']"
QUALITY_SQL = f"""
SELECT doc_id,
       nt AS n_tokens,
       round(CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END, 6) AS punct_ratio,
       round(CASE WHEN nt > 0 THEN ns::DOUBLE / nt ELSE 0.0 END, 6) AS stopword_ratio,
       CASE WHEN nt = 0 THEN 0.0 ELSE
         round((least(nt / 20.0, 1.0) +
                greatest(0.0, 1.0 - (CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END) * 5)) / 2,
               6)
       END AS quality_score
FROM (
  SELECT doc_id,
         {_NTOK_SQL} AS nt,
         length(text)::DOUBLE AS nc,
         {_PUNCT_SQL}::DOUBLE AS np,
         len(list_filter({_TOKENS_SQL}, t -> list_contains({_STOP_LIST}, t))) AS ns
  FROM documents
)
"""


def lang_id_eval(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn("pred", lang_id(F.col("text")))
        .groupBy("lang", "pred")
        .agg(F.count("*").alias("n"))
    )


def _lang_pred_parts() -> tuple[str, str]:
    """DuckDB marker-score columns (``s_<code>``) and the argmax CASE
    over them — shared by the lang-ID oracle and the curation oracle.
    Tie-break is first-in-sorted-code-order, matching operators.textstats
    .lang_id's greatest-first-match semantics."""
    score_cols = []
    for code, marks in sorted(LANG_MARKERS.items()):
        terms = " + ".join(
            f"list_contains(toks, '{m}')::INT" for m in marks
        )
        score_cols.append(f"({terms}) AS s_{code}")
    codes = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{c}" for c in codes) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{c} = {best} THEN '{c}'" for c in codes
    ) + " END"
    return ", ".join(score_cols), case


def _lang_sql() -> str:
    score_cols, case = _lang_pred_parts()
    return f"""
SELECT lang, pred, count(*) AS n FROM (
  SELECT lang, {case} AS pred FROM (
    SELECT lang, {score_cols}
    FROM (SELECT lang, {_TOKENS_SQL} AS toks FROM documents)
  )
) GROUP BY lang, pred
"""


def fingerprint_docs(spark, sf_dir):
    # plain read: map-only plan (no downstream exchange) with one
    # md5+regexp per row — a pre-shuffle would add the plan's only
    # exchange for compute that is already sub-second (see
    # dedup_exact_docs)
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


FINGERPRINT_SQL = f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents"


def jaccard_pairs_docs(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs >= 0.5 over documents (the oracle
    for the MinHash-LSH sketch path, which is tested in pytest)."""
    docs = _docs(spark, sf_dir)
    return exact_jaccard_pairs(docs, threshold=0.5)


JACCARD_SQL = """
WITH s AS (
  SELECT doc_id AS id,
         list_distinct(
           list_transform(
             generate_series(1, greatest(len(toks) - 2, 1)),
             i -> array_to_string(toks[i:i+2], ' ')
           )
         ) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents)
)
SELECT a.id AS id_a, b.id AS id_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.id < b.id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
"""


def embedding_topk(spark, sf_dir):
    """Brute-force cosine top-10 for the 3 lowest-id query vectors.
    Ranks computed over ROUNDED cosine (6dp) with id tie-break so both
    engines rank identically despite float ulps."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(F.zip_with(F.col("v"), F.col("qv"), lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    nq = F.sqrt(F.aggregate(F.col("qv"), F.lit(0.0), lambda a, x: a + x * x))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", F.round(dot / (nv * nq), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# NB: DuckDB's list_dot_product accumulates float32 inputs in float32,
# which drifts ~1e-6 from Spark's double fold; these oracles therefore
# spell out the dot product as a sequential DOUBLE fold (list_sum over a
# double-cast product list), matching Spark's F.aggregate bit-for-bit.
_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


EMB_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings ORDER BY vec_id LIMIT 3
),
s AS (
  SELECT q.query_id, e.vec_id,
         round({_cos_sql('e.embedding', 'q.qv')}, 6) AS cosine
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM s
) WHERE rank <= 10
"""


def embedding_pairs(spark, sf_dir):
    """Exact all-pairs cosine >= 0.4 (embedding near-dup, exact form; the
    LSH-blocked variant is pytest-verified)."""
    emb = _emb(spark, sf_dir, min_rows_factor=32).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.col("va"), F.lit(0.0), lambda a_, x: a_ + x * x))
    nb = F.sqrt(F.aggregate(F.col("vb"), F.lit(0.0), lambda a_, x: a_ + x * x))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(dot / (na * nb), 6).alias("cosine"))
        .filter(F.col("cosine") >= 0.4)
    )


EMB_PAIRS_SQL = f"""
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE cosine >= 0.4
"""


# ---------------------------------------------------------------------------
# Rows-only queries (non-SQL-expressible; parity-tested in pytest instead)
# ---------------------------------------------------------------------------


_CRAWLQ_ROOT: dict = {}


def _crawl_engine(spark) -> CrawlEngine:
    """One deterministic 40-page crawl per process, stored under a
    RUN-SCOPED persistent dir so the returned DataFrames stay LAZY parquet
    reads (r1 used a TemporaryDirectory that died before the driver
    consumed the result, forcing a .collect() round-trip — VERDICT #6)."""
    root = _CRAWLQ_ROOT.get("root")
    if root is None:
        root = tempfile.mkdtemp(prefix="ctmds-crawl-query-")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        corpus = synth_corpus(spark, n_pages=40, n_hosts=3, branching=3, seed=42)
        eng = CrawlEngine(spark, root, CrawlConfig(use_bloom=False))
        eng.run(corpus, single_url="https://host0.example/p/0")
        _CRAWLQ_ROOT["root"] = root
        return eng
    return CrawlEngine(spark, root, CrawlConfig(use_bloom=False))


def crawl_pages(spark, sf_dir):
    """End-to-end BFS crawl on the deterministic synthetic corpus; returns
    (url, title, content_is_null, discovery_rank) of the pages table (lazy
    read of the run-scoped store) — everything the DuckDB BFS oracle below
    can reproduce (page CONTENT embeds seeded-random caption words, so its
    byte-exactness is pinned against the sequential reference-semantics
    simulator in tests/test_crawl_parity.py instead)."""
    return _crawl_engine(spark).pages_df().select(
        "url",
        F.element_at(F.col("metadata"), F.lit("title")).alias("title"),
        F.col("content").isNull().alias("content_is_null"),
        "discovery_rank",
    )


def crawl_links(spark, sf_dir):
    return _crawl_engine(spark).links_state()


def _crawl_bfs_sql(final_select: str, n_pages: int = 40, n_hosts: int = 3,
                   branching: int = 3, n_waves: int = 12,
                   stride: int = 1 << 20) -> str:
    """DuckDB oracle for the deterministic 40-page crawl: the synthetic
    web graph of crawl/corpus.py synth_corpus_rows re-derived as SQL
    (every link is a formula of the page id), then wave-BFS with
    first-write-wins and stride-based discovery_rank — the reference's
    crawl loop semantics (scraper.py:290-376) — as UNROLLED wave CTEs
    (one frontier/seen pair per wave; empty waves contribute nothing, so
    over-unrolling is harmless)."""
    from .crawl.corpus import _WORDS

    h, b, n = n_hosts, branching, n_pages
    words_values = ", ".join(f"({i}, '{w}')" for i, w in enumerate(_WORDS))
    parts = [f"""
WITH cw_words(wi, w) AS (VALUES {words_values}),
cw_corpus AS MATERIALIZED (
  SELECT j,
    'https://host' || (j % {h}) || '.example' ||
      (CASE WHEN j % 17 = 5 THEN '/dir' || j || '/' ELSE '/p/' || j END) AS url,
    (CASE WHEN j % 23 = 7 THEN 404 WHEN j % 29 = 11 THEN 500 ELSE 200 END) AS status,
    (CASE WHEN j % 19 = 9 THEN 'application/pdf'
          ELSE 'text/html; charset=utf-8' END) AS content_type,
    (j % 31 = 13) AS empty_page
  FROM generate_series(0, {n - 1}) t(j)
),
cw_edge_raw AS (
  -- tree children, in href order (synth_corpus_rows: child = j*b + c);
  -- relative hrefs resolve to the same absolute URL (urljoin of an
  -- absolute path), so the resolved link is one formula either way
  SELECT j AS src_j, c AS ord,
         'https://host' || ((j*{b}+c) % {h}) || '.example' ||
         (CASE WHEN (j*{b}+c) % 17 = 5 THEN '/dir' || (j*{b}+c) || '/'
               ELSE '/p/' || (j*{b}+c) END) AS link
  FROM cw_corpus, generate_series(1, {b}) s(c) WHERE j*{b}+c < {n}
  UNION ALL  -- fragment dup, defragged by the engine
  SELECT j, {b}+1, 'https://host' || (j % {h}) || '.example/p/0'
  FROM cw_corpus WHERE j % 4 = 1 AND j > 0
  UNION ALL  -- cycle/dup back-link (same host as SOURCE page)
  SELECT j, {b}+2, 'https://host' || (j % {h}) || '.example/p/' || (j-1)
  FROM cw_corpus WHERE j % 6 = 2
  UNION ALL  -- /logout/ link (no exclude patterns in this config -> valid)
  SELECT j, {b}+3, 'https://host' || (j % {h}) || '.example/logout/session' || j
  FROM cw_corpus WHERE j % 8 = 3
  UNION ALL  -- off-base host (no base_url in this config -> valid)
  SELECT j, {b}+4, 'https://elsewhere.example/x/' || j
  FROM cw_corpus WHERE j % 10 = 4
  UNION ALL  -- dangling link past the corpus
  SELECT j, {b}+5, 'https://host' || (j % {h}) || '.example/p/' || ({n}+j)
  FROM cw_corpus WHERE j % 13 = 6
),
cw_edges AS MATERIALIZED (
  SELECT src_j, link,
         row_number() OVER (PARTITION BY src_j ORDER BY ord) - 1 AS pos
  FROM cw_edge_raw
),
cw_f0 AS MATERIALIZED (SELECT 'https://host0.example/p/0' AS url,
                 CAST(0 AS BIGINT) AS discovery_rank),
cw_seen0 AS MATERIALIZED (SELECT url FROM cw_f0)"""]
    for k in range(1, n_waves + 1):
        parts.append(f""",
cw_cand{k} AS MATERIALIZED (
  -- links of pages FETCHED this wave (= last wave's new frontier rows
  -- that hit the corpus and pass the status/content-type gate), with
  -- first-write-wins: min (src_rank, pos) per URL
  SELECT e.link AS url, fp.discovery_rank AS src_rank, e.pos,
         row_number() OVER (PARTITION BY e.link
                            ORDER BY fp.discovery_rank, e.pos) AS rn
  FROM cw_f{k - 1} fp
  JOIN cw_corpus c ON c.url = fp.url AND c.status = 200
                   AND c.content_type LIKE 'text/html%'
  JOIN cw_edges e ON e.src_j = c.j
),
cw_f{k} AS MATERIALIZED (
  -- anti-join vs everything seen, then dense rank from the wave's stride
  -- base (engine._next_rank_base: base_k = k * stride while waves stay
  -- under a stride of links)
  SELECT url, CAST({k * stride} + row_number() OVER (ORDER BY src_rank, pos)
              - 1 AS BIGINT) AS discovery_rank
  FROM cw_cand{k}
  WHERE rn = 1 AND url NOT IN (SELECT url FROM cw_seen{k - 1})
),
cw_seen{k} AS MATERIALIZED (SELECT url FROM cw_seen{k - 1} UNION ALL SELECT url FROM cw_f{k})""")
    frontier_union = " UNION ALL ".join(
        f"SELECT * FROM cw_f{k}" for k in range(n_waves + 1)
    )
    parts.append(f",\ncw_frontier AS ({frontier_union})\n{final_select}")
    return "".join(parts)


# the crawl runs to frontier exhaustion with no budget, so every frontier
# row is fetched (and marked visited) in the wave after its discovery
CRAWL_LINKS_SQL = _crawl_bfs_sql(
    "SELECT url, TRUE AS visited, discovery_rank FROM cw_frontier"
)

CRAWL_PAGES_SQL = _crawl_bfs_sql("""
SELECT f.url, 'Page ' || c.j || ' ' || w.w AS title,
       c.empty_page AS content_is_null, f.discovery_rank
FROM cw_frontier f
JOIN cw_corpus c ON c.url = f.url AND c.status = 200
                 AND c.content_type LIKE 'text/html%'
JOIN cw_words w ON w.wi = c.j % 20
""")


def image_invariants(spark, sf_dir):
    """input_hint table -> per-image invariant report (decode dims, phash
    of decoded pixels, lossy-round-trip PSNR>=40dB). Value-checked since
    round 5 against pinned literals of the real codec path
    (_image_invariants_sql); invariants also asserted in
    tests/test_image_crawl.py and tests/test_multimodal.py."""
    from .crawl.corpus import synth_images_table
    from .operators.multimodal import verify_invariants

    images = synth_images_table(spark, n_images=120, seed=42)
    return verify_invariants(images)


def image_feature_extract(spark, sf_dir):
    """Decode + feature-extract over the input_hint table (multimodal
    mapInPandas plumbing). Value-checked since round 5 against pinned
    literals of the real codec path (_image_features_sql)."""
    from .crawl.corpus import synth_images_table
    from .operators.multimodal import image_features

    images = synth_images_table(spark, n_images=120, seed=42)
    return image_features(images)


def minhash_pairs_docs(spark, sf_dir):
    """MinHash-LSH near-dup pairs on the scale path (JVM xxhash64
    shingle + band hashes, 128-perm numpy sketch UDF). Value-checked
    since round 5: the DuckDB oracle is the PINNED expected pair list
    (_xxhash_fixture.py) computed by a pure-Python XXH64 + plain-int
    sketch pipeline independent of Spark (tools/gen_xxhash_literals.py);
    the md5 twin (minhash_md5_pairs_docs) additionally re-derives every
    stage inside DuckDB itself."""
    docs = _docs(spark, sf_dir)
    return minhash_lsh_pairs(docs, threshold=0.5, num_perm=128, bands=32)


# (a, b) rows of RandomState(7).randint for num_perm=16 — the SAME
# constants _minhash_udf derives, embedded as literals so the DuckDB
# oracle computes the identical ((a*h + b) mod 2^64) mod p minima (the
# UDF is all-uint64, so its value is exact integer arithmetic that
# HUGEINT reproduces; operators/dedup.py::_minhash_udf)
_MINHASH_AB_16 = [
    (1407639518939636933, 1630422002828422847),
    (551904368352831991, 1422685883315097400),
    (1169693746941186260, 1036818128723030199),
    (1816361973745530472, 459309668489100400),
    (1899821249326607546, 1854800229375720637),
    (710123494352685592, 1385894553171423522),
    (20668929189138778, 1942495339429673161),
    (1329108821600893483, 894481085146036774),
    (340139256470221705, 629557289527310830),
    (2303675491809990631, 150699654041190231),
    (1000366761065432497, 431885845465162947),
    (991310334879981960, 7560552725577555),
    (109594561920622081, 811901033415426305),
    (1216310873990163256, 1710988252442831248),
    (703662130126978055, 1472955763471030175),
    (638137941648739773, 2135503771371547564),
]

_MINHASH_PERMS_VALUES = ",\n    ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(_MINHASH_AB_16)
)

# shingles -> 60-bit md5 shingle hash -> per-perm min of the carry-exact
# affine hash; shared by the signature oracle and the LSH-pairs oracle
_MINHASH_MD5_SIG_CTE = f"""
WITH sh AS (
  SELECT doc_id, list_distinct(
           list_transform(
             generate_series(1, greatest(len(toks) - 2, 1)),
             i -> array_to_string(toks[i:i+2], ' ')
           )
         ) AS shingles
  FROM (SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS toks
        FROM documents)
), hh AS (
  SELECT doc_id, CAST('0x' || substring(md5(s.s), 1, 15) AS BIGINT) AS h
  FROM sh, unnest(shingles) AS s(s)
), perms(perm, a, b) AS (
  SELECT * FROM (VALUES {_MINHASH_PERMS_VALUES}) v
), sigrows AS (
  SELECT hh.doc_id, p.perm,
         CAST(min(((CAST(p.a AS HUGEINT) * hh.h + p.b)
                   % 18446744073709551616) % 2305843009213693951)
              AS BIGINT) AS minhash
  FROM hh CROSS JOIN perms p
  GROUP BY hh.doc_id, p.perm
)
"""


def minhash_md5_docs(spark, sf_dir):
    """Exploded 16-perm MinHash signatures with the md5-derived 60-bit
    shingle hash — the oracle-checkable twin of ``minhash_pairs_docs``'s
    signature stage: xxhash64 has no DuckDB analog but md5 does, so THIS
    variant drives the exact same numpy pandas-UDF affine-min sketch
    (operators/dedup.py::_minhash_udf, all-uint64 arithmetic) through the
    driver's value gate, one (doc, perm) row per signature slot."""
    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(
        docs, num_perm=16, shingle_hash=md5_token_hash
    )
    return sigs.select(
        F.col("id").alias("doc_id"), F.posexplode("sig")
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("perm"),
        F.col("col").alias("minhash"),
    )


MINHASH_MD5_SQL = _MINHASH_MD5_SIG_CTE + """
SELECT doc_id, CAST(perm AS INTEGER) AS perm, minhash FROM sigrows
"""


def minhash_md5_pairs_docs(spark, sf_dir):
    """Full MinHash-LSH near-dup pipeline (signature -> band -> bucket
    self-join -> exact-Jaccard verify) with md5 shingle AND band-bucket
    hashes — the value-checked twin of ``minhash_pairs_docs``: the DuckDB
    oracle reproduces every stage bit-for-bit (banding included), so a
    green row checks the banded join's candidate set, the skew-cap
    semantics, and the verify join, not just final jaccard math."""
    docs = _docs(spark, sf_dir)
    return minhash_lsh_pairs(
        docs, threshold=0.5, num_perm=16, bands=4,
        shingle_hash=md5_token_hash, band_hash=md5_token_hash,
    )


MINHASH_MD5_PAIRS_SQL = _MINHASH_MD5_SIG_CTE + """
, sigl AS (
  SELECT doc_id, list(minhash ORDER BY perm) AS sig
  FROM sigrows GROUP BY doc_id
), banded AS (
  SELECT doc_id, CAST(b.range AS INTEGER) AS band,
         CAST('0x' || substring(md5(
           array_to_string(
             list_transform(sig[b.range*4+1 : b.range*4+4],
                            x -> CAST(x AS VARCHAR)), ',')
         ), 1, 15) AS BIGINT) AS bucket
  FROM sigl, range(4) b
  QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 10000
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
             len(list_distinct(list_concat(sa.shingles, sb.shingles))),
             6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
      len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.5
"""


def simhash_docs(spark, sf_dir):
    """64-bit simhash fingerprints on the scale path (JVM xxhash64
    token hash + numpy bit-vote UDF). Value-checked since round 5
    against the PINNED fingerprints (_xxhash_fixture.py) computed by a
    pure-Python XXH64 + plain-int vote independent of Spark
    (tools/gen_xxhash_literals.py); the md5 twin (simhash_md5_docs)
    additionally re-derives the vote inside DuckDB itself."""
    docs = _docs(spark, sf_dir)
    return simhash_fingerprints(docs)


def simhash_md5_docs(spark, sf_dir):
    """Simhash fingerprints with the md5-derived 60-bit token hash — the
    oracle-checkable twin of ``simhash_docs``: xxhash64 has no DuckDB
    analog but md5 does, so THIS variant drives the exact same pandas-UDF
    bit-vote construction (operators/dedup.py::_simhash_udf) through the
    driver's value gate."""
    docs = _docs(spark, sf_dir)
    fp = simhash_fingerprints(docs, token_hash=md5_token_hash)
    return fp.select(F.col("id").alias("doc_id"), "simhash")


# fingerprint CTE shared by the simhash-md5 oracle and the hamming-pairs
# oracle: per-token 60-bit md5 hash -> per-bit majority vote -> packed
# int64 (bits 60..63 always 0, matching the Spark UDF whose vote over an
# always-0 bit is negative)
_SIMHASH_MD5_FP_CTE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
), th AS (
  SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
  FROM toks
), votes AS (
  SELECT doc_id, b.range AS b, sum((h >> b.range) & 1) AS ones,
         count(*) AS n
  FROM th, range(60) b GROUP BY doc_id, b.range
), fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN 2 * ones > n
                       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
         AS simhash
  FROM votes GROUP BY doc_id
)
"""

SIMHASH_MD5_SQL = _SIMHASH_MD5_FP_CTE + "SELECT doc_id, simhash FROM fp"


def _md5_hamming_pairs(docs):
    """Shared pair generator for the oracle-checked near-dup family:
    md5-token simhash fingerprints -> banded pigeonhole blocking ->
    hamming <= 8 pairs."""
    fp = simhash_fingerprints(docs, token_hash=md5_token_hash)
    return hamming_neardup_pairs(fp, "id", "simhash",
                                 max_hamming=8, bands=9)


def hamming_pairs_docs(spark, sf_dir):
    """Near-dup pairs by simhash hamming distance <= 8 over documents,
    via the generic banded pigeonhole blocking
    (operators/dedup.py::hamming_neardup_pairs). The md5 token hash makes
    the whole pipeline — fingerprint AND banding join — reproducible in
    the DuckDB oracle (which verifies with a brute-force quadratic join;
    pigeonhole guarantees the banded plan finds the same pairs)."""
    docs = _docs(spark, sf_dir)
    return _md5_hamming_pairs(docs)


HAMMING_SQL = _SIMHASH_MD5_FP_CTE + """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""


def _images_with_planted_dups(spark):
    """input_hint table + every 10th image re-registered under a new id
    (same bytes -> identical phash): the re-encoded-copy scenario."""
    from .crawl.corpus import synth_images_table

    images = synth_images_table(spark, n_images=120, seed=42)
    planted = images.filter(
        (F.substring("image_id", 5, 6).cast("int") % 10) == 0
    ).withColumn("image_id", F.concat(F.lit("dup-"), F.col("image_id")))
    return images.unionByName(planted)


def phash_pairs_images(spark, sf_dir):
    """Image near-dup by perceptual-hash hamming over the input_hint
    table (phash:int64 computed from decoded pixels at ingest): the
    canonical image-corpus dedup. Value-checked since round 5: the
    DuckDB oracle brute-forces hamming over the PINNED fingerprint
    literals (_phash_fixture.py) while this side recomputes phash from
    synthesized bytes end-to-end; banding-vs-bruteforce additionally
    pinned by tests/test_dedup.py::test_phash_pairs_*."""
    return phash_neardup_pairs(_images_with_planted_dups(spark), max_hamming=6)


def neardup_clusters_docs(spark, sf_dir):
    """Transitive near-dup clusters: the md5-simhash hamming<=8 pairs
    closed under connectivity by the distributed large-star/small-star
    algorithm (operators/cluster.py), labeled by the cluster's minimum
    doc_id and sized. The DuckDB oracle recomputes the SAME pairs and
    closes them with a recursive CTE — a full value check of an
    iterative distributed graph algorithm."""
    docs = _docs(spark, sf_dir)
    return cluster_assignments(_md5_hamming_pairs(docs)).select(
        F.col("id").alias("doc_id"), "cluster_id", "cluster_size"
    )


def dedup_keep_canonical_docs(spark, sf_dir):
    """End-to-end fuzzy dedup: near-dup pairs -> connected components ->
    keep ONLY the canonical (minimum-id) member per cluster; unpaired
    docs pass through. This is the operation a training-data pipeline
    actually runs — pair lists are an intermediate, the kept set is the
    product."""
    docs = _docs(spark, sf_dir)
    kept = keep_canonical(docs, _md5_hamming_pairs(docs), id_col="doc_id")
    return kept.select("doc_id", "source", "n_chars")


def hamming_clusters_all_docs(spark, sf_dir):
    """The LINEAR-OUTPUT near-dup consumer at 100 TB scale (VERDICT r4):
    every document mapped to its transitive near-dup cluster — exact-
    equal fingerprints collapse into families BEFORE banding (a 10^6-doc
    boilerplate family costs O(n) rows, never O(n^2) pairs), connected
    components run over family representatives only, and singletons keep
    their own id with cluster_size 1. md5 token hash makes the whole
    pipeline reproducible in the DuckDB oracle (recursive-CTE closure +
    a singleton union)."""
    docs = _docs(spark, sf_dir)
    fp = simhash_fingerprints(docs, token_hash=md5_token_hash)
    return hamming_neardup_clusters(
        fp, "id", "simhash", max_hamming=8, bands=9
    ).select(F.col("id").alias("doc_id"), "cluster_id", "cluster_size")


def curate_training_docs(spark, sf_dir):
    """End-to-end training-data curation in ONE call — the composite a
    100 TB pipeline actually runs, not three separate passes: language-ID
    gate (prediction != 'und'), quality gate (>= 5 tokens, composite
    score >= 0.5), then fuzzy dedup keeping only each near-dup cluster's
    canonical member (md5-simhash hamming<=8 pairs -> distributed
    connected components -> anti-join on non-canonical members). The
    gates are narrow column expressions fused into the pruned document
    scans (no shuffle before the dedup's banding join); the DuckDB
    oracle recomputes the whole pipeline, including the recursive-CTE
    transitive closure, so the driver row value-checks stage composition
    — a filter/fingerprint/closure change anywhere flips it red."""
    docs = _docs(spark, sf_dir)
    cand = (
        quality_features(docs)
        .withColumn("pred_lang", lang_id(F.col("text")))
        .filter(
            (F.col("pred_lang") != "und")
            & (F.col("n_tokens") >= 5)
            & (F.col("quality_score") >= 0.5)
        )
    )
    kept = keep_canonical(cand, _md5_hamming_pairs(cand), id_col="doc_id")
    return kept.select(
        "doc_id", "source", "pred_lang", "n_tokens", "quality_score"
    )


def phash_clusters_images(spark, sf_dir):
    """Image near-dup clusters over the planted-duplicate phash pairs —
    the image-corpus twin of neardup_clusters_docs. Value-checked since
    round 5 (recursive-CTE closure over the pinned fingerprint literals);
    also pinned by tests/test_cluster.py::test_phash_clusters_planted_dups
    against a union-find reference."""
    pairs = phash_neardup_pairs(_images_with_planted_dups(spark), max_hamming=6)
    return cluster_assignments(pairs).select(
        F.col("id").alias("image_id"), "cluster_id", "cluster_size"
    )


def _caption_enriched(images: DataFrame) -> DataFrame:
    """Deterministic language markers appended to a third of the captions
    each (English / German glue words keyed on the image index): the raw
    synthesized captions contain no marker tokens, so without this every
    row would lang-gate to 'und' and the curation composite would be a
    degenerate filter. The SAME expression runs in the DuckDB oracle over
    the pinned caption literals."""
    idx = F.substring("image_id", -6, 6).cast("int")
    return images.withColumn(
        "caption",
        F.concat(
            F.col("caption"),
            F.when(idx % 3 == 0, F.lit(" with the of"))
            .when(idx % 3 == 1, F.lit(" der und mit"))
            .otherwise(F.lit("")),
        ),
    )


def curate_image_caption_pairs(spark, sf_dir):
    """End-to-end image+caption curation over the input_hint table in ONE
    call — the image-corpus twin of curate_training_docs: caption
    language gate (lang-ID argmax != 'und') + token floor (>= 7), then
    fuzzy image dedup keeping only each phash-hamming<=6 cluster's
    canonical member (banded hamming pairs -> distributed connected
    components -> anti-join on non-canonical members). Gates are narrow
    JVM column expressions over the caption; the dedup fingerprint is the
    stored phash — no decode, no Python in the plan. The DuckDB oracle
    recomputes the whole pipeline (marker enrichment, tokenization,
    lang argmax, brute-force hamming, recursive-CTE closure) over the
    pinned (image_id, phash, caption) literals, so a change to the
    synthesizer, the caption gates, the phash derivation, or the
    banding/closure flips the driver row red."""
    images = _caption_enriched(_images_with_planted_dups(spark))
    cand = (
        images.withColumn("pred_lang", lang_id(F.col("caption")))
        .withColumn("n_tokens", token_count(F.col("caption")))
        .filter((F.col("pred_lang") != "und") & (F.col("n_tokens") >= 7))
    )
    kept = keep_canonical(
        cand, phash_neardup_pairs(cand, max_hamming=6), id_col="image_id"
    )
    return kept.select("image_id", "caption", "pred_lang", "n_tokens")


# recursive transitive closure over the SAME pairs the Spark side blocks
# via pigeonhole banding; quadratic reach is fine at oracle scale (the
# Spark algorithm is the scale path)
_CLUSTER_CTE = _SIMHASH_MD5_FP_CTE.replace(
    "WITH toks", "WITH RECURSIVE toks", 1
) + """
, pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
), e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), lab AS (
  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
  FROM reach GROUP BY u
)
"""

NEARDUP_CLUSTERS_SQL = _CLUSTER_CTE + """
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM lab
"""

# hamming_clusters_all_docs: the lab closure plus a singleton branch
# (docs in no pair keep their own id, size 1 — mirroring the family
# collapse's coalesce(component, rep) for unpaired fingerprints)
HAMMING_CLUSTERS_ALL_SQL = _CLUSTER_CTE + """
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM (
  SELECT doc_id, cluster_id FROM lab
  UNION ALL
  SELECT d.doc_id, d.doc_id AS cluster_id
  FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
  WHERE l.doc_id IS NULL
)
"""


def _curate_sql() -> str:
    """The full curation pipeline in DuckDB: quality features + lang-ID
    argmax over the document scan, the three gates, then the md5-simhash
    fingerprint / hamming pairs / recursive-CTE closure over the GATED
    candidate set only (the Spark side likewise fingerprints only
    survivors — dedup cost scales with what passes the gates, not the
    corpus)."""
    score_cols, case = _lang_pred_parts()
    return f"""
WITH RECURSIVE qf AS (
  SELECT doc_id, source, text,
         {_NTOK_SQL} AS nt,
         length(text)::DOUBLE AS nc,
         {_PUNCT_SQL}::DOUBLE AS np,
         {_TOKENS_SQL} AS toks
  FROM documents
), cand AS (
  SELECT doc_id, source, text, pred_lang, nt AS n_tokens, quality_score
  FROM (
    SELECT doc_id, source, text, nt,
           CASE WHEN nt = 0 THEN 0.0 ELSE
             round((least(nt / 20.0, 1.0) +
                    greatest(0.0, 1.0 - (CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END) * 5)) / 2,
                   6)
           END AS quality_score,
           {case} AS pred_lang
    FROM (SELECT doc_id, source, text, nt, nc, np, {score_cols} FROM qf)
  )
  WHERE pred_lang <> 'und' AND nt >= 5 AND quality_score >= 0.5
), ctoks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM cand
), th AS (
  SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
  FROM ctoks
), votes AS (
  SELECT doc_id, b.range AS b, sum((h >> b.range) & 1) AS ones,
         count(*) AS n
  FROM th, range(60) b GROUP BY doc_id, b.range
), fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN 2 * ones > n
                       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
         AS simhash
  FROM votes GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
), e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), lab AS (
  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
  FROM reach GROUP BY u
)
SELECT c.doc_id, c.source, c.pred_lang, c.n_tokens, c.quality_score
FROM cand c
LEFT JOIN (SELECT doc_id FROM lab WHERE doc_id <> cluster_id) x
       ON c.doc_id = x.doc_id
WHERE x.doc_id IS NULL
"""


def _phash_fp_cte(recursive: bool = False) -> str:
    """VALUES CTE of the pinned (image_id, phash) planted-duplicate table
    (crawler_to_md_spark/_phash_fixture.py, generated by
    tools/gen_phash_literals.py from the REAL synthesis + phash path).
    The Spark side of the phash queries recomputes phash end-to-end from
    synthesized image bytes, so matching the oracle built over these
    literals value-checks the decode-derived hash AND the banded join —
    a synthesizer/phash/banding change flips the driver row red."""
    from ._phash_fixture import PHASH_ROWS

    vals = ",\n    ".join(
        f"('{iid}', CAST({ph} AS BIGINT))" for iid, ph in PHASH_ROWS
    )
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} fp(image_id, phash) AS (VALUES\n    {vals}\n)\n"


def _simhash_xx_sql() -> str:
    """simhash_docs in DuckDB: the pinned expected fingerprints
    (_xxhash_fixture.py, generated by tools/gen_xxhash_literals.py with
    a pure-Python XXH64 + plain-int bit-vote — nothing shared with the
    JVM hash or the numpy UDF under test)."""
    from ._xxhash_fixture import SIMHASH_XX_ROWS

    vals = ",\n    ".join(
        f"({did}, CAST({fp} AS BIGINT))" for did, fp in SIMHASH_XX_ROWS
    )
    return ("SELECT * FROM (VALUES\n    " + vals + "\n) AS t(id, simhash)")


def _minhash_xx_pairs_sql() -> str:
    """minhash_pairs_docs in DuckDB: the pinned expected near-dup pairs
    (same independence contract as _simhash_xx_sql; the full sketch ->
    band -> bucket-join -> exact-verify pipeline is re-run in pure
    Python by the generator)."""
    from ._xxhash_fixture import MINHASH_XX_PAIR_ROWS

    vals = ",\n    ".join(
        f"({ia}, {ib}, CAST({jac!r} AS DOUBLE))"
        for ia, ib, jac in MINHASH_XX_PAIR_ROWS
    )
    return ("SELECT * FROM (VALUES\n    " + vals +
            "\n) AS t(id_a, id_b, jaccard)")


def _image_invariants_sql() -> str:
    """image_invariants in DuckDB: the pinned per-image invariant report
    (_image_fixture.py, generated by tools/gen_image_literals.py from
    the REAL codec path driver-side). The Spark side decodes synthesized
    bytes and recomputes every check inside mapInPandas, so matching
    these literals value-checks the Arrow batch plumbing and the codec
    end-to-end — a synthesizer/codec/phash change flips the row red."""
    from ._image_fixture import INVARIANT_ROWS

    vals = ",\n    ".join(
        f"('{iid}', {str(d).upper()}, {str(fm).upper()}, {str(ph).upper()},"
        f" CAST({p!r} AS DOUBLE), {str(ok).upper()})"
        for iid, d, fm, ph, p, ok in INVARIANT_ROWS
    )
    return (
        "SELECT * FROM (VALUES\n    " + vals +
        "\n) AS t(image_id, dims_ok, fmt_ok, phash_ok, psnr_db, psnr_ok)"
    )


def _image_features_sql() -> str:
    """image_feature_extract in DuckDB: pinned decode-derived features
    (same contract as _image_invariants_sql)."""
    from ._image_fixture import FEATURE_ROWS

    vals = ",\n    ".join(
        f"('{iid}', {w}, {h}, '{fmt}', CAST({ph} AS BIGINT),"
        f" CAST({mr!r} AS DOUBLE), CAST({mg!r} AS DOUBLE),"
        f" CAST({mb!r} AS DOUBLE), CAST({c!r} AS DOUBLE))"
        for iid, w, h, fmt, ph, mr, mg, mb, c in FEATURE_ROWS
    )
    return (
        "SELECT * FROM (VALUES\n    " + vals +
        "\n) AS t(image_id, w, h, fmt, phash,"
        " mean_r, mean_g, mean_b, contrast)"
    )


def _phash_pairs_sql() -> str:
    return _phash_fp_cte() + """
SELECT a.image_id AS id_a, b.image_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 6
"""


def _phash_clusters_sql() -> str:
    # same recursive-closure shape as _CLUSTER_CTE, over the pinned
    # image fingerprints (hamming <= 6)
    return _phash_fp_cte(recursive=True) + """
, pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM fp a JOIN fp b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 6
), e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), lab AS (
  SELECT u AS image_id, least(u, min(v)) AS cluster_id
  FROM reach GROUP BY u
)
SELECT image_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM lab
"""

def _image_rows_cte() -> str:
    """VALUES CTE of the pinned (image_id, phash, caption) rows
    (_phash_fixture.py; see _phash_fp_cte for the pinning contract)."""
    from ._phash_fixture import IMAGE_ROWS

    def q(s: str) -> str:
        return s.replace("'", "''")

    vals = ",\n    ".join(
        f"('{iid}', CAST({ph} AS BIGINT), '{q(cap)}')"
        for iid, ph, cap in IMAGE_ROWS
    )
    return f"WITH RECURSIVE img(image_id, phash, caption0) AS (VALUES\n    {vals}\n)\n"


def _curate_images_sql() -> str:
    """curate_image_caption_pairs in DuckDB: the same deterministic
    caption-marker enrichment, whitespace tokenization, lang-ID argmax,
    token floor, brute-force phash hamming pairs over the gated set, and
    recursive-CTE transitive closure with canonical keep."""
    score_cols, case = _lang_pred_parts()
    ntok_cap = _NTOK_SQL.replace("text", "caption")
    toks_cap = _TOKENS_SQL.replace("text", "caption")
    return _image_rows_cte() + f"""
, enr AS (
  SELECT image_id, phash,
         caption0 || CASE CAST(right(image_id, 6) AS INT) % 3
           WHEN 0 THEN ' with the of'
           WHEN 1 THEN ' der und mit'
           ELSE '' END AS caption
  FROM img
), scored AS (
  SELECT image_id, phash, caption, {ntok_cap} AS n_tokens, {score_cols}
  FROM (SELECT image_id, phash, caption, {toks_cap} AS toks FROM enr)
), cand AS (
  SELECT image_id, phash, caption, n_tokens, pred_lang FROM (
    SELECT image_id, phash, caption, n_tokens, {case} AS pred_lang
    FROM scored
  )
  WHERE pred_lang <> 'und' AND n_tokens >= 7
), pairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM cand a JOIN cand b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 6
), e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM e
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
), lab AS (
  SELECT u AS image_id, least(u, min(v)) AS cluster_id
  FROM reach GROUP BY u
)
SELECT c.image_id, c.caption, c.pred_lang, c.n_tokens
FROM cand c
LEFT JOIN (SELECT image_id FROM lab WHERE image_id <> cluster_id) x
       ON c.image_id = x.image_id
WHERE x.image_id IS NULL
"""


KEEP_CANONICAL_SQL = _CLUSTER_CTE + """
SELECT d.doc_id, d.source, d.n_chars
FROM documents d
LEFT JOIN (SELECT doc_id FROM lab WHERE doc_id <> cluster_id) x
       ON d.doc_id = x.doc_id
WHERE x.doc_id IS NULL
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "first_event_per_user": first_event_per_user,
    "topk_per_user": topk_per_user,
    "seen_antijoin": seen_antijoin,
    "docs_by_source": docs_by_source,
    "events_sessionize": events_sessionize,
    "events_hourly": events_hourly,
    "rollup_revenue": rollup_revenue,
    "running_user_value": running_user_value,
    "asof_last_purchase": asof_last_purchase,
    "supplier_distinct_parts": supplier_distinct_parts,
    "orders_status_pivot": orders_status_pivot,
    "top_part_per_nation": top_part_per_nation,
    "events_value_histogram": events_value_histogram,
    "customer_segment_stats": customer_segment_stats,
    "dedup_exact_docs": dedup_exact_docs,
    "token_stats": token_stats,
    "quality_per_doc": quality_per_doc,
    "lang_id_eval": lang_id_eval,
    "fingerprint_docs": fingerprint_docs,
    "jaccard_pairs_docs": jaccard_pairs_docs,
    "embedding_topk": embedding_topk,
    "embedding_pairs": embedding_pairs,
    "crawl_pages": crawl_pages,
    "crawl_links": crawl_links,
    "image_invariants": image_invariants,
    "image_feature_extract": image_feature_extract,
    "minhash_pairs_docs": minhash_pairs_docs,
    "minhash_md5_docs": minhash_md5_docs,
    "minhash_md5_pairs_docs": minhash_md5_pairs_docs,
    "simhash_docs": simhash_docs,
    "simhash_md5_docs": simhash_md5_docs,
    "hamming_pairs_docs": hamming_pairs_docs,
    "phash_pairs_images": phash_pairs_images,
    "neardup_clusters_docs": neardup_clusters_docs,
    "dedup_keep_canonical_docs": dedup_keep_canonical_docs,
    "phash_clusters_images": phash_clusters_images,
    "hamming_clusters_all_docs": hamming_clusters_all_docs,
    "curate_training_docs": curate_training_docs,
    "curate_image_caption_pairs": curate_image_caption_pairs,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_nation_revenue": Q5_SQL,
    "first_event_per_user": FIRST_EVENT_SQL,
    "topk_per_user": TOPK_SQL,
    "seen_antijoin": SEEN_ANTIJOIN_SQL,
    "docs_by_source": DOCS_BY_SOURCE_SQL,
    "events_sessionize": SESSIONIZE_SQL,
    "events_hourly": EVENTS_HOURLY_SQL,
    "rollup_revenue": ROLLUP_SQL,
    "running_user_value": RUNNING_SQL,
    "asof_last_purchase": ASOF_SQL,
    "supplier_distinct_parts": SUPPLIER_DISTINCT_SQL,
    "orders_status_pivot": PIVOT_SQL,
    "top_part_per_nation": TOP_PART_SQL,
    "events_value_histogram": HISTOGRAM_SQL,
    "customer_segment_stats": SEGMENT_SQL,
    "dedup_exact_docs": DEDUP_EXACT_SQL,
    "token_stats": TOKEN_STATS_SQL,
    "quality_per_doc": QUALITY_SQL,
    "lang_id_eval": _lang_sql(),
    "fingerprint_docs": FINGERPRINT_SQL,
    "jaccard_pairs_docs": JACCARD_SQL,
    "embedding_topk": EMB_TOPK_SQL,
    "embedding_pairs": EMB_PAIRS_SQL,
    "crawl_pages": CRAWL_PAGES_SQL,
    "crawl_links": CRAWL_LINKS_SQL,
    "minhash_md5_docs": MINHASH_MD5_SQL,
    "minhash_md5_pairs_docs": MINHASH_MD5_PAIRS_SQL,
    "simhash_md5_docs": SIMHASH_MD5_SQL,
    "hamming_pairs_docs": HAMMING_SQL,
    "neardup_clusters_docs": NEARDUP_CLUSTERS_SQL,
    "dedup_keep_canonical_docs": KEEP_CANONICAL_SQL,
    # phash family: the oracle brute-forces pairs/closure over the PINNED
    # (image_id, phash) literals (_phash_fixture.py) while the Spark side
    # recomputes phash from synthesized bytes end-to-end (VERDICT r4 #4)
    "phash_pairs_images": _phash_pairs_sql(),
    "phash_clusters_images": _phash_clusters_sql(),
    "hamming_clusters_all_docs": HAMMING_CLUSTERS_ALL_SQL,
    "curate_training_docs": _curate_sql(),
    "curate_image_caption_pairs": _curate_images_sql(),
    # image decode family: oracled since r5 via pinned literals of the
    # REAL codec path (tools/gen_image_literals.py) — the Spark side
    # recomputes everything from bytes inside mapInPandas
    "image_invariants": _image_invariants_sql(),
    "image_feature_extract": _image_features_sql(),
    # xxhash sketch family: oracled since r5 via pinned literals from an
    # independent pure-Python XXH64 sketch pipeline
    # (tools/gen_xxhash_literals.py); the md5 twins above additionally
    # re-derive every stage inside DuckDB itself
    "simhash_docs": _simhash_xx_sql(),
    "minhash_pairs_docs": _minhash_xx_pairs_sql(),
}
