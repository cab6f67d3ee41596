"""Politeness / priority scheduling: salted host-keyed window quotas.

The reference rate-limits GLOBALLY and sequentially: at most ``rate_limit``
requests per 60s window plus a fixed inter-request ``delay``
(scraper.py:285-321). A parallel engine expresses the same budget
relationally — "which frontier rows may fetch this wave" — and adds the
per-host fairness the reference lacks (north_rule: "per-host politeness
buckets ... salted hash-partitioned priority queues (host-hash keyed,
depth/priority ordered window ranks) to avoid hot-host skew").

- Quota = row_number over Window.partitionBy(host) ordered by
  (depth, priority, discovery_rank), keep rank <= per_host_budget.
- Hot-host skew: AQE does NOT rebalance window partitions, so hosts whose
  pending count exceeds ``salt_threshold`` are split across S salt buckets
  (salt = pmod(url_hash, S)) with per-bucket budget ceil(budget/S). The
  salted window is an approximation of the exact global top-k per host —
  it may pick a different SUBSET of equal-priority rows, never more than
  the budget; deferred rows stay pending and fetch next wave, so the final
  crawl SET is unchanged (tests/test_politeness.py proves both properties).
- A global per-wave budget (the reference's rate_limit parity knob) is a
  range-partition-friendly global top-k by discovery_rank.

Deferred rows are NOT marked visited — they simply stay pending, exactly
like URLs the reference hasn't reached yet inside its serial 60s window.

Robots gate: a broadcast-joined per-host rules table (host -> disallowed
path prefixes), default-permissive (C7 — the reference never reads
robots.txt, so parity runs pass an empty rules table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_host_quota(
    pending: DataFrame,
    per_host_budget: int,
    order_cols: list[str] | None = None,
    host_col: str = "host",
    hash_col: str = "url_hash",
    salt: int = 8,
    salt_threshold: int = 100_000,
) -> DataFrame:
    """Keep at most ``per_host_budget`` rows per host this wave.

    Hosts with <= salt_threshold pending rows take the exact window path;
    hotter hosts take the salted path (S sub-windows, budget/S each).
    Returns the selected rows with original columns.
    """
    order_cols = order_cols or ["depth", "discovery_rank"]
    counts = pending.groupBy(host_col).agg(F.count("*").alias("_host_n"))
    # no broadcast HINT on counts: one row per distinct host is small at
    # sandbox scale but multi-GB at a 10^8-host frontier — AQE picks
    # broadcast vs shuffle from the aggregate's runtime size instead
    df = pending.join(counts, host_col)

    cold = df.filter(F.col("_host_n") <= salt_threshold)
    w_cold = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in order_cols])
    cold_sel = (
        cold.withColumn("_rk", F.row_number().over(w_cold))
        .filter(F.col("_rk") <= per_host_budget)
    )

    hot = df.filter(F.col("_host_n") > salt_threshold)
    per_bucket = max(1, -(-per_host_budget // salt))  # ceil
    w_hot = Window.partitionBy(
        host_col, F.pmod(F.col(hash_col), F.lit(salt))
    ).orderBy(*[F.col(c) for c in order_cols])
    hot_sel = (
        hot.withColumn("_rk", F.row_number().over(w_hot))
        .filter(F.col("_rk") <= per_bucket)
    )
    return cold_sel.unionByName(hot_sel).drop("_rk", "_host_n")


def apply_global_budget(
    pending: DataFrame, budget: int, order_col: str = "discovery_rank",
    large_threshold: int = 1_000_000, persist_registry: list | None = None,
) -> DataFrame:
    """Reference-parity global budget: the first ``budget`` pending rows in
    frontier order fetch this wave (scraper.py:302-314 generalized — one
    wave == one rate window).

    Small budgets (the reference's rate_limit regime, <= ``large_threshold``)
    use sort+limit: Spark's TakeOrdered keeps a per-partition top-k heap
    and merges k rows on the driver — distributed and cheap when k is
    small. LARGE budgets must not: a global limit funnels the k kept rows
    through a single partition. They take the distributed-rank path
    instead (range partition + per-partition offsets, operators/rank.py)
    and filter rank < budget — no single-partition stage at any k.
    ``persist_registry``, when given, receives the rank's pinned cache for
    the caller to unpersist after its consuming actions.
    """
    if budget <= large_threshold:
        return pending.orderBy(order_col).limit(budget)
    from .rank import with_global_rank

    ranked, _total, pinned = with_global_rank(
        pending, [order_col], rank_col="_gb_rank"
    )
    if persist_registry is not None:
        persist_registry.append(pinned)
    return ranked.filter(F.col("_gb_rank") < budget).drop("_gb_rank")


def parse_robots_txt(text: str, agent: str = "*") -> list[str]:
    """Disallow path-prefixes applying to ``agent`` from a robots.txt body
    (minimal RFC 9309 grouping: consecutive User-agent lines open a group;
    a group's Disallow rules apply if it names ``agent`` or ``*``; empty
    Disallow means allow-all and contributes nothing). The reference never
    reads robots.txt (C7 default-permissive); this parser feeds the
    robots_gate rules table on real crawls."""
    groups: list[tuple[set, list]] = []   # (agents, disallows)
    current: set[str] = set()
    rules: list[str] = []
    rules_seen = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if rules_seen:          # a new group starts
                groups.append((current, rules))
                current, rules, rules_seen = set(), [], False
            current.add(val.lower())
        elif key in ("disallow", "allow"):
            rules_seen = True
            if key == "disallow" and val:
                rules.append(val)
    if current or rules:
        groups.append((current, rules))
    # RFC 9309 group selection: a crawler obeys the most-specific matching
    # group(s) — the '*' groups apply ONLY when no group names the agent
    a = agent.lower()
    named = [r for agents, rs in groups if a in agents for r in rs]
    if any(a in agents for agents, _ in groups):
        return named
    return [r for agents, rs in groups if "*" in agents for r in rs]


def robots_rules_table(spark, bodies: dict[str, str], agent: str = "*"):
    """(host -> robots.txt body) -> the (host, disallow_prefix) rules table
    robots_gate consumes. Robots files are one small document per host, so
    parsing is driver-side; the table is broadcast at join time."""
    rows = [
        (host, prefix)
        for host, text in bodies.items()
        for prefix in parse_robots_txt(text, agent)
    ]
    return spark.createDataFrame(rows, "host string, disallow_prefix string")


def robots_gate(
    pending: DataFrame, rules: DataFrame | None, url_col: str = "url",
    host_col: str = "host"
) -> DataFrame:
    """Filter rows whose URL path matches a disallowed prefix for its host.

    ``rules``: (host string, disallow_prefix string) — small, broadcast.
    None/empty => default-permissive (reference has no robots handling).
    """
    # NOTE: no rules.isEmpty() probe — that is a Spark job, and this gate
    # runs once per wave. Callers pass None when there are no rules
    # (CrawlEngine.run normalizes empty->None once per run); an empty
    # rules table still short-circuits correctly below (empty blocked set).
    if rules is None:
        return pending
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    joined = pending.withColumn("_path", path).join(
        F.broadcast(rules), host_col, "left"
    )
    blocked = F.col("disallow_prefix").isNotNull() & F.col("_path").startswith(
        F.col("disallow_prefix")
    )
    # a URL is allowed iff NO rule blocks it -> anti-join shape
    blocked_keys = (
        joined.filter(blocked).select(url_col).distinct()
    )
    return pending.join(blocked_keys, url_col, "left_anti")
