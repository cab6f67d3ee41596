"""Physical-plan audit: capture .explain('formatted') for the headline
queries and assert the plan properties that matter at 100 TB:

- parquet scans carry PushedFilters / pruned ReadSchema where expected;
- small dimension joins go broadcast;
- no single-partition Exchange (rangepartitioning(1)/SinglePartition)
  appears outside intentional final top-k collection;
- column-expression pipelines run inside WholeStageCodegen spans.

Writes PLANS.md at the repo root. Usage: python tools/audit_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_to_md_spark.queries import QUERIES  # noqa: E402
from crawler_to_md_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDITED = {
    "q1_pricing_summary": {
        # formatted-mode AQE plans don't label codegen spans; the partial
        # HashAggregate below the Exchange is the map-side combine proof
        "expect": ["PushedFilters: [IsNotNull(l_shipdate)",
                   "Functions [8]: [partial_sum"],
        "forbid": [],
        "note": "shipdate predicate pushed to the parquet scan; "
                "partial_sum before the exchange (map-side combine)",
    },
    "q3_top_orders": {
        "expect": ["BroadcastHashJoin", "PushedFilters"],
        "forbid": [],
        "note": "BUILDING customers broadcast; date filters pushed down",
    },
    "q5_nation_revenue": {
        "expect": ["BroadcastHashJoin"],
        "forbid": [],
        "note": "region/nation dims broadcast; fact-side joins shuffle on keys",
    },
    "topk_per_user": {
        "expect": ["Window", "hashpartitioning(user_id"],
        "forbid": ["SinglePartition"],
        "note": "window partitioned by user_id — never a global window",
    },
    "seen_antijoin": {
        "expect": ["LeftAnti"],
        "forbid": [],
        "note": "anti-join (J1 shape); runtime bloom may prune the probe",
    },
    "dedup_exact_docs": {
        "expect": ["Window", "hashpartitioning(_k"],
        "forbid": ["SinglePartition"],
        "note": "first-write-wins via per-key window, keyed shuffle only",
    },
    "minhash_pairs_docs": {
        # the LSH self-join must key on (band,bucket) with id-only rows;
        # shingle arrays re-enter ONLY via the id-keyed verify joins
        # (which AQE may legitimately broadcast at small SF) — asserted by
        # the node-level check below (no shingles in the band exchange)
        "expect": ["hashpartitioning(band"],
        "forbid": ["SinglePartition"],
        "node_check": ("hashpartitioning(band", "shingles"),
        "note": "banded bucket self-join carries ids only; shingles join "
                "back by id for the exact-Jaccard verify (r2 restructure)",
    },
    "hamming_pairs_docs": {
        # the banded self-join must never degenerate to all-pairs; at
        # sf0.01 AQE broadcasts the tiny banded side, at scale it keys
        # the exchange on (band,key) — assert the verify is JVM
        # bit_count (no UDF) and nothing goes single-partition/cartesian
        "expect": ["bit_count"],
        "forbid": ["SinglePartition", "CartesianProduct"],
        "note": "pigeonhole banding join + bit_count(xor) hamming verify "
                "(generic engine behind simhash AND image phash dedup)",
    },
    "embedding_topk": {
        "expect": ["BroadcastNestedLoopJoin", "Window"],
        "forbid": [],
        "note": "query set broadcast against the corpus scan; "
                "per-query window rank",
    },
    "hamming_clusters_all_docs": {
        # the linear-output consumer (r5): exact-equal fingerprints
        # collapse via a keyed aggregate BEFORE banding, components run
        # over family reps (their banding join's bit_count verify sits
        # behind the components' localCheckpoint lineage cut, so it is
        # audited under hamming_pairs_docs), members re-attach by
        # fingerprint, sizes come from a cluster-keyed window — nothing
        # single-partition or cartesian in the output plan
        "expect": ["Window", "hashpartitioning(cluster_id"],
        "forbid": ["SinglePartition", "CartesianProduct"],
        "note": "family collapse (groupBy h) -> rep-level banding join -> "
                "large-star/small-star components -> member re-join; "
                "output linear in input even for degenerate dup families",
    },
    "curate_training_docs": {
        # the one-call curation composite (r5): the lang/quality gates
        # are column expressions fused into pruned document scans (text/
        # doc_id/source only — never the full row), the dedup stage's
        # anti-join keys on doc_id, and nothing in the pipeline
        # serializes to one partition or goes cartesian
        "expect": ["ReadSchema: struct<doc_id:bigint,text:string,"
                   "source:string>",
                   "LeftAnti"],
        "forbid": ["SinglePartition", "CartesianProduct"],
        "note": "gates fused into pruned scans; canonical-keep anti-join "
                "on doc_id; composite stays fully distributed",
    },
    "curate_image_caption_pairs": {
        # the image-corpus curation composite (r5): caption gates are JVM
        # column expressions, the dedup fingerprint is the STORED phash
        # (no decode anywhere in the plan — the bytes column never enters
        # it), the phash banding join's bit_count verify sits behind the
        # components' localCheckpoint cut (audited under
        # hamming_pairs_docs), and the canonical keep is an anti-join on
        # image_id — nothing single-partition or cartesian
        "expect": ["LeftAnti"],
        "forbid": ["SinglePartition", "CartesianProduct"],
        "note": "caption lang/token gates as column exprs; stored-phash "
                "banding dedup (zero decode); canonical-keep anti-join "
                "on image_id",
    },
}


def _politeness_frontier(spark):
    from pyspark.sql import functions as F

    return spark.range(2_000).select(
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".x/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                 F.lit(".x")).alias("host"),
        (F.col("id") % 3).cast("int").alias("depth"),
        F.col("id").alias("discovery_rank"),
    )


def _audit_host_quota(spark):
    from crawler_to_md_spark.operators.politeness import apply_host_quota

    return apply_host_quota(_politeness_frontier(spark), per_host_budget=10)


def _audit_global_budget_large(spark):
    from crawler_to_md_spark.operators.politeness import apply_global_budget

    caches: list = []
    df = apply_global_budget(_politeness_frontier(spark), budget=1_500_000,
                             large_threshold=1_000_000,
                             persist_registry=caches)
    return df


def _audit_bloom_anti_join(spark):
    from crawler_to_md_spark.operators.seen import (
        JvmBloomSeenSet,
        anti_join_new,
    )

    seen = _politeness_frontier(spark).select("url_hash", "url")
    cands = _politeness_frontier(spark).select("url_hash", "url")
    bloom = JvmBloomSeenSet(spark, num_bits=1 << 14)  # tiny: keeps the
    bloom.add_distributed(seen)                       # plan text readable
    caches: list = []
    df = anti_join_new(cands, seen, bloom=bloom, persist_registry=caches)
    return df


def _audit_bloom_anti_join_large(spark):
    # past _LITERAL_PROBE_MAX the blob becomes a scalar subquery: the plan
    # must stay hex-free (a multi-MB literal is re-rendered per AQE plan
    # event) while the probe remains the codegen might_contain expression
    from crawler_to_md_spark.operators.seen import (
        JvmBloomSeenSet,
        anti_join_new,
    )
    from pyspark.sql import functions as F

    seen = spark.range(100_000).select(
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("https://h.x/p/"), F.col("id")).alias("url"),
    )
    cands = spark.range(120_000).select(
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("https://h.x/p/"), F.col("id")).alias("url"),
    )
    bloom = JvmBloomSeenSet(spark, num_bits=1 << 21)  # 256 KB blob
    bloom.add_distributed(seen)
    caches: list = []
    df = anti_join_new(cands, seen, bloom=bloom, persist_registry=caches)
    return df


def _cluster_edges(spark):
    from pyspark.sql import functions as F

    return spark.range(5_000).select(
        (F.col("id") % 997).alias("id_a"),
        ((F.col("id") * 31) % 997).alias("id_b"),
    )


def _audit_cluster_iteration(spark):
    # ONE large-star + small-star pass — the body the fixpoint loop
    # repeats; connected_components itself materializes eagerly via
    # localCheckpoint so only the iteration plan is auditable
    from crawler_to_md_spark.operators.cluster import (
        _large_star,
        _small_star,
    )
    from pyspark.sql import functions as F

    e = _cluster_edges(spark).select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )
    return _small_star(_large_star(e))


def _audit_keep_canonical(spark):
    from crawler_to_md_spark.operators.cluster import keep_canonical
    from pyspark.sql import functions as F

    docs = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
    )
    return keep_canonical(docs, _cluster_edges(spark))


# operator-level audits (not QUERIES entries): builder -> plan assertions.
# `expect_analyzed` / `forbid_analyzed` run against explain('extended')
# (hints are visible only pre-optimization).
AUDITED_OPS = {
    "politeness_host_quota": {
        "build": _audit_host_quota,
        "expect": [],
        "forbid": [],
        # no FORCED broadcast of the per-host count table: one row per
        # distinct host is multi-GB at a 10^8-host frontier. AQE may still
        # CHOOSE broadcast from runtime stats — that is the point.
        "forbid_analyzed": ["ResolvedHint"],
        "note": "per-host counts join carries no broadcast hint "
                "(AQE decides from runtime size)",
    },
    "seen_bloom_anti_join": {
        "build": _audit_bloom_anti_join,
        # the seen-set probe must be the codegen might_contain expression
        # (r4): no Python/Arrow eval stage anywhere in the wave's hottest
        # stream, and the exact backing join stays LeftAnti on the key
        "expect": ["might_contain", "LeftAnti"],
        "forbid": ["ArrowEvalPython", "BatchEvalPython"],
        "forbid_analyzed": [],
        "note": "bloom probe runs JVM-side inside codegen (might_contain "
                "over the filter blob — literal at this size); "
                "definitely-new rows skip the shuffle, maybe-seen rows "
                "take the exact anti-join",
    },
    "seen_bloom_anti_join_large_blob": {
        "build": _audit_bloom_anti_join_large,
        "expect": ["might_contain", "LeftAnti"],
        "forbid": ["ArrowEvalPython", "BatchEvalPython"],
        "forbid_analyzed": [],
        # the size bound IS the assertion: a literal blob would hex-render
        # to >500k chars in this plan string
        "max_plan_chars": 100_000,
        "note": "past _LITERAL_PROBE_MAX the blob rides as a scalar "
                "subquery over a one-row relation: plan strings stay "
                "hex-free (a multi-MB literal re-renders per AQE plan "
                "event — GC churn that 10x'd the steady wave), probe "
                "stays codegen might_contain",
    },
    "cluster_star_iteration": {
        "build": _audit_cluster_iteration,
        # each contraction iteration is groupBy(u)+join(u) passes: keyed
        # shuffles only, pure JVM exprs, edge set never self-joined raw
        "expect": ["hashpartitioning(u"],
        "forbid": ["SinglePartition", "CartesianProduct",
                   "ArrowEvalPython", "BatchEvalPython"],
        "forbid_analyzed": [],
        "note": "large-star/small-star iteration: min-label groupBy and "
                "label join both key on the node id — no global "
                "structures, no Python in the loop body",
    },
    "cluster_keep_canonical": {
        "build": _audit_keep_canonical,
        # the dedup application: docs anti-join the non-canonical ids
        "expect": ["LeftAnti"],
        "forbid": ["SinglePartition", "CartesianProduct"],
        "forbid_analyzed": [],
        "note": "kept set = docs LEFT ANTI JOIN non-canonical members on "
                "the doc id (AQE broadcasts the small build side; keyed "
                "shuffle at scale)",
    },
    "politeness_global_budget_large": {
        "build": _audit_global_budget_large,
        # large budgets rank via range partition + per-partition offsets:
        # no GlobalLimit funnel, no single-partition exchange
        "expect": [],
        "forbid": ["GlobalLimit", "CollectLimit", "SinglePartition"],
        "forbid_analyzed": [],
        "note": "budget > threshold takes the distributed-rank path: "
                "filter on a range-partitioned rank, never a global limit",
    },
}


def main() -> None:
    spark = get_spark("plan-audit")
    sections = []
    failures = []
    for name, spec in AUDITED.items():
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        ok = True
        missing = [e for e in spec["expect"] if e not in plan]
        present = [f for f in spec["forbid"] if f in plan]
        if "node_check" in spec:
            # node-granular assertion: every formatted-plan node section
            # matching `marker` must NOT mention `banned` (e.g. the
            # band/bucket exchange must not carry shingle payloads)
            marker, banned = spec["node_check"]
            for chunk in plan.split("\n\n"):
                if marker in chunk and banned in chunk:
                    present.append(f"{banned} in {marker} node")
        if missing or present:
            ok = False
            failures.append((name, missing, present))
        status = "OK" if ok else f"FAIL missing={missing} forbidden={present}"
        sections.append(
            f"## {name} — {status}\n\n{spec['note']}\n\n```\n{plan}\n```\n"
        )
    for name, spec in AUDITED_OPS.items():
        df = spec["build"](spark)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        buf2 = io.StringIO()
        with redirect_stdout(buf2):
            df.explain("extended")
        analyzed = buf2.getvalue()
        missing = [e for e in spec["expect"] if e not in plan]
        present = [f for f in spec["forbid"] if f in plan]
        present += [f"{f} (analyzed)" for f in spec["forbid_analyzed"]
                    if f in analyzed]
        if "max_plan_chars" in spec and len(plan) > spec["max_plan_chars"]:
            present.append(
                f"plan_chars={len(plan)}>{spec['max_plan_chars']}"
            )
        ok = not (missing or present)
        if not ok:
            failures.append((name, missing, present))
        status = "OK" if ok else f"FAIL missing={missing} forbidden={present}"
        sections.append(
            f"## {name} — {status}\n\n{spec['note']}\n\n```\n{plan}\n```\n"
        )
    header = (
        "# PLANS — physical-plan audit (generated by tools/audit_plans.py)\n\n"
        f"sf_dir={SF_DIR}. Asserted properties: predicate pushdown reaches\n"
        "parquet scans, small dims broadcast, keyed (never single-partition)\n"
        "windows, whole-stage codegen on column pipelines.\n\n"
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(header + "\n".join(sections))
    for name, missing, present in failures:
        print(f"FAIL {name}: missing={missing} forbidden={present}")
    n_total = len(AUDITED) + len(AUDITED_OPS)
    print(f"{n_total - len(failures)}/{n_total} plan audits ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
