"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§1.5).

NOT the driver-timed bench (that is bench.py, frozen): this harness exists
so optimization work can time ONE query at a time with the noop sink under
the exact session/methodology bench.py::_headline_queries uses (same
get_spark config, same reps-with-warmup-min protocol), and so
`.explain("formatted")` plans can be captured into plans/r06/ without
hand-driving a REPL.

Usage:
  python bench_extra.py [--reps 3] [--sf /root/testdata/sf0.1]
      [--plans plans/r06 --suffix before] [--queries q1,q3,...]
Emits one JSON line: {"queries": {name: min_sec}, "passes": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import time


DEFAULT_QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "events_sessionize", "topk_per_user", "seen_antijoin",
    "dedup_exact_docs", "token_stats", "quality_per_doc",
    "minhash_pairs_docs", "embedding_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--plans", default=None,
                    help="directory to write <name>_<suffix>.txt explains")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from crawler_to_md_spark.queries import QUERIES
    from crawler_to_md_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    names = [n for n in args.queries.split(",") if n]

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)

    passes: list[dict[str, float]] = []
    for _ in range(args.reps):
        timings: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
        passes.append(timings)
    spark.stop()
    minima = {n: min(p[n] for p in passes) for n in names}
    print(json.dumps({"queries": minima, "passes": passes, "sf": args.sf,
                      "cpus": cpus}))


if __name__ == "__main__":
    main()
