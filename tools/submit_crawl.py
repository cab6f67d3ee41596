"""spark-submit entry point for the crawl engine (north_rule: "runs via
spark-submit --py-files on multi-executor clusters").

Ships nothing but this file; the engine package arrives via --py-files:

    cd /root/repo && python -c "import tools.make_pyfiles as m; m.main()"
    spark-submit --master local[8] \
        --py-files /tmp/crawler_to_md_spark.zip \
        tools/submit_crawl.py --synth-pages 1000 \
        --store /tmp/submit_store --url https://host0.example/p/0

On a real cluster the same invocation takes --master yarn/k8s:// and the
executors import the package from the shipped zip — the job body below
is identical. Prints ONE JSON line: {"pages": N, "links": M, "waves": K}.

The script deliberately imports crawler_to_md_spark at module scope:
spark-submit prepends the --py-files archive to the driver's sys.path
before executing the script, so a clean import here proves the archive
is self-contained (no reliance on the repo checkout being importable).
"""

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--url", required=True)
    p.add_argument("--store", required=True)
    p.add_argument("--corpus", default=None,
                   help="parquet corpus path (fetch-join mode)")
    p.add_argument("--synth-pages", type=int, default=None,
                   help="synthesize an N-page corpus in-job instead")
    p.add_argument("--base-url", default="https://")
    args = p.parse_args(argv)

    # spark-submit owns master/conf; getOrCreate picks up its session
    from pyspark.sql import SparkSession

    from crawler_to_md_spark.crawl.corpus import synth_corpus
    from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine

    spark = SparkSession.builder.appName("crawler-to-md-submit").getOrCreate()
    if args.synth_pages:
        corpus = synth_corpus(spark, n_pages=args.synth_pages)
    elif args.corpus:
        corpus = spark.read.parquet(args.corpus)
    else:
        print("need --corpus or --synth-pages", file=sys.stderr)
        return 2

    eng = CrawlEngine(spark, args.store,
                      CrawlConfig(base_url=args.base_url))
    wave_metrics = eng.run(corpus, single_url=args.url)
    pages = eng.pages_df().count()
    links = eng.links_state().count()
    print(json.dumps(
        {"pages": pages, "links": links, "waves": len(wave_metrics)}
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
