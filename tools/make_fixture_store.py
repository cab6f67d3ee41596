"""Generate the cross-version resume fixture: a crawl store written by a
FROZEN engine version (run once per format change and checked into
tests/fixtures/), later resumed by the current code in
tests/test_resume.py::test_resume_store_written_by_previous_version.

The store is cut off mid-crawl (max_waves=2) so the resume path has real
work left. Manifests carry absolute datafile paths (like Iceberg manifests
carry absolute URIs); fixture_meta.json records the generation root so the
test can relocate them.

NB (ADVICE r3): the fixture emulates the ROUND-2 store format — no
commits.jsonl marker log (visited append == commit point), physical
visited rows, numpy bloom. Re-running this under the CURRENT engine would
silently write the modern format and stop exercising the legacy fallback,
so main() strips the artifacts the r2 format lacked and ASSERTS the
result still looks legacy. Regenerate only from the frozen r2 revision if
the legacy shape itself must change.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_to_md_spark.crawl.corpus import synth_corpus  # noqa: E402
from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine  # noqa: E402
from crawler_to_md_spark.session import get_spark  # noqa: E402

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "store_r2",
)


def main() -> None:
    spark = get_spark("make-fixture", master="local[2]", shuffle_partitions=4)
    shutil.rmtree(FIXTURE, ignore_errors=True)
    os.makedirs(FIXTURE, exist_ok=True)
    corpus = synth_corpus(spark, n_pages=20, n_hosts=3, branching=3, seed=42)
    # tiny bloom so the checked-in fixture stays small (the format is the
    # same npz regardless of shard geometry)
    eng = CrawlEngine(spark, FIXTURE, CrawlConfig(
        use_bloom=True, max_waves=2, bloom_shards=4,
        bloom_bits_per_shard=1 << 16,
    ))
    metrics = eng.run(corpus, single_url="https://host0.example/p/0")
    # strip modern-format artifacts the r2 store never had (docstring NB)
    marker_log = os.path.join(FIXTURE, "commits.jsonl")
    if os.path.exists(marker_log):
        os.remove(marker_log)
    assert not os.path.exists(marker_log)
    from crawler_to_md_spark.tables import SnapshotTable  # noqa: E402

    for m in SnapshotTable(os.path.join(FIXTURE, "visited")).snapshots():
        assert "virtual" not in m, (
            "current engine wrote virtual visited deltas — regenerate the "
            "fixture from the frozen r2 revision instead"
        )
    with open(os.path.join(FIXTURE, "fixture_meta.json"), "w") as f:
        json.dump(
            {
                "generated_by": "engine format as of round 2",
                "root": FIXTURE,
                "n_pages": 20, "n_hosts": 3, "branching": 3, "seed": 42,
                "max_waves": 2,
                "waves_run": [m["wave"] for m in metrics],
            },
            f, indent=2,
        )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
