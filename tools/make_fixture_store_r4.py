"""Generate the ROUND-4-format resume fixture (tests/fixtures/store_r4):
a crawl store written by the engine as of round 4 — commits.jsonl marker
log, visited committed BY REFERENCE (manifest-level virtual deltas
pointing at frontier delta files), and the JVM-sketch bloom (JBLOOM1
magic in bloom/seen.npz). Checked in so round-5+ refactors cannot
silently break READING the format today's stores are written in
(VERDICT r4 #7), the way store_r2 pins the legacy format.

The store is cut off mid-crawl (max_waves=2) so the resume path has real
work left. main() ASSERTS the modern artifacts are present — if a future
engine stops producing them, regenerate from the frozen round-4/5
revision instead of re-running this blindly.
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
    "tests", "fixtures", "store_r4",
)


def main() -> None:
    spark = get_spark("make-fixture-r4", master="local[2]",
                      shuffle_partitions=4)
    shutil.rmtree(FIXTURE, ignore_errors=True)
    os.makedirs(FIXTURE, exist_ok=True)
    corpus = synth_corpus(spark, n_pages=20, n_hosts=3, branching=3, seed=42)
    # tiny bloom so the checked-in fixture stays small
    eng = CrawlEngine(spark, FIXTURE, CrawlConfig(
        use_bloom=True, max_waves=2, bloom_shards=4,
        bloom_bits_per_shard=1 << 16,
    ))
    metrics = eng.run(corpus, single_url="https://host0.example/p/0")

    # assert the store carries every round-4 format feature the fixture
    # exists to pin
    marker_log = os.path.join(FIXTURE, "commits.jsonl")
    assert os.path.exists(marker_log), "round-4 stores have a marker log"
    from crawler_to_md_spark.tables import SnapshotTable  # noqa: E402

    visited = SnapshotTable(os.path.join(FIXTURE, "visited"))
    assert any(
        "virtual" in m for m in visited.snapshots()
    ), "round-4 stores commit visited BY REFERENCE on unconstrained waves"
    with open(os.path.join(FIXTURE, "bloom", "seen.npz"), "rb") as f:
        assert f.read(7) == b"JBLOOM1", "round-4 blooms are the JVM sketch"

    with open(os.path.join(FIXTURE, "fixture_meta.json"), "w") as f:
        json.dump(
            {
                "generated_by": "engine format as of round 4 "
                                "(virtual visited + marker log + JVM bloom)",
                "root": FIXTURE,
                "n_pages": 20, "n_hosts": 3, "branching": 3, "seed": 42,
                "max_waves": 2,
                "waves_run": [m["wave"] for m in metrics if not m.get("done")],
            },
            f, indent=2,
        )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
