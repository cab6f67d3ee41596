"""Visited-by-reference commits (r4): unconstrained waves mark the
previous frontier delta visited via a manifest-level virtual delta
(tables.py) instead of physically re-writing n_selected rows — the read
view must be IDENTICAL to the physical-append engine's, gate-skipped
rows must still be physically materialized and carved out, and resume
must work across a store written this way."""

import json
import os

from pyspark.sql import functions as F

from crawler_to_md_spark.crawl.corpus import synth_corpus, synth_corpus_rows
from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine
from crawler_to_md_spark.crawl.simulator import simulate_crawl
from crawler_to_md_spark.tables import SnapshotTable


def _visited_data_bytes(root: str) -> int:
    """Physically-written visited ROWS (parquet footers; the wave-0 empty
    append writes a 0-row file, so bytes alone can't distinguish)."""
    import pyarrow.parquet as pq

    total = 0
    ddir = os.path.join(root, "visited", "data")
    for dirpath, _dirs, files in os.walk(ddir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(
                    os.path.join(dirpath, f)
                ).metadata.num_rows
    return total


def test_unconstrained_wave_commits_visited_by_reference(spark, tmp_path):
    """Gate-passing rows (200/text-html corpus hits) must contribute ZERO
    physical visited rows — only corpus-miss/dangling URLs (gate-skipped)
    are materialized; the view is still exact."""
    n = 30
    root = str(tmp_path / "store")
    corpus = synth_corpus(spark, n_pages=n, n_hosts=1, branching=2, seed=7)
    # strip the synthetic 404/500/pdf quirks -> every corpus HIT passes
    # the gate (dangling/off-corpus links still miss -> skipped)
    corpus = corpus.withColumn("status", F.lit(200)).withColumn(
        "content_type", F.lit("text/html; charset=utf-8")
    )
    eng = CrawlEngine(spark, root, CrawlConfig(use_bloom=False))
    eng.run(corpus, single_url="https://host0.example/p/0")

    vis = eng.visited.read(spark)
    fr = eng.frontier.read(spark)
    assert vis.count() == fr.count()  # every discovered URL was visited
    # join-consistency: visited rows ARE the frontier rows, no dups
    assert vis.join(fr, ["url_hash", "url"], "left_anti").count() == 0
    assert vis.count() == vis.select("url_hash", "url").distinct().count()
    n_skipped = vis.filter(F.col("status") == "skipped").count()
    n_done = vis.filter(F.col("status") == "done").count()
    # done rows == pages table rows (gate-passed); they are VIRTUAL —
    # the only physical rows are the skipped subset
    assert n_done == eng.pages.read(spark).count()
    assert _visited_data_bytes(root) == n_skipped
    # and the manifests say so: virtual refs carry the done rows
    virt = eng.visited.current_snapshot().get("virtual")
    assert virt and all(spec["files"] for spec in virt)


def test_gate_skipped_subset_is_physical_and_carved_out(spark, tmp_path):
    """The default synthetic corpus has 404/500/pdf pages: those rows must
    be physically appended with status='skipped' and EXCLUDED from the
    virtual 'done' reference (no duplicate rows, correct statuses) — and
    the whole engine state must still match the sequential reference
    simulator."""
    n = 60
    rows = synth_corpus_rows(n_pages=n, n_hosts=3, branching=3, seed=42)
    corpus = synth_corpus(spark, n_pages=n, n_hosts=3, branching=3, seed=42)
    root = str(tmp_path / "store")
    eng = CrawlEngine(spark, root, CrawlConfig(use_bloom=False))
    eng.run(corpus, single_url="https://host0.example/p/0")
    sim = simulate_crawl(rows, single_url="https://host0.example/p/0",
                         seed_list_mode=False)

    vis = eng.visited.read(spark)
    # no duplicate membership rows despite the physical+virtual split
    assert vis.count() == vis.select("url_hash", "url").distinct().count()
    got = {(r["url"], r["status"]) for r in vis.collect()}
    # simulator: every visited link is either a page (done) or skipped
    want_done = {u for u, v in sim.links.items()
                 if v and u in sim.pages}
    want_skipped = {u for u, v in sim.links.items()
                    if v and u not in sim.pages}
    assert {u for u, s in got if s == "done"} == want_done
    assert {u for u, s in got if s == "skipped"} == want_skipped
    # skipped rows really are physical parquet
    assert _visited_data_bytes(root) > 0


def test_resume_over_elided_store(spark, tmp_path):
    """Kill after wave k of an elided-visited crawl, resume: final state
    equals an uninterrupted run (the resume path's pending anti-join reads
    through the virtual deltas)."""
    n = 40
    corpus = synth_corpus(spark, n_pages=n, n_hosts=3, branching=3, seed=42)
    full_root = str(tmp_path / "full")
    CrawlEngine(spark, full_root, CrawlConfig(use_bloom=False)).run(
        corpus, single_url="https://host0.example/p/0"
    )
    part_root = str(tmp_path / "part")
    eng = CrawlEngine(spark, part_root,
                      CrawlConfig(use_bloom=False, max_waves=2))
    eng.run(corpus, single_url="https://host0.example/p/0")
    eng2 = CrawlEngine(spark, part_root, CrawlConfig(use_bloom=False))
    eng2.run(corpus, single_url="https://host0.example/p/0", resume=True)

    full = CrawlEngine(spark, full_root, CrawlConfig(use_bloom=False))
    a = [(r["url"], r["visited"]) for r in full.links_state().collect()]
    b = [(r["url"], r["visited"]) for r in eng2.links_state().collect()]
    assert a == b


def test_constrained_wave_keeps_physical_append(spark, tmp_path):
    """A politeness-constrained crawl cannot elide (the selected set is a
    strict subset of the delta) — visited rows must be physical."""
    n = 30
    corpus = synth_corpus(spark, n_pages=n, n_hosts=3, branching=3, seed=42)
    root = str(tmp_path / "store")
    eng = CrawlEngine(
        spark, root,
        CrawlConfig(use_bloom=False, per_host_budget=3, max_waves=3),
    )
    eng.run(corpus, single_url="https://host0.example/p/0")
    assert _visited_data_bytes(root) > 0
    cur = eng.visited.current_snapshot()
    assert not cur.get("virtual")


def test_append_virtual_generic_roundtrip(spark, tmp_path):
    """tables.py virtual-delta mechanics in isolation: projection,
    constants, minus_files carve-out, and carry-forward across a later
    physical append."""
    src = SnapshotTable(str(tmp_path / "src"))
    man = src.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        {"wave": 0},
    )
    tbl = SnapshotTable(str(tmp_path / "tbl"))
    tbl.append(
        spark.createDataFrame([], "k long, v string, tag string"), {"wave": 0}
    )
    minus = tbl.append(
        spark.createDataFrame([(2, "b", "skip")],
                              "k long, v string, tag string"),
        {"wave": 1},
    )
    tbl.append_virtual(
        {"files": man["delta_files"], "select": ["k", "v"],
         "constants": [["tag", "string", "ok"]],
         "minus_files": minus["delta_files"]},
        {"wave": 1, "rows": 2},
    )
    got = sorted((r["k"], r["v"], r["tag"])
                 for r in tbl.read(spark).collect())
    assert got == [(1, "a", "ok"), (2, "b", "skip"), (3, "c", "ok")]
    # later physical appends carry the virtual entries forward
    tbl.append(
        spark.createDataFrame([(9, "z", "late")],
                              "k long, v string, tag string"),
        {"wave": 2},
    )
    assert tbl.read(spark).count() == 4
    assert len(tbl.current_snapshot()["virtual"]) == 1
    # rollback_to drops the virtual rows with the snapshot
    tbl.rollback_to(2)
    assert tbl.read(spark).count() == 1


def test_durable_commit_smoke(spark, tmp_path):
    """durable=True fsyncs and still round-trips (behavioral parity; the
    durability itself needs a power cut to observe)."""
    tbl = SnapshotTable(str(tmp_path / "d"), durable=True)
    tbl.append(spark.createDataFrame([(1,)], "k long"), {"wave": 0})
    assert [r["k"] for r in tbl.read(spark).collect()] == [1]


def test_elided_store_marker_rollback(spark, tmp_path):
    """Crash between the visited-by-ref commit and the marker: recovery
    rolls the virtual snapshot back (wave > marker)."""
    n = 30
    corpus = synth_corpus(spark, n_pages=n, n_hosts=1, branching=2, seed=7)
    corpus = corpus.withColumn("status", F.lit(200)).withColumn(
        "content_type", F.lit("text/html; charset=utf-8")
    )
    root = str(tmp_path / "store")
    eng = CrawlEngine(spark, root, CrawlConfig(use_bloom=False, max_waves=2))
    eng.run(corpus, single_url="https://host0.example/p/0")
    committed = eng.last_committed_wave()
    v_before = eng.visited.current_version()
    # hand-craft wave k+1's visited-by-ref landing WITHOUT a marker
    fr_delta = eng.frontier.current_snapshot()["delta_files"]
    eng.visited.append_virtual(
        {"files": fr_delta, "select": ["url_hash", "url"],
         "constants": [["wave_visited", "int", committed + 1],
                       ["status", "string", "done"]],
         "minus_files": []},
        {"wave": committed + 1, "rows": 1},
    )
    assert eng.visited.current_version() == v_before + 1
    eng2 = CrawlEngine(spark, root, CrawlConfig(use_bloom=False))
    assert eng2.recover() == committed
    assert eng2.visited.current_version() == v_before


def test_virtual_manifest_shape_is_json_clean(spark, tmp_path):
    """The manifest stays plain JSON (no Spark/py4j objects leak in)."""
    src = SnapshotTable(str(tmp_path / "src"))
    man = src.append(spark.createDataFrame([(1,)], "k long"), {"wave": 0})
    tbl = SnapshotTable(str(tmp_path / "tbl"))
    tbl.append(spark.createDataFrame([], "k long, t string"), {"wave": 0})
    tbl.append_virtual(
        {"files": man["delta_files"], "select": ["k"],
         "constants": [["t", "string", "x"]], "minus_files": []},
        {"wave": 1, "rows": 1},
    )
    with open(os.path.join(str(tmp_path / "tbl"), "_manifests",
                           "v000002.json")) as f:
        m = json.load(f)
    assert m["virtual"][0]["constants"] == [["t", "string", "x"]]
    assert m["delta_files"] == []


def test_pin_scan_splits_sets_and_run_restores_confs(spark, tmp_path):
    """_pin_scan_splits must size both file-split knobs to just above the
    largest delta file (one file -> one split: no bin-packing straggler on
    the steady wave's dominant stage), and run() must hand the session
    back with the pre-crawl values (other workloads must not inherit
    crawl-sized splits)."""
    keys = ("spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes")
    before = [spark.conf.get(k, None) for k in keys]

    root = str(tmp_path / "store")
    corpus = synth_corpus(spark, n_pages=30, n_hosts=1, branching=2, seed=7)
    eng = CrawlEngine(spark, root, CrawlConfig(use_bloom=False))

    # direct contract: the knobs land at max(4MB, largest file + 1)
    f1 = tmp_path / "a.bin"
    f1.write_bytes(b"x" * 100)
    eng._pin_scan_splits([str(f1)])
    assert spark.conf.get(keys[0]) == str(4 << 20)
    assert spark.conf.get(keys[1]) == str(4 << 20)
    big = 6 << 20
    f2 = tmp_path / "b.bin"
    f2.write_bytes(b"x" * big)
    eng._pin_scan_splits([str(f1), str(f2)])
    assert spark.conf.get(keys[0]) == str(big + 1)
    # missing files leave the session untouched (non-local stores)
    eng._pin_scan_splits([str(tmp_path / "nope.bin")])
    assert spark.conf.get(keys[0]) == str(big + 1)

    # end-to-end: a crawl retunes per wave, then restores on exit —
    # including to the UNSET state (the manual pins above are undone
    # first so the restore path exercises conf.unset)
    for k, v in zip(keys, before):
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    eng.run(corpus, single_url="https://host0.example/p/0")
    assert [spark.conf.get(k, None) for k in keys] == before


def test_frontier_delta_files_balanced_under_prefix_discovery(
    spark, tmp_path, monkeypatch
):
    """Delta-file BALANCE regression pin: new links concentrate in a
    PREFIX of the discovering wave's rank stride (in the synthetic tree
    only parents with pid*branching < corpus emit children), so any
    src_rank->bucket guess leaves tail buckets empty — at 8 cores the
    steady delta once landed in 4 files and the next wave's pinned
    one-split-per-file scan ran at half parallelism. The frontier append
    now repartitions by wrank*k/n_new (exact, distribution-free): every
    multi-file delta must have near-equal file sizes and the planned file
    count."""
    import crawler_to_md_spark.crawl.engine as eng_mod
    from crawler_to_md_spark.crawl.corpus import synth_fetch_df_fn

    # shrink rows-per-file so the ~3k-row wave-3 delta spans multiple
    # files at test scale (production: 50k rows/file)
    real_npart = eng_mod._npart
    monkeypatch.setattr(
        eng_mod, "_npart",
        lambda n, rows_per_file=500, cap=32: real_npart(n, 500, cap),
    )
    _npart = eng_mod._npart
    root = str(tmp_path / "store")
    # branching 30 over 4000 pages: wave 3 discovers ~3.8k links from
    # only the first ~130 of its 930 parents — the prefix-concentrated
    # shape that emptied tail buckets
    eng = CrawlEngine(
        spark, root,
        CrawlConfig(use_bloom=True,
                    fetch_df_fn=synth_fetch_df_fn(4000, 4, 30)),
    )
    eng.run(None, single_url="https://host0.example/p/0")

    wcap = spark.sparkContext.defaultParallelism
    checked = 0
    for s in eng.frontier.snapshots():
        files = s.get("delta_files")
        rows = int(s["summary"].get("rows", 0))
        if not files or rows < 100:
            continue
        k = _npart(rows, cap=wcap)
        assert len(files) == k, (rows, k, files)
        if len(files) > 1:
            sizes = [os.path.getsize(f) for f in files]
            assert max(sizes) <= 2 * min(sizes), sizes
            checked += 1
    assert checked >= 1  # at least one multi-file delta was exercised
