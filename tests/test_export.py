"""Export parity: engine exports vs a literal re-statement of the
reference's export loops (export_manager.py:63-175) run over the
simulator's pages."""

import json

from crawler_to_md_spark.crawl.corpus import synth_corpus, synth_corpus_rows
from crawler_to_md_spark.crawl.engine import CrawlConfig, CrawlEngine
from crawler_to_md_spark.crawl.simulator import simulate_crawl
from crawler_to_md_spark.operators.export import (
    compiled_json_rows,
    compiled_markdown,
    export_individual_markdown,
    individual_paths,
)

TITLE = "Test Export"


# --- literal reference export semantics (export_manager.py) ---------------

def ref_adjust_headers(content, level_increment=1):
    new_content = ""
    for line in content.split("\n"):
        if line.startswith("#"):
            hashes = len(line.split(" ")[0])
            new_hashes = min(hashes + level_increment, 6)
            line = "\n" + "#" * new_hashes + line[hashes:] + "\n"
        new_content += line + "\n"
    return new_content


def ref_cleanup(content):
    while "\n\n\n" in content:
        content = content.replace("\n\n\n", "\n\n")
    return content


def ref_concatenate(pages, title):
    final_content = f"# {title}\n"
    for url, content, metadata in pages:
        if content is None:
            continue
        filtered = {k: v for k, v in json.loads(metadata).items() if v is not None}
        mc = "<!--\n" + f"URL: {url}\n"
        for k, v in filtered.items():
            mc += f"{k}: {v}\n"
        mc += "-->"
        adjusted = ref_adjust_headers(content)
        final_content += "\n" + mc + "\n\n" + adjusted + "\n---"
        final_content = ref_cleanup(final_content)
    return final_content


def ref_json_rows(pages):
    out = []
    for url, content, metadata in pages:
        if content is None:
            continue
        content = ref_cleanup(content)
        filtered = {k: v for k, v in json.loads(metadata).items() if v is not None}
        out.append({"url": url, "content": content, "metadata": filtered})
    return out


# ---------------------------------------------------------------------------

def _crawl(spark, tmp_path, n_pages=60):
    rows = synth_corpus_rows(n_pages=n_pages, n_hosts=3, branching=3, seed=42)
    corpus = synth_corpus(spark, n_pages=n_pages, n_hosts=3, branching=3, seed=42)
    eng = CrawlEngine(spark, str(tmp_path / "store"),
                      CrawlConfig(use_bloom=False))
    eng.run(corpus, single_url="https://host0.example/p/0")
    sim = simulate_crawl(rows, single_url="https://host0.example/p/0",
                         seed_list_mode=False)
    sim_pages = [(u, c, m) for u, (c, m) in sim.pages.items()]
    return eng, sim_pages


def test_compiled_markdown_byte_exact(spark, tmp_path):
    eng, sim_pages = _crawl(spark, tmp_path)
    got = compiled_markdown(eng.pages_df(), TITLE)
    want = ref_concatenate(sim_pages, TITLE)
    assert got == want


def test_compiled_json_byte_exact(spark, tmp_path):
    eng, sim_pages = _crawl(spark, tmp_path)
    got = json.dumps(compiled_json_rows(eng.pages_df()),
                     ensure_ascii=False, indent=4)
    want = json.dumps(ref_json_rows(sim_pages), ensure_ascii=False, indent=4)
    assert got == want


def test_individual_paths(spark):
    df = spark.createDataFrame(
        [
            ("https://h.example/a/b", "x", 1),
            ("https://h.example/dir/", "y", 2),
            ("https://h.example/", "z", 3),
            ("https://h.example/nul", None, 4),
        ],
        "url string, content string, discovery_rank long",
    )
    rows = {r["url"]: r["relpath"] for r in individual_paths(df).collect()}
    assert rows == {
        "https://h.example/a/b": "h.example/a/b.md",
        "https://h.example/dir/": "h.example/dir/index.md",
        "https://h.example/": "h.example/index.md",
    }
    with_base = {r["url"]: r["relpath"]
                 for r in individual_paths(df, "https://h.example/").collect()}
    assert with_base["https://h.example/a/b"] == "a/b.md"
    assert with_base["https://h.example/"] == "index.md"


def test_individual_export_writes_tree(spark, tmp_path):
    eng, _ = _crawl(spark, tmp_path, n_pages=30)
    root = export_individual_markdown(eng.pages_df(), str(tmp_path / "out"))
    import os

    files = []
    for dirpath, _, fnames in os.walk(root):
        files += [os.path.join(dirpath, f) for f in fnames]
    n_pages = eng.pages_df().filter("content is not null").count()
    assert len(files) == n_pages
    assert all(f.endswith(".md") for f in files)
