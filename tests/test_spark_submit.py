"""spark-submit --py-files deployment surface (north_rule: "run via
spark-submit --py-files on a multi-executor cluster"). The test ships
the engine package ONLY through the --py-files zip — the subprocess gets
a scratch cwd and no PYTHONPATH, so a passing run proves the archive is
self-contained, which is exactly what a real cluster's executors need.

Marked slow-ish (one JVM cold start ~30s); skipped when spark-submit is
absent so the suite stays runnable on bare-python checkouts."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_submit_crawl_via_pyfiles(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    # the job script is copied OUT of the repo so a bare `import
    # crawler_to_md_spark` can only be satisfied by the shipped zip
    job = tmp_path / "job.py"
    shutil.copyfile(os.path.join(REPO, "tools", "submit_crawl.py"), job)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         str(job),
         "--synth-pages", "40",
         "--store", str(tmp_path / "store"),
         "--url", "https://host0.example/p/0"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    out = json.loads(line)
    # 40-page synthetic corpus from /p/0: same shape the CLI end-to-end
    # test pins (28 crawlable pages; links include fetch-miss URLs)
    assert out["pages"] == 28
    assert out["links"] >= out["pages"]
    assert out["waves"] >= 3
