"""Build the --py-files archive for spark-submit deployment: a zip of
the crawler_to_md_spark package (source only, no caches/tests), laid out
so ``import crawler_to_md_spark`` works straight off the archive root —
the layout spark-submit prepends to every executor's (and the driver's)
sys.path. See tools/submit_crawl.py for the submit invocation."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str = "/tmp/crawler_to_md_spark.zip") -> str:
    pkg = os.path.join(REPO, "crawler_to_md_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


def main() -> None:
    print(build())


if __name__ == "__main__":
    main()
