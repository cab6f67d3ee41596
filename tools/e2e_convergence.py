#!/usr/bin/env python
"""One-shot validation of the E2E AMORTIZATION claim in BENCH/BASELINE.md:
at a corpus large enough that steady-size waves dominate the wave count,
the end-to-end N->4N efficiency converges to the steady-state row
(the gap at the default 1M corpus is the per-wave fixed floor, not a
scaling property of the engine).

Runs bench.py --crawl-only at BOTH pinned levels (lo first) with a
larger corpus — default 4M pages, which at branching 128 yields TWO
steady-size waves (~2.1M + ~1.9M) after the three fixed-cost ones —
and writes BENCH/evidence_r5_e2e_convergence_<stamp>.json with both
raw runs and the derived efficiencies.

Run it INSIDE a quiet window (tools/probe_quiet.py agrees) while
holding /tmp/spark_graft_busy, exactly like the watcher does for the
main bench: a storm invalidates the pair the same way it invalidates a
round. Expect ~8-12 minutes wall (the 2-core leg crawls 4M URLs).

Usage: python tools/e2e_convergence.py [pages] [lo_cpus] [hi_cpus]
"""
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, pages: int) -> dict | None:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "bench.py"), "--crawl-only",
           str(cpus), str(pages)]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=3600)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        return None
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    lo_c = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi_c = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    scale = hi_c / lo_c
    lo = run_level(lo_c, pages)
    hi = run_level(hi_c, pages)
    if not lo or not hi:
        sys.exit("a level failed; rerun in a quiet window")
    res = {
        "pages": pages,
        "levels": [lo_c, hi_c],
        "e2e_efficiency": round(
            hi["urls_per_sec"] / (scale * lo["urls_per_sec"]), 3),
        "steady_efficiency": round(
            hi["steady_urls_per_sec"] / (scale * lo["steady_urls_per_sec"]),
            3),
        "max_crawl_steal_pct": max(lo["crawl_steal_pct"],
                                   hi["crawl_steal_pct"]),
        "hw_compute_ratio_low_to_high": (
            round(hi["hw_miters_per_sec"] / lo["hw_miters_per_sec"], 3)
            if lo.get("hw_miters_per_sec") else None),
        "lo": lo,
        "hi": hi,
    }
    stamp = datetime.datetime.utcnow().strftime("%Y-%m-%dT%H%M")
    path = os.path.join(REPO, "BENCH",
                        f"evidence_r6_e2e_convergence_{stamp}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("lo", "hi")}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
