"""Fold per-query all-time minima out of the archived bench rounds.

VERDICT r5 "What's wrong" #3: per-query bench timings had no all-time
minima fold, so round-over-round query comparisons were raw weather
noise. This tool scans every ``BENCH/rounds_*.json`` archive (each
carries ``query_passes`` — the per-pass timing dicts bench.py emitted
that session), keys each session by scale factor, and writes
``BENCH/query_minima.json``::

    {"by_sf": {"0.1": {"q1_pricing_summary": {"min": 0.415,
                                              "sessions": 10,
                                              "session_mins": [...]}},
               "1.0": {...}},
     "generated_from": [files...]}

Scale-factor attribution: bench.py's archives predating r6 do not
record sf, so ``_SF_OVERRIDES`` pins the known sf1.0 sessions (the
driver's bonus-start runs, cross-checked against BENCH_r05.json's
parsed per-query values); everything else ran at the bench default
sf0.1. Archives written from r6 on can carry an explicit ``sf`` field
which takes precedence.

Comparison rule (VERDICT): a query whose ALL-TIME min regresses >10%
round-over-round is a real finding; session-min deltas within the
spread of ``session_mins`` are weather.
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "BENCH")

# driver bonus-start sessions measured at sf1.0 (values match
# BENCH_r05.json parsed.queries / warmup); all other pre-r6 archives ran
# at the bench default sf0.1
_SF_OVERRIDES = {
    "rounds_20260821T232210Z.json": 1.0,
    "rounds_20260821T234345Z.json": 1.0,
}


def main() -> None:
    by_sf: dict[str, dict[str, dict]] = {}
    files = sorted(glob.glob(os.path.join(ROOT, "rounds_2*.json")))
    for path in files:
        with open(path) as f:
            d = json.load(f)
        passes = d.get("query_passes") or []
        if not passes:
            continue
        name = os.path.basename(path)
        sf = d.get("sf") or _SF_OVERRIDES.get(name, 0.1)
        sf_key = str(sf)
        bucket = by_sf.setdefault(sf_key, {})
        session_min = {
            q: min(p[q] for p in passes if q in p) for q in passes[0]
        }
        for q, v in session_min.items():
            ent = bucket.setdefault(q, {"min": v, "sessions": 0,
                                        "session_mins": []})
            ent["min"] = min(ent["min"], v)
            ent["sessions"] += 1
            ent["session_mins"].append(v)
    out = {
        "by_sf": by_sf,
        "generated_from": [os.path.basename(f) for f in files],
    }
    dst = os.path.join(ROOT, "query_minima.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for sf_key, bucket in sorted(by_sf.items()):
        print(f"sf={sf_key}:")
        for q, ent in bucket.items():
            print(f"  {q:24s} alltime_min={ent['min']:7.3f} "
                  f"sessions={ent['sessions']}")


if __name__ == "__main__":
    main()
