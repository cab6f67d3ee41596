"""Re-derive clean-round membership for ARCHIVED bench sessions under
the current gate set and bank newly-qualifying rounds into
BENCH/clean_rounds.json (append-only, provenance-stamped).

Why this exists: the random-gather "mem band" gate (added 2026-08-17)
was calibrated on two same-day windows that measured ~2.4-2.5x N->4N
and it hard-failed any round outside [2.0, 3.2]. The rounds recorded
since falsified the LOWER bound: across the steal-quiet rounds of the
archived sessions the 1-second gather probe reads anywhere from 1.16x
to 4.28x with no correlation to the measured crawl ratios
(rounds_20260819T060308Z: adjacent <0.2%-steal rounds read 4.28 then
1.16), and the floor rejected 100% of otherwise-clean rounds after its
introduction (2026-08-19 12:53 session rounds 0 and 4: mem 1.988 and
1.681, every other channel green, steady 0.909 / 0.707). A below-ideal
reading can moreover only DEFLATE measured efficiency (mem_ratio =
hi/lo: hi starved or lo boosted both under-report the N->4N ratio), so
rejecting on it discards safe lower-bound witnesses of the >=0.8 gate.
bench.py therefore made the gate ONE-SIDED (below-floor = recorded
telemetry via the mem_low flag; above-cap still disqualifies because
that direction INFLATES efficiency); this tool replays the SAME
recorded per-round gate fields (hw ratio, steal, bw band, mem cap,
near-session-min, absolute hw floor) over the archived session files so
rounds the falsified floor discarded are recovered without re-running
anything, and rounds that fail any still-standing gate stay out.

Idempotent: a (session_file, round_index) pair is banked at most once.
Never rewrites the archived session files themselves.
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

BENCH_DIR = bench._BENCH_DIR


def _round_clean_now(r: dict) -> bool:
    """The current clean-gate conjunction over a round's RECORDED
    telemetry fields (mirrors bench._round_effs + bench._finalize_clean
    with the one-sided mem gate: only the above-cap, efficiency-
    inflating direction disqualifies)."""
    mem = r.get("mem_ratio_low_to_high")
    return bool(
        r.get("hw_compute_ratio_low_to_high", 0.0) >= bench.CLEAN_HW_RATIO
        and r.get("max_crawl_steal_pct", 100.0) <= bench.CLEAN_STEAL_PCT
        and bench.CLEAN_BW_RATIO
        <= r.get("bw_ratio_low_to_high", 0.0)
        <= bench.CLEAN_BW_RATIO_MAX
        and (mem is None or mem <= bench.CLEAN_MEM_RATIO_MAX)
        and r.get("near_session_min") is True
        and r.get("hw_abs_ok") is True
    )


def main() -> int:
    path = os.path.join(BENCH_DIR, "clean_rounds.json")
    try:
        with open(path) as f:
            bank = json.load(f)
    except (OSError, ValueError):
        bank = {"key": bench._workload_key(), "rounds": []}
    if bank.get("key") != bench._workload_key():
        print(f"workload key mismatch ({bank.get('key')}); refusing")
        return 1
    seen = {
        (r.get("session_file"), r.get("round_index"))
        for r in bank["rounds"]
        if r.get("session_file") is not None
    }
    added = 0
    for sf in sorted(glob.glob(os.path.join(BENCH_DIR, "rounds_2*.json"))):
        try:
            with open(sf) as f:
                sess = json.load(f)
        except (OSError, ValueError):
            continue
        name = os.path.basename(sf)
        for i, r in enumerate(sess.get("rounds", [])):
            if (name, i) in seen:
                continue
            if not _round_clean_now(r):
                continue
            if r.get("clean"):
                # already banked by the session itself (pre-provenance
                # entries carry no session_file; match on the eff triple)
                trip = (r.get("efficiency"), r.get("steady_efficiency"),
                        r.get("dedup_efficiency"))
                if any((b.get("efficiency"), b.get("steady_efficiency"),
                        b.get("dedup_efficiency")) == trip
                       for b in bank["rounds"]):
                    continue
            bank["rounds"].append({
                "ts": sess.get("generated_at") or name,
                "rev": None,
                "efficiency": r["efficiency"],
                "steady_efficiency": r["steady_efficiency"],
                "dedup_efficiency": r["dedup_efficiency"],
                "hw_compute_ratio_low_to_high":
                    r.get("hw_compute_ratio_low_to_high"),
                "session_file": name,
                "round_index": i,
                "note": ("re-derived: passes every standing gate "
                         "(hw/steal/bw/mem-cap/near-min/hw-floor); was "
                         "excluded only by the falsified mem FLOOR "
                         f"(mem_ratio={r.get('mem_ratio_low_to_high')} "
                         "< 2.0 deflates, not inflates, the measured "
                         "efficiency — gate now one-sided, see bench.py)"),
            })
            seen.add((name, i))
            added += 1
            print(f"banked {name}#{i}: steady={r['steady_efficiency']} "
                  f"e2e={r['efficiency']} mem={r.get('mem_ratio_low_to_high')}")
    with open(path, "w") as f:
        json.dump(bank, f, indent=1)
    effs = sorted(r["steady_efficiency"] for r in bank["rounds"])
    med = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 4)
    print(f"total clean rounds: {len(bank['rounds'])}; "
          f"steady median={med}; best={max(effs) if effs else None}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
