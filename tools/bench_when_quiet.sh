#!/bin/bash
# Wait for a quiet host window, then run the full bench — and KEEP
# hunting until a clean round with steady scaling efficiency >= 0.8
# lands in BENCH/clean_rounds.json (the BASELINE.json north gate), the
# probe budget runs out, or a bench run fails hard.
#
# Probe gates mirror bench.py's clean-round gates, not just steal
# (see tools/probe_quiet.py, which holds the actual probe):
#   - hypervisor steal under full 8-worker load < 3% (steal only accrues
#     while vCPUs are busy, so the probe loads the CPU before /proc/stat)
#   - ABSOLUTE compute grant near the all-time calibration refs at BOTH
#     worker counts (>= PROBE_HW_FRAC x BENCH/minima.json hw_miters —
#     the 2026-08-19 00:58 session passed the old steal/bw probe and then
#     failed hw_abs_ok in all 5 rounds: the host granted ~34 Miters/s to
#     8 workers vs the 59.2 ref; steal alone cannot see a co-tenant that
#     is merely *running*, only one that preempts us)
#   - 2->8-worker compute ratio >= 3.5 (CLEAN_HW_RATIO) and memory-
#     bandwidth ratio >= 3.0 (bandwidth contention is invisible to steal)
#   - random-gather (DRAM-latency) grant: >= PROBE_MEM_FRAC x the
#     all-time per-level refs at BOTH counts and 2->8 ratio <= 3.2 —
#     the 00:14 2026-08-20 session passed every other probe (full hw
#     grants, 0.04% steal, bw in band) while the 2-worker level got
#     ~35% of its random-access ref, so all 7 bench rounds failed the
#     mem-ratio clean cap and the session banked nothing

cd /root/repo
PROBES=${1:-45}
GATE=${BENCH_QUIET_GATE:-0.8}

have_gate() {
  # the gate needs the headline statistic — the MEDIAN over all-time
  # clean rounds (what bench.py reports as *_clean_alltime) — at or
  # above GATE, not just one good round: a single >=0.8 witness with a
  # sub-0.8 median still reads as weak in the driver artifact
  python - "$GATE" <<'EOF'
import json, statistics, sys
gate = float(sys.argv[1])
try:
    rounds = json.load(open("BENCH/clean_rounds.json"))["rounds"]
except Exception:
    sys.exit(1)
effs = [r.get("steady_efficiency") or 0.0 for r in rounds]
best = max(effs) if effs else 0.0
med = statistics.median(effs) if effs else 0.0
sys.exit(0 if (best >= gate and med >= gate) else 1)
EOF
}

if have_gate; then
  echo "gate already met (clean steady >= $GATE in BENCH/clean_rounds.json)"
  exit 0
fi

BUSY=/tmp/spark_graft_busy
for i in $(seq 1 "$PROBES"); do
  # builder-side mutex: while the builder runs its own Spark work it
  # touches $BUSY; skip the probe entirely (a bench fired into that
  # window would be dirty AND collide with the builder's Spark session)
  if [ -e "$BUSY" ]; then
    echo "$(date +%H:%M:%S) probe skipped ($BUSY present)"
    sleep 240
    continue
  fi
  verdict=$(python tools/probe_quiet.py)
  echo "$(date +%H:%M:%S) probe $verdict"
  case "$verdict" in
    OK*)
      echo "quiet window found, launching bench"
      ts=$(date +%H%M%S)
      timeout 3900 python bench.py \
        2>"/tmp/bench_quiet_stderr_${ts}.log" \
        >"/tmp/bench_quiet_out_${ts}.json"
      rc=$?
      echo "bench exit=$rc (logs /tmp/bench_quiet_*_${ts}.*)"
      if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
        echo "bench failed hard; stopping watcher"
        exit "$rc"
      fi
      if have_gate; then
        echo "clean round with steady >= $GATE banked; done"
        exit 0
      fi
      echo "no clean >=$GATE round yet; re-arming probe loop"
      ;;
  esac
  sleep 240
done
echo "no quiet window found"
exit 1
