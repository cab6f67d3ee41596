#!/bin/bash
# Wait for a quiet host window, then run the full bench. Probe gates
# mirror bench.py's clean-round gates, not just steal:
#   - hypervisor steal under full 8-worker load < 3% (steal only accrues
#     while vCPUs are busy, so the probe loads the CPU before /proc/stat)
#   - ABSOLUTE compute grant near the all-time calibration refs at BOTH
#     worker counts (>= PROBE_HW_FRAC x BENCH/minima.json hw_miters --
#     the 2026-08-19 00:58 session passed the old steal/bw probe and then
#     failed hw_abs_ok in all 5 rounds: the host granted ~34 Miters/s to
#     8 workers vs the 59.2 ref; steal alone cannot see a co-tenant that
#     is merely *running*, only one that preempts us)
#   - 2->8-worker compute ratio >= 3.5 (CLEAN_HW_RATIO) and memory-
#     bandwidth ratio >= 3.0 (bandwidth contention is invisible to steal)
cd /root/repo
PROBES=${1:-45}
for i in $(seq 1 "$PROBES"); do
  verdict=$(python - <<'EOF'
import json, multiprocessing as mp, os, time
import numpy as np

def burn(s):
    # same increment loop as bench.py::_burn so Miters/s is comparable
    t0 = time.time()
    x = 0
    while time.time() - t0 < s:
        x += 1
    return x

def bw_burn(s):
    a = np.empty(256 * 1024 * 1024, dtype=np.uint8)
    b = np.empty_like(a)
    n = 0
    t0 = time.time()
    while time.time() - t0 < s:
        np.copyto(b, a); n += 1
    return n * a.nbytes * 2

def stat():
    v = [int(x) for x in open('/proc/stat').readline().split()[1:]]
    busy = v[0]+v[1]+v[2]+v[5]+v[6]
    return busy + v[7], v[7]

def hw(workers, s=1.0):
    best = 0.0
    for _ in range(2):
        with mp.Pool(workers) as p:
            t0 = time.time()
            tot = sum(p.map(burn, [s] * workers))
            best = max(best, tot / (time.time() - t0) / 1e6)
    return best

b0 = stat()
with mp.Pool(8) as p:
    p.map(burn, [4.0] * 8)
b1 = stat()
w = b1[0] - b0[0]; s = b1[1] - b0[1]
steal = round(100.0 * s / w, 2) if w else 0.0

hw2, hw8 = hw(2), hw(8)
hwr = round(hw8 / max(hw2, 1e-9), 2)

refs = {"low": 14.8, "high": 59.2}
try:
    m = json.load(open("BENCH/minima.json"))
    refs = {"low": m["low"]["hw_miters_per_sec"],
            "high": m["high"]["hw_miters_per_sec"]}
except Exception:
    pass
frac = float(os.environ.get("PROBE_HW_FRAC", "0.88"))
hw_ok = hw2 >= frac * refs["low"] and hw8 >= frac * refs["high"]

def bw(workers):
    with mp.Pool(workers) as p:
        t0 = time.time()
        tot = sum(p.map(bw_burn, [1.0] * workers))
        return tot / (time.time() - t0) / 1e9

bw(8)  # warmup: first-touch host page allocation makes sample 1 ~100x slow
r = round(bw(8) / max(bw(2), 1e-9), 2)
ok = steal < 3.0 and r >= 3.0 and hwr >= 3.5 and hw_ok
print(f"{'OK' if ok else 'WAIT'} steal={steal}% bw_ratio={r}"
      f" hw2={hw2:.1f}/{refs['low']} hw8={hw8:.1f}/{refs['high']}"
      f" hw_ratio={hwr}")
EOF
)
  echo "$(date +%H:%M:%S) probe $verdict"
  case "$verdict" in
    OK*)
      echo "quiet window found, launching bench"
      timeout 3900 python bench.py 2>/tmp/bench_quiet_stderr.log > /tmp/bench_quiet_out.json
      echo "bench exit=$?"
      exit 0 ;;
  esac
  sleep 240
done
echo "no quiet window found"
exit 1
