#!/bin/bash
# Wait for a quiet host window (low hypervisor steal under load AND a full
# N->4N memory-bandwidth grant), then run the full bench. Steal only
# accrues while vCPUs are busy, so the probe must load the CPU before
# reading /proc/stat; bandwidth contention is invisible to steal, so a
# streaming burn checks the 2->8-worker bandwidth ratio too.
cd /root/repo
for i in $(seq 1 30); do
  verdict=$(python - <<'EOF'
import multiprocessing as mp, time
import numpy as np

def burn(s):
    t0 = time.time()
    while time.time() - t0 < s: pass

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

b0 = stat()
with mp.Pool(8) as p:
    p.map(burn, [6.0]*8)
b1 = stat()
w = b1[0]-b0[0]; s = b1[1]-b0[1]
steal = round(100.0*s/w, 2) if w else 0.0

def bw(workers):
    with mp.Pool(workers) as p:
        t0 = time.time()
        tot = sum(p.map(bw_burn, [1.0]*workers))
        return tot / (time.time()-t0) / 1e9

bw(8)  # warmup: first-touch host page allocation makes sample 1 ~100x slow
r = round(bw(8) / max(bw(2), 1e-9), 2)
ok = steal < 3.0 and r >= 3.0
print(f"{'OK' if ok else 'WAIT'} steal={steal}% bw_ratio={r}")
EOF
)
  echo "$(date +%H:%M:%S) probe $verdict"
  case "$verdict" in
    OK*)
      echo "quiet window found, launching bench"
      timeout 3600 python bench.py 2>/tmp/bench_quiet_stderr.log > /tmp/bench_quiet_out.json
      echo "bench exit=$?"
      exit 0 ;;
  esac
  sleep 240
done
echo "no quiet window found in ~2h"
exit 1
