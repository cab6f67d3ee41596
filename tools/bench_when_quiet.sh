#!/bin/bash
# Wait for a quiet host window (low hypervisor steal under load), then run
# the full bench. Steal only accrues while vCPUs are busy, so the probe
# must load the CPU before reading /proc/stat.
cd /root/repo
for i in $(seq 1 30); do
  steal=$(python - <<'EOF'
import multiprocessing as mp, time
def burn(s):
    t0 = time.time()
    while time.time() - t0 < s: pass
def stat():
    v = [int(x) for x in open('/proc/stat').readline().split()[1:]]
    busy = v[0]+v[1]+v[2]+v[5]+v[6]
    return busy + v[7], v[7]
b0 = stat()
with mp.Pool(8) as p:
    p.map(burn, [8.0]*8)
b1 = stat()
w = b1[0]-b0[0]; s = b1[1]-b0[1]
print(round(100.0*s/w, 2) if w else 0.0)
EOF
)
  echo "$(date +%H:%M:%S) probe steal=${steal}%"
  ok=$(python -c "print(1 if float('$steal') < 3.0 else 0)")
  if [ "$ok" = "1" ]; then
    echo "quiet window found, launching bench"
    timeout 3600 python bench.py 2>/tmp/bench_quiet_stderr.log > /tmp/bench_quiet_out.json
    echo "bench exit=$?"
    exit 0
  fi
  sleep 240
done
echo "no quiet window found in ~2h"
exit 1
