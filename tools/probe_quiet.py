"""One-shot host-weather probe: prints OK/WAIT plus the gate numbers.

Same gates as tools/bench_when_quiet.sh (which embeds this logic):
steal under load < 3%, absolute compute grants >= PROBE_HW_FRAC x the
all-time calibration refs at BOTH worker counts, 2->8 compute ratio
>= 3.5, memory-bandwidth ratio >= 3.0.  Exit code 0 = quiet window.
"""
import json
import multiprocessing as mp
import os
import sys
import time

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
        np.copyto(b, a)
        n += 1
    return n * a.nbytes * 2


def stat():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    busy = v[0] + v[1] + v[2] + v[5] + v[6]
    return busy + v[7], v[7]


def hw(workers, s=1.0):
    best = 0.0
    for _ in range(2):
        with mp.Pool(workers) as p:
            t0 = time.time()
            tot = sum(p.map(burn, [s] * workers))
            best = max(best, tot / (time.time() - t0) / 1e6)
    return best


def bw(workers):
    with mp.Pool(workers) as p:
        t0 = time.time()
        tot = sum(p.map(bw_burn, [1.0] * workers))
        return tot / (time.time() - t0) / 1e9


def main():
    b0 = stat()
    with mp.Pool(8) as p:
        p.map(burn, [4.0] * 8)
    b1 = stat()
    w = b1[0] - b0[0]
    s = b1[1] - b0[1]
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

    bw(8)  # warmup: first-touch page allocation makes sample 1 ~100x slow
    r = round(bw(8) / max(bw(2), 1e-9), 2)
    ok = steal < 3.0 and r >= 3.0 and hwr >= 3.5 and hw_ok
    print(f"{'OK' if ok else 'WAIT'} steal={steal}% bw_ratio={r}"
          f" hw2={hw2:.1f}/{refs['low']} hw8={hw8:.1f}/{refs['high']}"
          f" hw_ratio={hwr}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
