"""One-shot host-weather probe: prints OK/WAIT plus the gate numbers.

Same gates as tools/bench_when_quiet.sh (which embeds this logic):
steal under load < 3%, absolute compute grants >= PROBE_HW_FRAC x the
all-time calibration refs at BOTH worker counts, 2->8 compute ratio
>= 3.5, memory-bandwidth ratio >= 3.0, AND (since late r5) the
random-gather (DRAM-latency) grant: absolute >= PROBE_MEM_FRAC x the
all-time per-level refs at BOTH counts and 2->8 ratio <=
PROBE_MEM_MAX (bench.py's clean cap). The mem gate exists because the
2026-08-20 00:14 session proved the OTHER probes blind to the
dominant storm mode: all 7 rounds had full compute grants (hw_abs_ok
true, steal 0.04%, bw in band) while the 2-worker level was granted
only ~35% of its all-time random-access throughput (111-140 vs the
327.7 ref) — every round failed bench.py's mem-ratio clean cap and
the whole session banked nothing. Archived sessions separate cleanly:
quiet windows grant the 2-worker level >=200 Mprobes/s, lo-starved
storms 103-140.  Exit code 0 = quiet window.
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


def mem_burn(s):
    # same random-gather loop as bench.py::_mem_burn so Mprobes/s is
    # comparable to BENCH/minima.json's mem refs
    n = 16 * 1024 * 1024
    arr = np.arange(n, dtype=np.int64)
    idx = np.random.RandomState(0).randint(0, n, size=1_000_000)
    probes = 0
    t0 = time.time()
    while time.time() - t0 < s:
        arr[idx].sum()
        probes += len(idx)
    return probes


def mem(workers, s=1.0):
    best = 0.0
    for _ in range(3):  # max of 3: first-touch warmup, steal variance
        with mp.Pool(workers) as p:
            t0 = time.time()
            tot = sum(p.map(mem_burn, [s] * workers))
            best = max(best, tot / (time.time() - t0) / 1e6)
    return best


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
    mem_refs = {"low": 327.7, "high": 609.2}
    try:
        m = json.load(open("BENCH/minima.json"))
        refs = {"low": m["low"]["hw_miters_per_sec"],
                "high": m["high"]["hw_miters_per_sec"]}
        mem_refs = {"low": m["low"].get("mem_mprobes_per_sec",
                                        mem_refs["low"]),
                    "high": m["high"].get("mem_mprobes_per_sec",
                                          mem_refs["high"])}
    except Exception:
        pass
    frac = float(os.environ.get("PROBE_HW_FRAC", "0.88"))
    hw_ok = hw2 >= frac * refs["low"] and hw8 >= frac * refs["high"]

    bw(8)  # warmup: first-touch page allocation makes sample 1 ~100x slow
    r = round(bw(8) / max(bw(2), 1e-9), 2)

    mem2, mem8 = mem(2), mem(8)
    memr = round(mem8 / max(mem2, 1e-9), 2)
    mem_frac = float(os.environ.get("PROBE_MEM_FRAC", "0.55"))
    mem_cap = float(os.environ.get("PROBE_MEM_MAX", "3.2"))
    mem_ok = (mem2 >= mem_frac * mem_refs["low"]
              and mem8 >= mem_frac * mem_refs["high"]
              and memr <= mem_cap)

    ok = steal < 3.0 and r >= 3.0 and hwr >= 3.5 and hw_ok and mem_ok
    print(f"{'OK' if ok else 'WAIT'} steal={steal}% bw_ratio={r}"
          f" hw2={hw2:.1f}/{refs['low']} hw8={hw8:.1f}/{refs['high']}"
          f" hw_ratio={hwr}"
          f" mem2={mem2:.0f}/{mem_refs['low']}"
          f" mem8={mem8:.0f}/{mem_refs['high']} mem_ratio={memr}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
