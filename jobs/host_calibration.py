"""Host scaling-ceiling calibration for the north-rule evidence.

Measures what THIS host can possibly deliver from N to 4N pinned cores for
two pure-python kernel classes (no Spark anywhere):

- alu: integer arithmetic loop — no memory traffic beyond L1;
- mem: repeated numpy sort of a 16 MB array — DRAM/L3-bandwidth-bound.

Any engine workload whose kernels are memory-heavy (Arrow transfer, pandas
group ops, numpy geometry) is bounded by the `mem` ceiling: the cores are
distinct vCPUs (no SMT pairing — /sys topology) but they SHARE the memory
controllers, so 4x cores never gives 4x bandwidth on one box. On a real
cluster, 4N executors bring 4N memory controllers and the ceiling
disappears — which is why BENCH/BASELINE.md reports both raw efficiency and
efficiency normalized by the matching host ceiling.

Usage: python jobs/host_calibration.py [N] [N4]   -> one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

AFF: set[int] = set()


def _alu(_: int) -> int:
    os.sched_setaffinity(0, AFF)
    x = 0
    for i in range(6_000_000):
        x += i * i
    return x


def _mem(seed: int) -> float:
    import numpy as np

    os.sched_setaffinity(0, AFF)
    rs = np.random.RandomState(seed)
    x = rs.rand(2_000_000)  # 16 MB: exceeds L2, exercises L3/DRAM
    s = 0.0
    for _ in range(40):
        y = np.sort(x)
        s += float(y[::1000].sum())
    return s


def _measure(kernel, cores: int, waves: int = 2) -> float:
    global AFF
    AFF = set(range(cores))
    t0 = time.perf_counter()
    with mp.Pool(cores) as pool:
        pool.map(kernel, range(cores * waves))
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else n * 4
    out = {"n": n, "n4": n4}
    for name, kernel in (("alu", _alu), ("mem", _mem)):
        t_small = _measure(kernel, n)
        t_big = _measure(kernel, n4)
        # equal work PER PROCESS -> throughput ratio = (t_small/t_big) * (n4/n)
        scaling = (t_small / t_big) * (n4 / n)
        out[name] = {
            "t_n": round(t_small, 2),
            "t_n4": round(t_big, 2),
            "throughput_x": round(scaling, 2),
            "efficiency": round(scaling / (n4 / n), 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
