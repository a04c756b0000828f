"""Memory-bandwidth probe: evidence for BASELINE.md's single-box DRAM
ceiling explanation of the 8→32-CPU scaling knee.

Measures aggregate triad bandwidth (a = b + s*c over 256 MB arrays)
at 1 / 8 / 32 taskset-pinned processes. If aggregate GB/s saturates
well below 32x the single-core figure, per-core superstep throughput
MUST fall the same way at high core counts on one box — each node of
a real cluster brings its own memory system, which is what the
O(distinct-dst) pre-combined exchange is designed for.

Also prints the implied superstep ceiling: the PageRank gather+combine
touches ~20 bytes/edge/round, so edges/sec <= aggregate_GBps / 20e-9.
"""
import subprocess, sys, time, os

CHILD = r"""
import numpy as np, time, sys
n = 32_000_000  # 3 x 256 MB float64
b = np.random.default_rng(0).random(n)
c = np.random.default_rng(1).random(n)
a = np.empty(n)
# warm
np.multiply(c, 1.5, out=a); a += b
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    np.multiply(c, 1.5, out=a)
    a += b
dt = time.perf_counter() - t0
# traffic per rep: read b + read c + write a (+RFO ~ another a) ~ 4 arrays
gb = reps * 4 * n * 8 / 1e9
print(gb / dt)
"""


def run(nproc: int) -> float:
    procs = []
    for i in range(nproc):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", CHILD],
            stdout=subprocess.PIPE, text=True))
    total = 0.0
    for p in procs:
        out, _ = p.communicate()
        total += float(out.strip().splitlines()[-1])
    return total


def sentinel() -> float:
    import numpy as np
    t0 = time.perf_counter()
    buf = np.empty(25_000_000, dtype=np.float64)
    buf[:] = 1.0
    return round(time.perf_counter() - t0, 3)


if __name__ == "__main__":
    s = sentinel()
    print(f"page_fault_sentinel_sec: {s}")
    for n in (1, 8, 32):
        gbps = run(n)
        print(f"procs={n:>2}  aggregate_triad_GBps={gbps:7.1f}  "
              f"implied_pagerank_eps_ceiling={gbps/20e-9:.3e}")
