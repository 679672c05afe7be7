#!/usr/bin/env python3
"""Box-health probe for the bench protocol (BASELINE.md).

Two numbers, both recorded next to any timed reading:

  single  - the historical single-thread sum-loop (seconds; ~1.5 s
            when this box is healthy, ~2.7-4+ when degraded).
  multi   - the SAME loop run in N parallel processes; reported as the
            per-process mean and the contention factor (mean / single).

Why both: r15 s2 measured a box whose single-thread probe read HEALTHY
(1.47 s) while the full 214-query suite ran a uniform x1.21 slower
than it had on a probe-2.7 box — on this virtualized host,
single-thread speed does not track multi-core throughput (steal time /
scheduler shares move independently of one vCPU's speed). The
contention factor is the multi-core signal the old probe missed.

Usage: python3 tools/probe.py [nproc=8]
"""
import multiprocessing
import sys
import time


def loop(_):
    t = time.time()
    sum(range(10 ** 8))
    return time.time() - t


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    single = loop(0)
    t0 = time.time()
    with multiprocessing.Pool(n) as pool:
        times = pool.map(loop, range(n))
    wall = time.time() - t0
    mean = sum(times) / n
    print(f"single {single:.2f}s | multi x{n}: per-proc mean {mean:.2f}s, "
          f"wall {wall:.2f}s, contention x{mean / single:.2f}")
