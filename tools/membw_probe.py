"""Aggregate DRAM-bandwidth probe (round-3 verdict ask #4).

Evidence for BASELINE.md's (8,32) scaling-ceiling diagnosis must rest on a
measured counter, not inference from pinned wall times. This sandbox has no
`perf` / uncore PMU access, so the counter is a STREAM-style triad: P
processes each sweep a = b + s*c over buffers far larger than LLC and report
bytes moved per second; the table of aggregate GB/s vs P shows where the
box's memory subsystem stops scaling. If aggregate bandwidth at 32 workers
is ~= at 8 workers, a 32-CPU run cannot move 4x the data of an 8-CPU run no
matter how parallel the compute is — which is exactly the exhausted resource
a real 4N-node cluster would add with each node.

    python tools/membw_probe.py            # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N = 32 * 1024 * 1024          # 32M float64 per array => 3 x 256 MiB per proc
SECONDS = 2.0                 # timed window per worker
BYTES_PER_ITER = 3 * N * 8    # triad reads b, c and writes a


def _triad_worker(q: mp.Queue) -> None:
    os.environ["OMP_NUM_THREADS"] = "1"
    import numpy as np

    b = np.full(N, 1.5)
    c = np.full(N, 2.5)
    a = np.empty(N)
    # warm-up sweep: fault every page in before the timed window
    np.add(b, c, out=a)
    iters = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECONDS:
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)       # a = b + 3*c, two passes = 2 triads' bytes
        iters += 2
    dt = time.perf_counter() - t0
    q.put(iters * BYTES_PER_ITER / dt)


def measure(n_procs: int) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_triad_worker, args=(q,))
             for _ in range(n_procs)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    out = {}
    for p in (1, 2, 4, 8, 16, 32):
        gbs = measure(p) / 1e9
        out[str(p)] = round(gbs, 2)
    agg = out
    print(json.dumps({
        "metric": "triad_aggregate_gbps_by_procs",
        "unit": "GB/s",
        "value": agg,
        "per_proc": {k: round(v / int(k), 2) for k, v in agg.items()},
        "array_mib_per_proc": 3 * N * 8 // (1 << 20),
    }))


if __name__ == "__main__":
    main()
