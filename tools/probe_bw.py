"""30-second DRAM-bandwidth sounding: is this a quiet window?

SCALING.md's root-cause analysis pins the local[N] efficiency swings
on the host's shared memory bus (~67 GB/s, co-tenant traffic invisible
to steal%).  This probe measures the bus share we can actually get —
W worker processes each stream-copying a 512 MiB buffer — and prints
aggregate GB/s.  Congested windows have measured 30-45 GB/s aggregate;
quiet windows approach the bus ceiling.  Use it to decide WHEN to run
tools/bench_scaling.py, not as evidence by itself.

    python tools/probe_bw.py [workers] [seconds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _stream(args):
    core, seconds = args
    os.sched_setaffinity(0, {core})
    import numpy as np
    # varying content: identical all-ones pages can be KSM-deduped by
    # the hypervisor into one LLC-resident physical page, which turns
    # the "DRAM" read into a cache hit and inflates the reading ~2-4×
    a = np.arange(256 * 1024 * 1024 // 8, dtype=np.float64)
    a += core
    b = np.empty_like(a)
    np.copyto(b, a)  # touch every page BEFORE the timed loop
    t0 = time.time()
    t_end = t0 + seconds
    n = 0
    while time.time() < t_end:
        np.copyto(b, a)
        n += 1
    # each copy reads a and writes b: 2 × 256 MiB of traffic
    return n * 2 * a.nbytes, time.time() - t0


def main() -> None:
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    with mp.Pool(workers) as pool:
        results = pool.map(
            _stream, [(i, seconds) for i in range(workers)])
    # sum of each worker's own rate — allocation skew doesn't bias it
    gbps = sum(nb / w for nb, w in results) / 1e9
    print(json.dumps({
        "workers": workers,
        "aggregate_gbps": round(gbps, 1),
        "per_worker_gbps": round(gbps / workers, 2),
    }))


if __name__ == "__main__":
    main()
