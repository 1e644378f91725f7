"""Memory-bandwidth control: is the host's shared memory bus the scaling
ceiling for shuffle-bound stages?

Spawns P processes, each repeatedly copying a 256 MB numpy buffer
(read+write streams through the bus, like shuffle serialization does), and
reports AGGREGATE GB/s at P = 1, 4, 16.  If aggregate bandwidth stops
growing between 4 and 16 processes, a 4->16-core Spark stage whose cost is
dominated by memory movement (shuffle write/read, cache materialization)
CANNOT scale on this box regardless of engine quality — on a real cluster
each node contributes its own memory bus, so this artifact disappears.

Pure numpy/multiprocessing, no Spark.  Prints one JSON line.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

BUF_MB = 256
REPS = 8


def worker(q):
    a = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    t0 = time.monotonic()
    for _ in range(REPS):
        np.copyto(b, a)
    q.put(BUF_MB * REPS * 2 / (time.monotonic() - t0) / 1024)  # GB/s (r+w)


def measure(p: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(p)]
    for pr in procs:
        pr.start()
    total = sum(q.get() for _ in procs)
    for pr in procs:
        pr.join()
    return total


if __name__ == "__main__":
    out = {}
    for p in (1, 4, 16):
        # median of 3
        vals = sorted(measure(p) for _ in range(3))
        out[f"aggregate_gbps_p{p}"] = round(vals[1], 1)
    out["scaling_4_to_16"] = round(out["aggregate_gbps_p16"] / out["aggregate_gbps_p4"], 2)
    out["efficiency_4_to_16"] = round(out["scaling_4_to_16"] / 4, 3)
    print(json.dumps(out))
