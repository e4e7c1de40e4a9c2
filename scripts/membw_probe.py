"""Hardware-floor probe for the 8->32 scaling criterion.

Runs a PURE-numpy workload (np.unique over a 3M-element uint32 array —
the same sort-dominated memory profile as the segment builder's
(code, doc) aggregation, with none of this repo's code) in P isolated
processes and reports aggregate throughput at P = 1, 8, 32.

If this independent workload's 8->32 efficiency collapses the same way
the build does, the wall is the box's shared DRAM bus, not the engine —
a multi-node cluster (one bus per node) does not have this ceiling.

Observed on the round-3 build box: eff(1->8) ~= 0.72, eff(8->32) ~= 0.61
(vs the engine's measured 0.52-0.62) — the builder saturates the same
hardware floor. Full numbers in BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _worker(n_iter: int, q) -> None:
    rng = np.random.default_rng(1)
    key = rng.integers(0, 1 << 31, size=3_000_000).astype(np.uint32)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        np.unique(key, return_counts=True)
    q.put(n_iter / (time.perf_counter() - t0))


def run(p: int, n_iter: int = 4) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(n_iter, q)) for _ in range(p)]
    t0 = time.perf_counter()
    for pr in procs:
        pr.start()
    for _ in procs:
        q.get()
    for pr in procs:
        pr.join()
    return p * n_iter / (time.perf_counter() - t0)


if __name__ == "__main__":
    r1, r8, r32 = run(1), run(8), run(32)
    print(json.dumps({
        "metric": "membw_probe_sorts_per_sec",
        "levels": {"1": round(r1, 2), "8": round(r8, 2), "32": round(r32, 2)},
        "eff_1_to_8": round(r8 / r1 / 8, 3),
        "eff_8_to_32": round(r32 / r8 / 4, 3),
    }))
