#!/usr/bin/env python
"""Host parallel-capacity probe (the BENCH.md scaling-envelope method).

A fixed pure-numpy FNV-style workload per process -- zero Spark, zero JVM,
zero shuffle -- measures how much parallel CPU the host ACTUALLY grants
right now. aggregate_scaling(p) = p * wall(1) / wall(p); on idle hardware
it tracks p, on a quota-throttled or shared box it plateaus at the
effective core count. The probe-implied maximum N->4N speedup for ANY
software on this box today is aggregate_scaling(4N)/aggregate_scaling(N);
a Spark pair is judged against that envelope, not against ideal 4x.

    python scripts/host_probe.py [--procs 1,2,4,8,16,32] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def work(_):
    h = np.full(2_000_000, 0xCBF29CE484222325, dtype=np.uint64)
    for _ in range(120):
        h = (h ^ np.uint64(0x9E)) * np.uint64(0x100000001B3)
    return float(h[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8,16,32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    # warm the fork/numpy machinery before timing anything
    with mp.Pool(2) as p:
        p.map(work, range(2))

    out = {}
    base = None
    for procs in [int(x) for x in args.procs.split(",")]:
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(work, range(procs))
            walls.append(time.time() - t0)
        w = min(walls)
        if base is None:
            base = w
        out[procs] = {
            "wall_sec": round(w, 3),
            "aggregate_scaling": round(procs * base / w, 2),
        }
        print(
            f"procs={procs:2d} wall={w:6.2f}s "
            f"aggregate_scaling={out[procs]['aggregate_scaling']:5.2f}x "
            f"(ideal {procs})"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
