#!/usr/bin/env python
"""Memory-bandwidth scaling probe — evidence for BASELINE.md's scaling
analysis.

Runs an 800 MB numpy stream-copy on 1, 2, 4, 8 pinned cores (one process per
core) and reports per-process and aggregate bandwidth.  On this sandbox the
AGGREGATE is flat (~0.5-0.8 GB/s total regardless of core count): the VM
shares one throttled memory controller across all cores, so NO
memory-streaming workload can exhibit wall-clock core-scaling here — unlike a
real cluster, where 4N executors bring 4N memory controllers.  Wall-clock
scaling efficiency measured in this sandbox is therefore a hardware-imposed
LOWER bound on the pipeline's cluster scaling.

Usage: python tools/bw_probe.py
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = r"""
import sys, time
import numpy as np
n = 100_000_000  # 400 MB
a = np.ones(n, dtype=np.float32)
b = np.empty_like(a)
np.copyto(b, a)  # touch pages outside the timer
t0 = time.time()
iters = 5
for _ in range(iters):
    np.copyto(b, a)
dt = time.time() - t0
print(iters * a.nbytes * 2 / dt / 1e9)
"""


def run_procs(n_procs: int) -> dict:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORKER],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(n_procs)
    ]
    rates = [float(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
    return {
        "procs": n_procs,
        "per_proc_GBps": [round(r, 2) for r in rates],
        "aggregate_GBps": round(sum(rates), 2),
    }


def main() -> None:
    out = [run_procs(n) for n in (1, 2, 4, 8)]
    agg = {o["procs"]: o["aggregate_GBps"] for o in out}
    print(json.dumps({
        "results": out,
        "aggregate_scaling_1_to_8": round(agg[8] / agg[1], 2),
        "note": "flat aggregate = shared/throttled memory controller; "
                "wall-clock core-scaling of streaming workloads is "
                "hardware-capped on this box",
    }, indent=1))


if __name__ == "__main__":
    main()
