"""Spark-free host scaling ceiling at two core counts (round-3 methodology,
extended): N independent taskset-pinned worker processes, each doing a fixed
amount of work; the ceiling is (aggregate throughput at HIGH) /
(aggregate throughput at LOW) / (HIGH/LOW).

Two workloads bracket the job mix:
  cpu — hashlib.sha256 over a small hot buffer (pure compute; what round 3
        used to establish the 8->32 ceiling of 0.705)
  mem — strided numpy add over a ~256 MB working set per process
        (memory-bandwidth-bound; array_intersect/shuffle-style work).
        Per-process working sets are private, as Spark task buffers are.

A perfectly scalable host reads 1.0; anything below is hardware (shared
memory controller, turbo/SMT budget), not the job.  Published next to the
measured job efficiency so "fraction of attainable" is explicit.

Usage: python tools/host_ceiling.py [low] [high] [n_rounds]
Writes tools/host_ceiling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CPU_WORKER = r"""
import hashlib, sys, time
buf = b"x" * 65536
t0 = time.time()
n = 0
deadline = t0 + 6.0
while time.time() < deadline:
    for _ in range(100):
        hashlib.sha256(buf).digest()
    n += 100
print((time.time() - t0) and n / (time.time() - t0))
"""

MEM_WORKER = r"""
import os, sys, time
os.environ["OMP_NUM_THREADS"] = "1"
import numpy as np
a = np.arange(32 << 20, dtype=np.int64)   # 256 MB
b = np.ones_like(a)
t0 = time.time()
n = 0
deadline = t0 + 6.0
while time.time() < deadline:
    a += b                                 # streams 3*256 MB per pass
    n += 1
print(n / (time.time() - t0))
"""


def run_level(worker: str, cores: int) -> float:
    """Aggregate throughput of `cores` pinned single-core processes."""
    procs = []
    for i in range(cores):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, "-c", worker],
                stdout=subprocess.PIPE,
                text=True,
            )
        )
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=120)
        total += float(out.strip().splitlines()[-1])
    return total


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out = {
        "metric": "host_scaling_ceiling",
        "low_cores": low,
        "high_cores": high,
        "workloads": {},
        "loadavg_at_start": open("/proc/loadavg").read().split()[0],
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    for name, worker in (("cpu", CPU_WORKER), ("mem", MEM_WORKER)):
        lows, highs = [], []
        for _ in range(n_rounds):
            lows.append(run_level(worker, low))
            highs.append(run_level(worker, high))
        best_low, best_high = max(lows), max(highs)
        out["workloads"][name] = {
            "low_throughput_runs": [round(x, 1) for x in lows],
            "high_throughput_runs": [round(x, 1) for x in highs],
            "ceiling": round((best_high / best_low) / (high / low), 3),
        }
        print(f"{name}: ceiling "
              f"{out['workloads'][name]['ceiling']}", file=sys.stderr)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "host_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
