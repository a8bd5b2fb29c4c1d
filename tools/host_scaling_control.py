"""Machine-ceiling control for scaling-efficiency numbers: how well
does THIS host scale embarrassingly-parallel pure compute, with no
Spark, no shuffle, no shared state?

sha256 over a cache-resident 1 MiB block (hashlib releases the GIL;
the block never touches DRAM bandwidth), once with threads (the
local[N] analog — one process, N compute threads, like a Spark
executor JVM) and once with processes (the upper bound: separate
address spaces, no allocator/scheduler sharing). Each level is pinned
with taskset to exactly N cores when available — the same pinning the
bench scaling campaign uses.

The point (round-6): this sandbox's "32 vCPUs" do NOT deliver 32 cores
of compute under load — the 8→32 control efficiency is the CEILING any
Spark job can reach on this box, and suite efficiency must be judged
against it, not against 1.0. On a real cluster N→4N adds real machines
and this control is ~1.0 (which is why BASELINE.json's criterion is
evidenced at 2→8, below the box's saturation knee).

Usage: python tools/host_scaling_control.py [mib_per_worker]
Prints one JSON line with per-level MB/s and N→4N efficiencies.
"""

from __future__ import annotations

import concurrent.futures
import hashlib
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time

LEVELS = (1, 2, 8, 32)


def hash_mb(mb: int) -> int:
    h = hashlib.sha256()
    blk = b"\xab" * (1 << 20)
    for _ in range(mb):
        h.update(blk)
    h.hexdigest()
    return mb


def _threads(n: int, mib: int) -> float:
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(n) as ex:
        list(ex.map(hash_mb, [mib] * n))
    return n * mib / (time.perf_counter() - t0)


def _procs(n: int, mib: int) -> float:
    with mp.Pool(n) as p:
        t0 = time.perf_counter()
        p.map(hash_mb, [mib] * n)
        return n * mib / (time.perf_counter() - t0)


def _one_level(n: int, mib: int) -> dict:
    # best-of-2: pool spin-up and scheduler placement settle on trial 1
    return {
        "threads_mbps": round(max(_threads(n, mib), _threads(n, mib)), 1),
        "procs_mbps": round(max(_procs(n, mib), _procs(n, mib)), 1),
    }


def main() -> None:
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    if len(sys.argv) > 2 and sys.argv[2] == "--one":
        print(json.dumps(_one_level(int(sys.argv[3]), mib)))
        return

    out: dict[str, dict] = {}
    for n in LEVELS:
        cmd = [sys.executable, os.path.abspath(__file__), str(mib),
               "--one", str(n)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
        out[str(n)] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"  {n} workers: {out[str(n)]}", file=sys.stderr)

    for kind in ("threads_mbps", "procs_mbps"):
        out[f"eff_2_8_{kind.split('_')[0]}"] = round(
            (out["8"][kind] / out["2"][kind]) / 4.0, 3)
        out[f"eff_8_32_{kind.split('_')[0]}"] = round(
            (out["32"][kind] / out["8"][kind]) / 4.0, 3)
    print(json.dumps({"mib_per_worker": mib, "control": out}))


if __name__ == "__main__":
    main()
