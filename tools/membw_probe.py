"""Pinned-core aggregate memory-bandwidth ladder.

Measures what the host's memory system delivers to 2 / 8 / 32 pinned
cores doing pure numpy copies (no Ray, no engine code).  If aggregate
bandwidth stops scaling between 8 and 32 cores, the CDC replay's 8->32
efficiency ceiling is a HOST property, not an engine property — the
engine's map+merge stages stream Arrow buffers and cannot outrun the
node's memory system.  Companion evidence to BENCH/BASELINE.md's
scaling ladders (VERDICT r2 directive 4: "a documented measurement
proving the residual is pure host memory bandwidth").

Usage: python tools/membw_probe.py [--mb 256] [--secs 2.0]
Prints one JSON line per rung plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _worker(core: int, mb: int, secs: float, mode: str, out: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    n = mb * 1024 * 1024 // 8
    if mode == "copy":
        # warm-page streaming copy: classic STREAM-style DRAM bandwidth
        src = np.ones(n, dtype=np.float64)   # first-touch here, untimed
        dst = np.zeros(n, dtype=np.float64)
        np.copyto(dst, src)
        t0 = time.perf_counter()
        it = 0
        while time.perf_counter() - t0 < secs:
            np.copyto(dst, src)      # streams 2 x mb per iteration (r+w)
            it += 1
        dt = time.perf_counter() - t0
        out.put((core, 2.0 * it * mb / 1024.0 / dt))
    else:
        # first-touch: allocate FRESH memory and fault it in — the path a
        # replay run exercises constantly (new worker heaps, object-store
        # buffers, Arrow allocations).  On this VM the hypervisor backs
        # pages lazily, so this measures the host's page-backing rate.
        t0 = time.perf_counter()
        it = 0
        bufs = []
        while time.perf_counter() - t0 < secs:
            a = np.empty(n, dtype=np.float64)
            a.fill(1.0)              # first touch of every page
            bufs.append(a)           # keep alive: never re-touch freed pages
            it += 1
            if len(bufs) * mb > 1500:   # cap RSS per worker at ~1.5 GB
                break
        dt = time.perf_counter() - t0
        out.put((core, it * mb / 1024.0 / dt))


def rung(cores: int, mb: int, secs: float, mode: str) -> dict:
    q: "mp.Queue" = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(c, mb, secs, mode, q))
        for c in range(cores)
    ]
    for p in procs:
        p.start()
    res = [q.get() for _ in procs]
    for p in procs:
        p.join()
    agg = sum(bw for _, bw in res)
    return {
        "mode": mode,
        "cores": cores,
        "aggregate_gb_s": round(agg, 2),
        "per_core_gb_s": round(agg / cores, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--secs", type=float, default=2.0)
    ap.add_argument("--rungs", type=str, default="2,8,32")
    ap.add_argument("--mode", choices=["copy", "first-touch", "both"],
                    default="both")
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]
    modes = ["copy", "first-touch"] if args.mode == "both" else [args.mode]
    for mode in modes:
        results = []
        for c in rungs:
            r = rung(c, args.mb, args.secs, mode)
            results.append(r)
            print(json.dumps(r), flush=True)
        if len(results) >= 2:
            summary = {"mode": mode}
            for a, b in zip(results, results[1:]):
                summary[f"bw_scaling_{a['cores']}_{b['cores']}"] = round(
                    (b["aggregate_gb_s"] / a["aggregate_gb_s"])
                    / (b["cores"] / a["cores"]),
                    3,
                )
            print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    mp.set_start_method("spawn")
    main()
