"""A/B: plain hash_join vs skew_join on a planted-skew large-large join.

One derived key holds `hot_frac` of the fact side, so the plain
hash-partitioned join ships that whole share to ONE partition/aggregator;
skew_join salts it across N sub-keys.  Prints one JSON line with both
walls (plain join, skew join including hot-key detection, skew join with
pre-detected keys) plus the host probe.

Run ALONE (no concurrent pytest/bench):  python tools/skew_ab.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n: int = 4_000_000, keys: int = 100_000, hot_frac: float = 0.35):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from bench import first_touch_gbps

    probe0 = first_touch_gbps()
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raydatax.relational import approx_hot_join_keys, hash_join, skew_join

    rng = np.random.default_rng(5)
    k = rng.integers(0, keys, n).astype(np.int64)
    k[rng.random(n) < hot_frac] = 7
    fact = pa.table({"k": k, "v": rng.integers(0, 1000, n).astype(np.int64)})
    rk = np.arange(keys, dtype=np.int64)
    dim = pa.table({"k": rk, "w": rk * 10})

    def fact_ds():
        return rd.from_arrow(fact).repartition(64).materialize()

    def dim_ds():
        return rd.from_arrow(dim).repartition(8).materialize()

    fds, dds = fact_ds(), dim_ds()

    # warm-up (spawn workers once)
    hash_join(fds, dds, "k").count()

    hot = approx_hot_join_keys(fds, "k", hot_share=0.05)
    out = {
        "rows": n, "keys": keys, "hot_frac": hot_frac,
        "hot_keys_found": hot.num_rows,
    }
    for portable in (False, True):
        tag = "portable" if portable else "native"
        t0 = time.monotonic()
        n_plain = hash_join(fds, dds, "k", portable=portable).count()
        out[f"plain_{tag}_s"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        n_skew = skew_join(fds, dds, "k", salts=16, hot_share=0.05,
                           portable=portable).count()
        out[f"skew_detect_{tag}_s"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        n_pre = skew_join(fds, dds, "k", salts=16, hot_keys=hot,
                          portable=portable).count()
        out[f"skew_pre_{tag}_s"] = round(time.monotonic() - t0, 3)
        assert n_plain == n_skew == n_pre == n, (n_plain, n_skew, n_pre)
    out["first_touch_gbps"] = [probe0, first_touch_gbps()]
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000)
