"""Seeded randomized properties for the continuation operators:
snapshot_cdc replay equality, SCD2 interval-chain invariants,
grouped_exact_sample quotas."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydatax.relational import grouped_exact_sample, scd2_history, snapshot_cdc


def _random_snapshot(rng, keys):
    return pa.table({
        "k": pa.array(sorted(keys), pa.int64()),
        "v": pa.array([int(rng.integers(0, 5)) for _ in keys], pa.int64()),
        "w": pa.array([None if rng.random() < 0.2 else f"s{rng.integers(0, 4)}"
                       for _ in keys], pa.string()),
    })


def test_snapshot_cdc_replay_equality_randomized(ray_session):
    for seed in range(8):
        rng = np.random.default_rng(seed)
        universe = list(range(60))
        old_keys = {k for k in universe if rng.random() < 0.7}
        new_keys = {k for k in universe if rng.random() < 0.7}
        old = _random_snapshot(rng, old_keys)
        new = _random_snapshot(rng, new_keys)
        ev = snapshot_cdc(rd.from_arrow(new), rd.from_arrow(old),
                          ["k"], ["v", "w"]).take_all()
        state = {r["k"]: (r["v"], r["w"]) for r in old.to_pylist()}
        for e in ev:
            if e["op"] == "D":
                assert e["k"] in state
                state.pop(e["k"])
            else:
                state[e["k"]] = (e["v"], e["w"])
        want = {r["k"]: (r["v"], r["w"]) for r in new.to_pylist()}
        assert state == want, seed
        # no-change rows never emit: a second diff of new vs new is empty
        again = snapshot_cdc(rd.from_arrow(new), rd.from_arrow(new),
                             ["k"], ["v", "w"]).take_all()
        assert again == [], seed


def test_scd2_chain_invariants_randomized(ray_session):
    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        n = 80
        keys = rng.integers(0, 10, size=n)
        seqs = rng.permutation(n * 3)[:n]
        ops = rng.choice(["I", "U", "D"], size=n, p=[0.5, 0.3, 0.2])
        log = pa.table({
            "key": pa.array([f"k{k}" for k in keys], pa.string()),
            "op": pa.array(ops),
            "seq": pa.array(seqs.astype("int64")),
        })
        rows = scd2_history(rd.from_arrow(log), ["key"], "seq",
                            op_col="op").take_all()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["key"], []).append(r)
        all_events = {}
        for k, s, o in zip(keys, seqs, ops):
            all_events.setdefault(f"k{k}", []).append((int(s), o))
        for key, evs in all_events.items():
            evs.sort()
            want = []
            for i, (s, o) in enumerate(evs):
                if o == "D":
                    continue
                nxt = evs[i + 1][0] if i + 1 < len(evs) else None
                want.append((s, nxt, nxt is None))
            got = sorted(
                (r["valid_from_seq"], r["valid_to_seq"], r["is_current"])
                for r in by_key.get(key, [])
            )
            assert got == sorted(want), (seed, key)
            # at most one open (current) interval per key
            assert sum(1 for _, _, cur in got if cur) <= 1


def test_grouped_exact_sample_quota_randomized(ray_session):
    for seed in range(5):
        rng = np.random.default_rng(200 + seed)
        n = 300
        t = pa.table({
            "k": pa.array(rng.permutation(10_000)[:n].astype("int64")),
            "g": pa.array([f"g{rng.integers(0, 6)}" for _ in range(n)],
                          pa.string()),
        })
        quota = int(rng.integers(1, 40))
        out = grouped_exact_sample(rd.from_arrow(t), "g", "k", n=quota).take_all()
        sizes = {}
        for r in t.to_pylist():
            sizes[r["g"]] = sizes.get(r["g"], 0) + 1
        got = {}
        for r in out:
            got[r["g"]] = got.get(r["g"], 0) + 1
        for g, sz in sizes.items():
            assert got.get(g, 0) == min(quota, sz), (seed, g)
