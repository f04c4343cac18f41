"""Lake consistency checker (``fsck``) — the audit side of exactly-once.

The engine's correctness story rests on invariants the two-phase commit
maintains (files published before manifests, manifests before history
trims, horizons before deletions).  ``lake_fsck`` verifies them all
OFFLINE, so an operator can prove a lake is sound after a crash, a
botched manual intervention, or a replica promotion — the lake-level
analogue of the reference's post-job verification accounting
(`/root/reference/core/.../util/ErrorRecordChecker.java:18-82` checks
record counts after the run; we check the persisted state itself).

Structural pass (metadata only, no data reads — O(partitions)):
  - `_lake.json` present, mode valid, partition-hash version matches
    this build (mismatch = every key-pruned read is wrong);
  - every manifest's file exists, its size matches the recorded
    ``bytes``, its Parquet footer is readable and its row count matches
    the recorded ``rows``;
  - history records: image mode may carry tombstones (file vacuumed) but
    a changelog lake's live records (epoch ≥ horizon) MUST all have
    files — a missing one means history was destroyed;
  - compaction horizons are coherent (exactly one authoritative marker
    at the horizon epoch, nothing newer below it);
  - per-partition high-watermarks never regress across history epochs;
  - orphaned staging dirs / stray ``.tmp`` files are counted (harmless —
    crash leftovers — but worth surfacing).

Deep pass (``deep=True``): one Ray task per committed file reads the
data and verifies the (conv_id, turn_idx, seq)-sorted invariant plus
``max(seq) ≤`` the partition's recorded watermark.  Work is fully
distributed; the driver sees one small verdict per file.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import ray

from . import manifest as mf


def _structural(lake_dir: str) -> tuple[list[str], list[dict], int]:
    issues: list[str] = []
    cfg = mf.load_lake_config(lake_dir)
    if cfg is None:
        return [f"no _lake.json under {lake_dir}"], [], 0
    mode = cfg.get("output", "image")
    if mode not in ("image", "changelog"):
        issues.append(f"unknown output mode {mode!r}")
    try:
        mf.check_hash_version(cfg, lake_dir)
    except RuntimeError as e:
        issues.append(str(e))

    manifests = mf.load_manifests(lake_dir)
    history: dict[int, list[dict]] = {}
    for p, m in mf.iter_history_records(lake_dir):
        if m is None:
            issues.append(f"unreadable history record {os.path.basename(p)}")
        else:
            history.setdefault(int(m["partition"]), []).append(m)

    def check_file(rec: dict, what: str) -> bool:
        f = os.path.join(lake_dir, rec["file"])
        if not os.path.exists(f):
            return False
        size = os.path.getsize(f)
        if size != rec.get("bytes", size):
            issues.append(
                f"{what} {rec['file']}: size {size} != recorded {rec['bytes']}"
            )
            return True
        try:
            md = pq.read_metadata(f)
        except Exception as e:
            issues.append(f"{what} {rec['file']}: unreadable footer ({e})")
            return True
        if md.num_rows != rec.get("rows", md.num_rows):
            issues.append(
                f"{what} {rec['file']}: {md.num_rows} rows != recorded "
                f"{rec['rows']}"
            )
        return True

    live_files: list[dict] = []
    for pid, man in sorted(manifests.items()):
        if not check_file(man, f"manifest part {pid}"):
            issues.append(f"manifest part {pid}: missing file {man['file']}")

    for pid, recs in sorted(history.items()):
        recs.sort(key=lambda m: m["epoch"])
        markers = [m for m in recs if m.get("compacted_upto")]
        horizon = max((m["epoch"] for m in markers), default=None)
        if horizon is not None:
            below = [m for m in markers if m["epoch"] < horizon]
            # older markers below the current horizon are legal only until
            # the re-run cleanup removes them; flag if their files linger
            for m in below:
                if os.path.exists(os.path.join(lake_dir, m["file"])):
                    issues.append(
                        f"part {pid}: superseded compacted file below "
                        f"horizon {horizon} still present: {m['file']}"
                    )
        hw_prev = None
        for m in recs:
            live = horizon is None or m["epoch"] >= horizon
            present = check_file(m, f"history part {pid} epoch {m['epoch']}")
            if not present and live and mode == "changelog":
                issues.append(
                    f"part {pid}: changelog history file missing for live "
                    f"epoch {m['epoch']}: {m['file']}"
                )
            if present and live:
                live_files.append(
                    {"pid": pid, "file": os.path.join(lake_dir, m["file"]),
                     "hw_seq": m.get("hw_seq")}
                )
            hw = m.get("hw_seq")
            if hw is not None and hw_prev is not None and hw < hw_prev:
                issues.append(
                    f"part {pid}: watermark regressed {hw_prev} -> {hw} "
                    f"at epoch {m['epoch']}"
                )
            if hw is not None:
                hw_prev = hw
        man = manifests.get(pid)
        if man is not None and recs and man["epoch"] < recs[-1]["epoch"]:
            issues.append(
                f"part {pid}: manifest at epoch {man['epoch']} but history "
                f"reaches {recs[-1]['epoch']} — manifest flip never landed"
            )

    strays = len(glob.glob(os.path.join(lake_dir, "_staging", "epoch-*", "*")))
    strays += len(
        glob.glob(os.path.join(lake_dir, "data", "part-*", "*.tmp"))
    )
    return issues, live_files, strays


@ray.remote
def _deep_check(path: str, hw_seq: int | None) -> list[str]:
    import numpy as np

    issues = []
    try:
        t = pq.read_table(path, columns=["conv_id", "turn_idx", "seq"])
    except Exception as e:
        # a corrupt/truncated data page is precisely what the deep pass
        # exists to REPORT — it must come back as an issue, not crash the
        # whole fsck out of ray.get with a task error
        return [f"{path}: unreadable in deep scan ({e})"]
    if t.num_rows > 1:
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False)
        seq = t["seq"].to_numpy(zero_copy_only=False)
        gt = conv[1:] > conv[:-1]
        eq = conv[1:] == conv[:-1]
        ok = gt | (eq & ((turn[1:] > turn[:-1])
                         | ((turn[1:] == turn[:-1]) & (seq[1:] >= seq[:-1]))))
        if not bool(ok.all()):
            issues.append(f"{path}: rows not (conv_id, turn_idx, seq)-sorted")
    if t.num_rows and hw_seq is not None:
        import pyarrow.compute as pc

        mx = int(pc.max(t["seq"]).as_py())
        if mx > hw_seq:
            issues.append(f"{path}: max seq {mx} above watermark {hw_seq}")
    return issues


def lake_fsck(lake_dir: str, deep: bool = False) -> dict:
    """Run the structural pass (and optionally the deep pass) and return
    ``{"ok", "issues", "files_checked", "stray_staging_files"}``."""
    issues, live_files, strays = _structural(lake_dir)
    files_checked = 0
    if deep and not any("no _lake.json" in i for i in issues):
        verdicts = ray.get(
            [_deep_check.remote(f["file"], f["hw_seq"]) for f in live_files]
        )
        files_checked = len(live_files)
        for v in verdicts:
            issues.extend(v)
    return {
        "ok": not issues,
        "issues": issues,
        "files_checked": files_checked,
        "stray_staging_files": strays,
    }


def lake_digest(lake_dir: str, groups: int = 8, at_epoch: int | None = None):
    """Order-free content digest of the committed table state — the
    replica-verification primitive: two lakes hold identical state iff
    their digests match, and NO row ever crosses the wire to find out
    (contrast replicate.py's file copy and the O(rows) state-equality
    test).  Per logical group (``mix64(poly(conv_id)) % groups`` — stable
    across physical partition layouts, salted hot-key splits included):
    row count + the mod-2^64 SUM of every row's content hash
    ``mix64(poly(conv_id ␟ turn_idx ␟ text))``.  Addition is commutative,
    so the digest is independent of row order, block boundaries and
    engine — SQL reproduces it exactly (poly/mix64 HUGEINT replicas).

    The uint64 sum ships as two int64 half-sums (hi/lo 32 bits) through
    the pre-aggregated groupby — overflow-safe to 2^31 rows per group —
    and recombines mod 2^64 at the end.  Returns a Dataset of
    ``(pid, n_rows, digest)`` with the digest as a decimal string.

    Caveat: NULL text and empty text hash identically (both engines
    coalesce to "") — acceptable for the transcript lake, whose live rows
    never carry null text; a digest over nullable payloads should add a
    validity byte to the row string."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .driver import read_lake
    from .partition import hash_string_column
    from .relational import preagg_groupby

    ds = read_lake(lake_dir, at_epoch=at_epoch,
                   columns=["conv_id", "turn_idx", "text"])
    sep = "\x1f"

    def partial(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].combine_chunks()
        row_str = pc.binary_join_element_wise(
            conv,
            pc.cast(t["turn_idx"], pa.string()),
            pc.fill_null(t["text"], ""),
            sep,
        )
        h = hash_string_column(row_str)
        pid = (hash_string_column(conv) % np.uint64(groups)).astype(np.int64)
        hi = (h >> np.uint64(32)).astype(np.int64)
        lo = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        n = np.bincount(pid, minlength=groups)
        keep = n > 0
        # int64 scatter-add (np.add.at), NOT float64-weighted bincount: a
        # float64 partial is exact only below 2^53, i.e. ~2^21 rows/group
        # per batch with 32-bit half-hashes.  int64 keeps the per-batch
        # partial exact to 2^31 rows/group, matching the merge stage.
        hi_sum = np.zeros(groups, dtype=np.int64)
        lo_sum = np.zeros(groups, dtype=np.int64)
        np.add.at(hi_sum, pid, hi)
        np.add.at(lo_sum, pid, lo)
        return pa.table({
            "pid": pa.array(np.arange(groups, dtype=np.int64)[keep]),
            "__hi": pa.array(hi_sum[keep]),
            "__lo": pa.array(lo_sum[keep]),
            "__n": pa.array(n[keep].astype(np.int64)),
        })

    merged = preagg_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["pid"],
        [("__hi", "sum", "sh"), ("__lo", "sum", "sl"), ("__n", "sum", "n_rows")],
    )

    def fmt(t: pa.Table) -> pa.Table:
        sh = t["sh"].to_numpy(zero_copy_only=False)
        sl = t["sl"].to_numpy(zero_copy_only=False)
        dig = [str(((int(a) << 32) + int(b)) % (1 << 64)) for a, b in zip(sh, sl)]
        return pa.table({"pid": t["pid"], "n_rows": t["n_rows"],
                         "digest": pa.array(dig, pa.string())})

    return merged.map_batches(fmt, batch_format="pyarrow")
