"""``python -m raydatax.maintenance`` — offline lake maintenance CLI.

Subcommands (each submittable via ``ray job submit``, like the driver):

  info         <lake>                      describe config/partitions/totals
  vacuum       <lake> [--keep N]          drop superseded epoch snapshots
  compact      <lake> [--upto-epoch E] [--min-files K] [--min-delta-ratio R]
               merge changelog epoch files (R>0 = geometric trigger)
  refresh-view <lake> <view_dir>          bring a summary view up to date
  fsck         <lake> [--deep]            verify commit invariants offline
  replicate    <src> <dst> [--no-prune]   incremental DR replica sync
  repartition  <old> <new> --partitions P [--salt S]   migrate the mapping
  bootstrap    <snapshot> <lake> --snapshot-seq S [--partitions P]
               full load at a WAL position; the next tail is incremental
  diff         <lake> --from-epoch E [--to-epoch E] [--out DIR]
               snapshot change feed (insert/update/delete) between epochs
  expire       <lake> <wal> --older-than TS [--event-ts TS] [--dry-run]
               [--apply]   TTL sweep: tombstone rows older than the cutoff
               through the normal CDC ingest path (no in-place mutation)
  compact-index <index_dir> [--min-epochs K]
               fold a persistent dedup index's epochs into one
               bucket-partitioned epoch (probe opens ~1 file/bucket again)
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="raydatax lake maintenance")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info")
    p.add_argument("lake")

    p = sub.add_parser("vacuum")
    p.add_argument("lake")
    p.add_argument("--keep", type=int, default=0,
                   help="retain the newest N unreferenced snapshots")

    p = sub.add_parser("compact")
    p.add_argument("lake")
    p.add_argument("--upto-epoch", type=int, default=None)
    p.add_argument("--min-files", type=int, default=1,
                   help="skip partitions with fewer uncompacted epoch files "
                        "(the compacted base does not count)")
    p.add_argument("--min-delta-ratio", type=float, default=0.0,
                   help="geometric trigger: skip partitions whose delta "
                        "bytes are below RATIO x the compacted base "
                        "(amortizes total rewrite volume to O(N log N))")

    p = sub.add_parser("refresh-view")
    p.add_argument("lake")
    p.add_argument("view_dir")

    p = sub.add_parser("bootstrap")
    p.add_argument("snapshot")
    p.add_argument("lake")
    p.add_argument("--snapshot-seq", type=int, required=True)
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--salt", type=int, default=4)

    p = sub.add_parser("fsck")
    p.add_argument("lake")
    p.add_argument("--deep", action="store_true",
                   help="also read every committed file and verify sort "
                        "order + watermark bounds (one Ray task per file)")

    p = sub.add_parser("digest")
    p.add_argument("lake")
    p.add_argument("--groups", type=int, default=8)
    p.add_argument("--at-epoch", type=int, default=None)

    p = sub.add_parser("replicate")
    p.add_argument("src_lake")
    p.add_argument("dst_lake")
    p.add_argument("--no-prune", action="store_true",
                   help="do not mirror upstream deletions onto the replica")

    p = sub.add_parser("repartition")
    p.add_argument("old_lake")
    p.add_argument("new_lake")
    p.add_argument("--partitions", type=int, required=True)
    p.add_argument("--salt", type=int, default=4)

    p = sub.add_parser("diff")
    p.add_argument("lake")
    p.add_argument("--from-epoch", type=int, required=True)
    p.add_argument("--to-epoch", type=int, default=None)
    p.add_argument("--out", default=None,
                   help="write the change feed as parquet to this directory "
                        "(default: print per-op counts only)")

    p = sub.add_parser("compact-index")
    p.add_argument("index_dir")
    p.add_argument("--min-epochs", type=int, default=2,
                   help="skip when fewer live epochs have accumulated")

    p = sub.add_parser("bloom-index")
    p.add_argument("lake")
    p.add_argument("--column", required=True,
                   help="lake column to bloom-index for equality skipping "
                        "(incremental: only files committed since the last "
                        "build are scanned)")
    p.add_argument("--bits-per-key", type=int, default=12)

    p = sub.add_parser("expire")
    p.add_argument("lake")
    p.add_argument("wal")
    p.add_argument("--older-than", required=True,
                   help="cutoff (ISO-8601 or int µs): tombstone every live "
                        "row with ts strictly below it")
    p.add_argument("--event-ts", default=None,
                   help="event time for the tombstones (required for "
                        "ts-windowed lakes; default: each row's own ts)")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--apply", action="store_true",
                   help="run the ingest immediately after appending the "
                        "tombstones (otherwise the next tail applies them)")

    args = ap.parse_args(argv)

    import ray

    owned = False
    metadata_only = args.cmd == "info" or (
        args.cmd == "fsck" and not args.deep
    )
    if not metadata_only and not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
        owned = True
    try:
        if args.cmd == "info":
            from .driver import lake_info

            out = lake_info(args.lake)
        elif args.cmd == "vacuum":
            from .manifest import vacuum

            out = {"removed": vacuum(args.lake, keep_unreferenced=args.keep)}
        elif args.cmd == "compact":
            from .driver import compact_changelog

            out = compact_changelog(args.lake, upto_epoch=args.upto_epoch,
                                    min_files=args.min_files,
                                    min_delta_ratio=args.min_delta_ratio)
        elif args.cmd == "refresh-view":
            from .view import refresh_view

            out = refresh_view(args.lake, args.view_dir)
        elif args.cmd == "fsck":
            from .fsck import lake_fsck

            out = lake_fsck(args.lake, deep=args.deep)
        elif args.cmd == "digest":
            from .fsck import lake_digest

            out = {"groups": [
                dict(r) for r in sorted(
                    lake_digest(args.lake, groups=args.groups,
                                at_epoch=args.at_epoch).take_all(),
                    key=lambda r: r["pid"],
                )
            ]}
        elif args.cmd == "replicate":
            from .replicate import replicate_lake

            out = replicate_lake(args.src_lake, args.dst_lake,
                                 prune=not args.no_prune)
        elif args.cmd == "diff":
            from .driver import lake_diff

            ds = lake_diff(args.lake, from_epoch=args.from_epoch,
                           to_epoch=args.to_epoch)
            if args.out:
                ds = ds.materialize()
                ds.write_parquet(args.out)
            counts = {}
            for row in ds.groupby("_op").count().take_all():
                counts[row["_op"]] = row["count()"]
            out = {"changes": sum(counts.values()), "by_op": counts,
                   "out": args.out}
        elif args.cmd == "compact-index":
            from .dedup import compact_index

            out = compact_index(args.index_dir, min_epochs=args.min_epochs)
        elif args.cmd == "bloom-index":
            from .skipping import index_lake_column

            out = index_lake_column(
                args.lake, args.column, bits_per_key=args.bits_per_key
            )
        elif args.cmd == "expire":
            from . import manifest as mf
            from .driver import expire_rows, job_state_path, run_job

            def _ts_arg(v):  # "123456" µs vs ISO-8601 (driver CLI convention)
                return int(v) if v is not None and v.isdigit() else v

            if args.apply:
                # check BEFORE mutating the WAL: this subcommand's bare
                # run_job is seq-mode, which a ts-windowed lake refuses —
                # failing after the tombstones were appended would leave
                # partial side effects behind an error
                st = mf._read_json(job_state_path(args.lake))
                if st is not None and st.get("mode") == "window":
                    raise SystemExit(
                        "expire --apply cannot run on a ts-windowed lake "
                        "(the apply needs window bounds): run expire "
                        "WITHOUT --apply, then apply the tombstones with "
                        "a windowed run_job / driver --start-ts/--end-ts "
                        "covering their event_ts"
                    )
            out = expire_rows(args.lake, args.wal,
                              older_than=_ts_arg(args.older_than),
                              event_ts=_ts_arg(args.event_ts),
                              dry_run=args.dry_run)
            if args.apply and not args.dry_run and out["expired_keys"]:
                rep = run_job(args.wal, args.lake)
                out["applied"] = {k: rep[k] for k in
                                  ("epoch", "events_replayed", "deletes",
                                   "action")}
        elif args.cmd == "bootstrap":
            from .driver import bootstrap_lake

            rep = bootstrap_lake(args.snapshot, args.lake,
                                 snapshot_seq=args.snapshot_seq,
                                 partitions=args.partitions, salt=args.salt)
            out = {k: v for k, v in rep.items() if k != "per_partition"}
        else:
            from .driver import repartition_lake

            rep = repartition_lake(args.old_lake, args.new_lake,
                                   partitions=args.partitions, salt=args.salt)
            out = {k: v for k, v in rep.items() if k != "per_partition"}
        print(json.dumps(out, default=str))
        return 0
    finally:
        if owned:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
