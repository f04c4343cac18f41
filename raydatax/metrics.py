"""Per-partition lineage → job report (CommunicationTool parity).

The reference accumulates readSucceededRecords/Bytes, writeReceived, failed
counts and speed per channel and rolls them up every 10 s
(``/root/reference/common/.../communication/CommunicationTool.java:16-81``;
report loop ``core/.../taskgroup/TaskGroupContainer.java:253-266``; final
summary ``JobContainer.java:575-647``).  Our analogue: every merge worker
emits one lineage row per partition; the driver rolls them up into a job
report persisted under ``<lake>/_metrics/epoch-<e>.json`` and printable in a
DataX-``logStatistics``-like block.
"""

from __future__ import annotations


def build_report(
    epoch: int,
    lineage_rows: list[dict],
    wall_s: float,
    plan_info: dict,
    dirty_rows: int,
) -> dict:
    writes = [r for r in lineage_rows if r["action"] == "write"]
    skips = [r for r in lineage_rows if r["action"] == "skip"]
    replayed = sum(r["replayed"] for r in writes)
    report = {
        "epoch": epoch,
        "wall_s": round(wall_s, 3),
        "segments_read": plan_info.get("segments_read", 0),
        "segments_pruned": plan_info.get("segments_pruned", 0),
        "events_routed": sum(r["events_in"] for r in lineage_rows),
        "events_replayed": replayed,
        "events_stale_skipped": sum(r["events_in"] for r in lineage_rows) - replayed,
        "inserts": sum(r["ins"] for r in writes),
        "updates": sum(r["upd"] for r in writes),
        "deletes": sum(r["del_"] for r in writes),
        "lww_dropped": sum(r["lww_dropped"] for r in writes),
        "deleted_keys": sum(r["deleted_keys"] for r in writes),
        "dirty_records": dirty_rows,
        "partitions_written": len(writes),
        "partitions_skipped": len(skips),
        "rows_total": sum(r["rows_out"] for r in writes),
        "bytes_written": sum(r["bytes_out"] for r in writes),
        "events_per_s": round(replayed / wall_s, 1) if wall_s > 0 else 0.0,
        "per_partition": sorted(lineage_rows, key=lambda r: r["partition"]),
    }
    return report


def format_summary(report: dict) -> str:
    """Human-readable block in the spirit of JobContainer.logStatistics."""
    return (
        f"raydatax job epoch {report['epoch']} finished in {report['wall_s']}s\n"
        f"  segments: {report['segments_read']} read, {report['segments_pruned']} pruned by watermark\n"
        f"  events  : {report['events_routed']} routed | {report['events_replayed']} replayed"
        f" | {report['events_stale_skipped']} stale-skipped | {report['dirty_records']} dirty\n"
        f"  ops     : I={report['inserts']} U={report['updates']} D={report['deletes']}"
        f" | lww-dropped={report['lww_dropped']} | deleted-keys={report['deleted_keys']}\n"
        f"  lake    : {report['partitions_written']} partitions written, "
        f"{report['partitions_skipped']} skipped, {report['rows_total']} rows, "
        f"{report['bytes_written']} bytes\n"
        f"  speed   : {report['events_per_s']} events/s"
    )
