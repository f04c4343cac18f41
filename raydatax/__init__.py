"""raydatax — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch engine with the query/data-processing capabilities of the
DataX reader→channel→writer sync framework (reference studied in SURVEY.md),
re-expressed Ray-Data-first:

- a simulated binlog/WAL of insert/update/delete events keyed by
  ``(conv_id, turn_idx)`` over multi-turn conversation transcripts is tailed
  and applied as key-partitioned last-writer-wins upserts into a partitioned
  Parquet lake table (``driver.run_job``);
- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches; the only wide operation is one hash shuffle on (salted) conv_id;
- exactly-once via a two-phase sink: staged Parquet + atomic per-partition
  commit manifests recording high-watermark sequence numbers
  (mirrors hdfswriter tmp-dir+rename, ``/root/reference/hdfswriter/src/main/
  java/com/alibaba/datax/plugin/writer/hdfswriter/HdfsWriter.java:190-322``);
- checkpoint/resume replays only events with ``seq > high_watermark``
  (mirrors otsstreamreader ShardCheckpoint, ``/root/reference/otsstreamreader/
  .../model/ShardCheckpoint.java:8-118``);
- schema evolution by Arrow schema unification at batch boundaries;
- per-partition lineage/throughput metrics (CommunicationTool parity,
  ``/root/reference/core/.../communication/CommunicationTool.java:16-50``).

No module in this package calls ``ray.init()`` — sessions are owned by the
test fixture, ``bench.py`` and CLI entry points only.
"""

__version__ = "0.1.0"
