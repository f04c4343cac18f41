"""Declarative job runner — DataX job-JSON parity.

The reference's entire UX is ``python datax.py job.json`` with a config of
shape ``job.content[].{reader,transformer,writer}`` + ``job.setting``
(``/root/reference/core/src/main/java/com/alibaba/datax/core/Engine.java:
122-172``; ``userGuid.md:24-29``).  This module accepts the same shape and
compiles it to a Ray Data pipeline, so a reference user's mental model
(declare a reader, a transformer chain, a writer; run one command) carries
over directly:

```json
{"job": {"content": [{
    "reader": {"name": "parquetreader", "parameter": {"path": "...", "columns": ["a","b"]}},
    "transformer": [{"name": "dx_substr", "parameter": {"column": "a", "paras": [0, 5]}}],
    "writer": {"name": "csvwriter", "parameter": {"path": "/tmp/out", "writeMode": "truncate"}}
  }],
  "setting": {"errorLimit": {"record": 0}}}}
```

Readers: parquetreader, csvreader (full DataX column-spec semantics),
jsonreader, streamreader (synthetic generator; sliceRecordCount × channel),
walreader (CDC segments).  Writers: parquetwriter, csvwriter, jsonwriter,
walwriter (event-log sink), streamwriter (print/discard test sink,
``/root/reference/streamwriter/.../StreamWriter.java``), lakewriter.
``walreader → lakewriter`` compiles to the full CDC ingest engine
(``driver.run_job``) with two-phase commit + resume.
"""

from __future__ import annotations

import json
from typing import Any

import ray.data as rd

from .sinks import write_files, write_wal_sink
from .sources import ColumnEntry, read_csv_datax, read_jsonl, synthetic_stream
from .transforms import chain


class JobConfigError(ValueError):
    pass


def _reader_to_dataset(reader: dict) -> "rd.Dataset":
    name = reader.get("name")
    p = reader.get("parameter", {})
    if name == "parquetreader":
        kwargs: dict[str, Any] = {}
        if p.get("columns"):
            kwargs["columns"] = list(p["columns"])
        return rd.read_parquet(p["path"], **kwargs)
    if name == "csvreader":
        spec = None
        if p.get("column"):
            spec = [
                ColumnEntry(
                    index=c.get("index"),
                    value=c.get("value"),
                    type=c.get("type", "string"),
                    format=c.get("format"),
                    name=c.get("name"),
                )
                for c in p["column"]
            ]
        return read_csv_datax(
            p["path"],
            column_spec=spec,
            delimiter=p.get("fieldDelimiter", ","),
            skip_header=bool(p.get("skipHeader", False)),
            null_format=p.get("nullFormat"),
            encoding=p.get("encoding", "utf8"),
        )
    if name == "jsonreader":
        # docPaths: [{"path": "meta.lang", "name": "lang"}, ...] — the
        # mongodbreader nested-document column contract (dotted paths,
        # missing → NULL)
        doc_paths = [(d["path"], d.get("name", d["path"]))
                     for d in p.get("docPaths", [])] or None
        return read_jsonl(p["path"], doc_paths=doc_paths)
    if name == "streamreader":
        n = int(p.get("sliceRecordCount", 1000)) * int(p.get("channel", 1))
        if p.get("column"):
            # the reference's column-spec mixup generator: per-column
            # const `value` or `random: "a, b"` (StreamReader.java:95-166)
            from .sources import synthetic_columns

            return synthetic_columns(p["column"], n,
                                     seed=int(p.get("seed", 42)),
                                     shards=int(p.get("channel", 1)))
        return synthetic_stream(n, seed=int(p.get("seed", 42)),
                                shards=int(p.get("channel", 1)))
    if name == "walreader":
        import glob
        import os

        return rd.read_parquet(sorted(glob.glob(os.path.join(p["path"], "seg-*.parquet"))))
    if name in ("searchreader", "elasticsearchreader", "solrreader"):
        # search-reader family: TF match query over a parquet corpus,
        # global top-k (ESReader match query; solr paged query)
        from .text import search_topk

        ds = rd.read_parquet(
            p["path"], columns=[p.get("idColumn", "doc_id"),
                                p.get("column", "text")]
        )
        top = search_topk(
            ds, list(p["terms"]), int(p.get("topK", 100)),
            column=p.get("column", "text"), id_col=p.get("idColumn", "doc_id"),
        )
        return rd.from_arrow(top)
    if name in ("tsdbreader", "opentsdbreader"):
        # time-series family: per-interval read tasks over [start, end),
        # metric predicate pushed (TSDBReader.java:94-96,145-192)
        from .sources import read_tsdb

        return read_tsdb(
            p["path"], p.get("tsColumn", "ts"),
            start=p["beginDateTime"], end=p["endDateTime"],
            interval_s=int(p.get("intervalSeconds", 3600)),
            metric_col=p.get("metricColumn"), metrics=p.get("metric"),
            columns=p.get("column") if p.get("column") not in (["*"], "*") else None,
        )
    if name in ("hbasereader", "keyrangereader"):
        # rowkey-range scan with footer-stat pruning; mode normal (latest
        # per key) | multiVersion (every version) — Hbase11xReader switch
        from .sources import read_key_range

        return read_key_range(
            p["path"], p["rowkeyColumn"],
            start=p.get("startRowkey"), stop=p.get("endRowkey"),
            columns=p.get("column") if p.get("column") not in (["*"], "*") else None,
            mode=p.get("mode", "multiVersion"),
            version_col=p.get("versionColumn", "seq"),
        )
    if name in ("rdbmsreader", "duckdbreader", "sqlitereader", "cassandrareader"):
        # JDBC-family parity: splitPk range-sliced parallel SQL read;
        # splitMode "token" (default for cassandrareader) = token-ring
        # slices over hash(pk), the cassandra/kudu split model
        from .sql_source import read_sql_table

        cols = p.get("column")
        if cols in (None, ["*"], "*"):
            cols = None
        return read_sql_table(
            p["path"],
            p["table"],
            split_pk=p.get("splitPk"),
            num_splits=int(p.get("numSplits", p.get("channel", 8))),
            columns=cols,
            where=p.get("where"),
            engine="sqlite" if name == "sqlitereader" else "duckdb",
            split_mode=p.get(
                "splitMode", "token" if name == "cassandrareader" else "range"
            ),
        )
    raise JobConfigError(f"unknown reader {name!r}")


def _apply_transformers(ds: "rd.Dataset", transformers: list[dict]) -> "rd.Dataset":
    if not transformers:
        return ds
    specs = []
    for t in transformers:
        par = t.get("parameter", {})
        args = [par["column"], *par.get("paras", [])] if "column" in par else par.get("paras", [])
        specs.append((t["name"], *args))
    return ds.map_batches(chain(specs), batch_format="pyarrow")


def run_job_config(config: dict, quiet: bool = True) -> dict:
    """Run one declarative job; returns a small report dict."""
    job = config.get("job", config)
    contents = job.get("content")
    if not contents:
        raise JobConfigError("job.content is required")
    setting = job.get("setting", {})
    reports = []
    for content in contents if isinstance(contents, list) else [contents]:
        reader = content.get("reader") or {}
        writer = content.get("writer") or {}
        wname, wp = writer.get("name"), writer.get("parameter", {})

        # CDC path: full engine with two-phase commit / resume / metrics
        if reader.get("name") == "walreader" and wname == "lakewriter":
            from .driver import run_job as run_ingest

            rp = reader["parameter"]
            rep = run_ingest(
                rp["path"],
                wp["path"],
                partitions=int(wp.get("partitions", 32)),
                salt=int(wp.get("salt", 4)),
                # otsstreamreader startTime/endTime window (reader-side knobs)
                start_ts=rp.get("startTime"),
                end_ts=rp.get("endTime"),
                sparse_updates=bool(wp.get("sparseUpdates", False)),
                # "image" (LWW row images) | "changelog" (multi-version
                # history) — the otsstreamreader output-mode switch
                output=wp.get("output"),
                error_limit_records=setting.get("errorLimit", {}).get("record"),
                error_limit_percentage=setting.get("errorLimit", {}).get("percentage"),
                quiet=quiet,
            )
            reports.append({"writer": "lakewriter", **{k: rep[k] for k in
                            ("action", "events_replayed", "rows_total", "epoch")}})
            continue

        ds = _reader_to_dataset(reader)
        ds = _apply_transformers(ds, content.get("transformer", []))

        if wname == "mongodbwriter" or (
            wname == "jsonwriter" and wp.get("docPaths")
        ):
            # document-store sink: flat columns → nested sub-documents
            # (inverse of jsonreader docPaths), mongodbwriter analogue
            from .sinks import write_jsonl

            if not wp.get("docPaths"):
                raise JobConfigError(f"{wname} requires parameter.docPaths")
            # name (source column) defaults to the path's last segment —
            # the flat column usually carries the leaf name
            dp = [(d["path"], d.get("name", d["path"].rsplit(".", 1)[-1]))
                  for d in wp["docPaths"]]
            out = write_jsonl(ds, wp["path"], doc_paths=dp,
                              write_mode=wp.get("writeMode", "truncate"))
            reports.append({"writer": wname, "path": out, "rows": ds.count()})
        elif wname in ("parquetwriter", "csvwriter", "jsonwriter"):
            fmt = wname.replace("writer", "")
            out = write_files(ds, wp["path"], fmt=fmt,
                              write_mode=wp.get("writeMode", "append"))
            reports.append({"writer": wname, "path": out, "rows": ds.count()})
        elif wname == "rdbmswriter":
            # JDBC writer family: writeMode insert|replace|upsert, preSql/
            # postSql — CommonRdbmsWriter / WriterUtil.java:113-146
            from .sql_source import write_sql_table

            rep = write_sql_table(
                ds, wp["dbPath"], wp["table"],
                write_mode=wp.get("writeMode", "insert"),
                conflict_keys=wp.get("conflictKeys"),
                order_by=wp.get("orderBy"),
                unique_keys=wp.get("uniqueKeys"),
                pre_sql=wp.get("preSql"),
                post_sql=wp.get("postSql"),
            )
            reports.append({"writer": wname, **rep})
        elif wname == "walwriter":
            paths = write_wal_sink(ds, wp["path"],
                                   seg_rows=int(wp.get("segRows", 250_000)))
            reports.append({"writer": wname, "segments": len(paths)})
        elif wname == "streamwriter":
            # print/discard test sink (StreamWriter parity)
            n = 0
            shown = 0
            limit = int(wp.get("print", 5))
            for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
                n += batch.num_rows
                take = min(limit - shown, batch.num_rows)
                if take > 0:
                    if not quiet:
                        for row in batch.slice(0, take).to_pylist():
                            print(row)
                    shown += take
            reports.append({"writer": wname, "rows": n})
        else:
            raise JobConfigError(f"unknown writer {wname!r}")
    return {"contents": reports}


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="raydatax declarative job runner")
    ap.add_argument("config", help="job JSON path")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    with open(args.config) as f:
        config = json.load(f)

    import ray

    owned = False
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
        owned = True
    try:
        report = run_job_config(config, quiet=False)
        print(json.dumps(report))
        return 0
    finally:
        if owned:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
