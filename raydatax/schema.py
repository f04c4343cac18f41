"""Canonical Arrow schemas + schema-evolution helpers.

The reference has no schema object at all — column count/types are implicit
per record and validated only by writers (see SURVEY.md §1.1;
``/root/reference/common/src/main/java/com/alibaba/datax/common/element/
Column.java:13-75``).  We replace that with explicit ``pyarrow.Schema``s and
resolve drift (added columns, safe integer widening) by Arrow schema
unification at batch boundaries — the engine-side analogue of DataX's
"user configures columns, writer validates count" contract.
"""

from __future__ import annotations

import pyarrow as pa

# Target lake table shape, exactly the `input_hint` transcript schema.
TRANSCRIPT_FIELDS: list[tuple[str, pa.DataType]] = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]

TRANSCRIPT_SCHEMA = pa.schema(TRANSCRIPT_FIELDS)

# CDC envelope: `seq` is the version vector (mirrors otsstreamreader's
# sequence id `epoch_timestamp_rowIdx_shardId`, /root/reference/otsstreamreader/
# .../core/SingleVerAndUpOnlyModeRecordSender.java:94-100); `op` mirrors
# otswriter's OTSOpType PUT/UPDATE/DELETE (/root/reference/otswriter/
# .../model/OTSOpType.java:4-6).
EVENT_SCHEMA = pa.schema(
    [("seq", pa.int64()), ("op", pa.string())] + TRANSCRIPT_FIELDS
)

# Lake rows retain `seq` so that merge is a pure rebase-LWW over
# (base rows ∪ new events) — no separate tombstone store is needed.
LAKE_SCHEMA = pa.schema(TRANSCRIPT_FIELDS + [("seq", pa.int64())])

KEY_COLUMNS = ("conv_id", "turn_idx")
OPS = ("I", "U", "D")


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify schemas permissively: missing columns become nullable, integer
    types widen (int32→int64).  Used at plan time over WAL segment footers and
    at batch boundaries."""
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def evolve_event_schema(segment_schemas: list[pa.Schema]) -> pa.Schema:
    """Target read-side schema for an epoch: the canonical event schema
    unified with whatever the WAL segments actually carry (e.g. pre-evolution
    segments without `tool`, or `turn_idx` widened to int64)."""
    uni = unify([EVENT_SCHEMA] + list(segment_schemas))
    # Keep canonical column order first, then any extra columns in first-seen
    # order, so downstream code can rely on positional stability.
    names = [f.name for f in EVENT_SCHEMA]
    extras = [n for n in uni.names if n not in names]
    return pa.schema([uni.field(n) for n in names + extras])


def lake_schema_for(event_schema: pa.Schema) -> pa.Schema:
    """Lake schema implied by an (evolved) event schema: transcript columns
    (at their evolved types) + `seq`, minus the CDC `op` column."""
    fields = [event_schema.field(n) for n in event_schema.names if n != "op" and n != "seq"]
    return pa.schema(fields + [pa.field("seq", pa.int64())])


def normalize_to(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Project/cast an Arrow table onto `target`: add missing columns as
    nulls, cast safely (int widening, tz-naive timestamps), order columns.
    This is the per-batch schema-unification step."""
    if table.schema.equals(target, check_metadata=False):
        return table  # zero-copy fast path (hot on every batch)
    n = table.num_rows
    cols = []
    for field in target:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=field.type))
    return pa.Table.from_arrays(cols, schema=target)
