"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Nothing here (or in the raydatax library) calls ``ray.init`` /
``ray.shutdown`` — the harness owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: deterministic transcript
    CDC log → raydatax replay engine (salted hash partitioning, LWW merge
    actors, two-phase manifest sink) → final lake table as a Dataset."""
    import ray.data as rd

    from raydatax.pipelines import transcript_cdc_replay

    table = transcript_cdc_replay("/root/testdata/sf0.001")
    return rd.from_arrow(table)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented pipeline/operator (SURVEY.md §2 coverage +
    the training-data families).  Each callable takes sf_dir."""
    from raydatax.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names).  Only the
    six pipelines whose semantics are not SQL-expressible are omitted —
    the raw LSH/SimHash/IVF-approximate stages (dedup_minhash,
    dedup_simhash, dedup_embedding, ann_ivf) and the two direct HLL
    estimates (approx_users_hll, daily_users_hll); each has a
    SQL-certified exact twin in the registry.  The driver records the
    weaker rows-only check for the six."""
    from raydatax.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
