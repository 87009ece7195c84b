"""Snapshot differ (SURVEY.md §4.3.5): diff two versions of a table into
insert/update/delete change events — the relational re-expression of the
reference's ``update_historical_snapshots`` compare-before-write (a scrape
session's roster snapshot vs the open snapshots in the DB).

``differ ∘ apply = identity``: applying the emitted events to the old
snapshot must reproduce the new one (tested in test_differ.py).

event_seq semantics: every event from one diff carries the same
``snapshot_seq`` — LWW only needs ordering per doc ACROSS snapshots, and a doc
appears at most once per diff. This avoids any global row-numbering shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str = "doc_id",
    payload_cols: list[str] | None = None,
    snapshot_seq: int = 0,
    ts=None,
) -> DataFrame:
    """Emit changelog events turning ``old`` into ``new``.

    Returns (event_seq, op, <key>, <payload...>, ts, schema_ver) — the engine's
    changelog schema. Unchanged rows emit nothing (the reference's
    skip-unchanged-snapshot optimization).
    """
    payload_cols = payload_cols or [c for c in new.columns if c != key]
    o = old.select(
        key, F.lit(1).alias("_in_old"), *[F.col(c).alias(f"_o_{c}") for c in payload_cols]
    )
    n = new.select(key, F.lit(1).alias("_in_new"), *payload_cols)
    j = o.join(n, key, "full_outer")

    changed = F.lit(False)
    for c in payload_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_o_{c}"))
    # presence markers survive the full-outer join even for all-null payloads
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()

    op = (
        F.when(~in_old & in_new, "I")
        .when(in_old & ~in_new, "D")
        .when(changed, "U")
        .otherwise(None)  # unchanged -> no event
    )
    out = (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            F.lit(snapshot_seq).cast("long").alias("event_seq"),
            "op",
            key,
            *[
                F.when(F.col("op") != "D", F.col(c)).alias(c)
                for c in payload_cols
            ],
            # NTZ: the changelog contract's ts type (parquet timestamp[us]
            # loads as NTZ; CHANGELOG_V1_SCHEMA declares NTZ) — an LTZ column
            # here would skew through the session timezone when unioned/tailed
            # alongside generated batches
            F.lit(ts).cast("timestamp_ntz").alias("ts"),
            F.lit(1).cast("int").alias("schema_ver"),
        )
    )
    return out

def table_changes_pruned(
    spark,
    table,
    from_version: int,
    to_version: int,
    *,
    cols: list[str],
) -> DataFrame:
    """Column-pruned, BUCKET-pruned change feed between two snapshots of a
    miniberg table — the diff the index syncs run every advance.

    Buckets whose file sets are identical in both snapshots hold identical
    rows and so contribute no events; ``changed_buckets`` (pure metadata —
    sidecar-path comparison, range-level under the third manifest layout)
    restricts BOTH snapshot reads to the buckets that moved. At lake scale
    this turns an index sync over a small commit from two full table scans
    into a few bucket reads. ``cols`` prunes the payload to what the index
    ingests (text / embedding), so column pruning reaches the parquet scan
    too. Falls back to full reads when bucket identity is not comparable
    (``changed_buckets`` returns None: the bucket function changed)."""
    key = table.manifest(to_version)["key_col"]
    buckets = table.changed_buckets(from_version, to_version)
    old = table.read(spark, version=from_version, buckets=buckets).select(key, *cols)
    new = table.read(spark, version=to_version, buckets=buckets).select(key, *cols)
    return snapshot_diff(old, new, key=key, payload_cols=list(cols))
