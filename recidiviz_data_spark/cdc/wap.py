"""Write-audit-publish (WAP) over miniberg branches.

The production data-quality gate at lake scale: a CDC batch is applied to a
BRANCH of the target table (an isolated manifest chain sharing main's
immutable data files), audits run against the branch's RESULTING SNAPSHOT —
not just the incoming events — and only a passing audit publishes the branch
into main as one atomic manifest CAS. A failing audit drops the branch and
main is untouched (the staged data files become orphans GC reclaims after
the grace window). This composes with, and is stronger than, the row-level
invalid gate inside ``apply_batch``: the apply gate rejects malformed
EVENTS; a WAP audit can reject a batch for what it does to the TABLE
(row-count collapse, null-rate spike, a broken aggregate invariant) with
full read access to the staged state.

Reference analog: SURVEY.md §2.2 P4's validate-then-load pipeline shape
([U] reconstruction); the branch mechanics follow Iceberg's
branch/write-audit-publish workflow (public API semantics, re-expressed
over miniberg's manifest chains).
"""

from __future__ import annotations

import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from recidiviz_data_spark.cdc.apply import apply_batch
from recidiviz_data_spark.tables.miniberg import Miniberg


def write_audit_publish(
    spark: SparkSession,
    table: Miniberg,
    events: DataFrame,
    batch_id: int,
    *,
    audit_fn: Callable[[DataFrame], bool],
    branch_name: str | None = None,
    keep_failed_branch: bool = False,
    **apply_kw,
) -> dict:
    """Apply one CDC batch through the write-audit-publish gate.

    ``audit_fn(staged_df) -> bool`` receives the branch's post-apply
    snapshot as a DataFrame (tombstones already filtered) and decides the
    batch's fate. Returns ``{published, version, branch, lineage}``:
    ``published=False`` means the audit failed, main is byte-identical to
    before, and the branch was dropped (or kept for debugging when
    ``keep_failed_branch=True`` — its name is in the result).

    Scale notes: the fork is O(1) metadata; the publish is one O(buckets)
    manifest CAS adopting the branch's sidecar references verbatim (zero
    data movement — the staged parquet files simply become main's); main
    commits that landed DURING the audit on disjoint buckets merge cleanly
    via publish_branch's rebase. The audit itself reads only the staged
    snapshot — bucket pruning and file skipping apply as on any read."""
    if table.branch is not None:
        raise ValueError("write_audit_publish targets main, not a branch")
    name = branch_name or f"wap-{batch_id}-{uuid.uuid4().hex[:8]}"
    b = table.create_branch(name)
    try:
        lineage = apply_batch(spark, b, events, batch_id, **apply_kw)
        ok = bool(audit_fn(b.read(spark)))
    except BaseException:
        table.drop_branch(name)
        raise
    if not ok:
        if not keep_failed_branch:
            table.drop_branch(name)
        return {
            "published": False,
            "version": table.current_version(),
            "branch": name if keep_failed_branch else None,
            "lineage": lineage,
        }
    v = table.publish_branch(name)
    return {"published": True, "version": v, "branch": None, "lineage": lineage}
