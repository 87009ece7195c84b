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
    audit_on: str = "snapshot",
    branch_name: str | None = None,
    keep_failed_branch: bool = False,
    **apply_kw,
) -> dict:
    """Apply one CDC batch through the write-audit-publish gate.

    ``audit_fn(df) -> bool`` decides the batch's fate; what ``df`` is
    depends on ``audit_on``:

    - ``"snapshot"`` (default): the branch's full post-apply snapshot
      (tombstones already filtered) — the audit can check any whole-table
      invariant, at the cost of a table scan per batch.
    - ``"changes"``: the I/U/D DELTA the batch wrote — ``table_changes``
      over the branch from its fork version to the staged version, with the
      read PRUNED to ``changed_buckets`` (buckets whose file sets did not
      move are never opened). At 100 TB this is the per-batch audit shape:
      invariants like "delete fraction below X", "no nulls among written
      keys", "update rate sane" cost O(batch buckets), not O(table). An
      audit that truly needs the whole staged table opts back into
      ``"snapshot"``.

    Returns ``{published, version, branch, lineage}``:
    ``published=False`` means the audit failed, main is byte-identical to
    before, and the branch was dropped (or kept for debugging when
    ``keep_failed_branch=True`` — its name is in the result).

    Scale notes: the fork is O(1) metadata; the publish is one O(buckets)
    manifest CAS adopting the branch's sidecar references verbatim (zero
    data movement — the staged parquet files simply become main's); main
    commits that landed DURING the audit on disjoint buckets merge cleanly
    via publish_branch's rebase. Snapshot audits read only the staged
    snapshot — bucket pruning and file skipping apply as on any read."""
    if table.branch is not None:
        raise ValueError("write_audit_publish targets main, not a branch")
    if audit_on not in ("snapshot", "changes"):
        raise ValueError(f"audit_on must be 'snapshot' or 'changes': {audit_on!r}")
    name = branch_name or f"wap-{batch_id}-{uuid.uuid4().hex[:8]}"
    b = table.create_branch(name)
    fork = b.manifest()["fork_version"]
    try:
        lineage = apply_batch(spark, b, events, batch_id, **apply_kw)
        if audit_on == "changes":
            staged_v = b.current_version()
            audited = b.table_changes(
                spark, fork, staged_v,
                buckets=b.changed_buckets(fork, staged_v),
            )
        else:
            audited = b.read(spark)
        ok = bool(audit_fn(audited))
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
