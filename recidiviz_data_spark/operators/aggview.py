"""Incremental materialized AGGREGATE views over a miniberg CDC table —
classic incremental view maintenance (IVM), the missing consumer tier above
the index syncs: a persisted ``GROUP BY`` whose every sync is EXACT (no
recall debt, no stale fraction), maintained from the change feed instead of
recomputed.

Reference parity: the reference's metric/export views (SURVEY.md §2.1 S7,
§2.4 A1/A7 [U]) are recomputed per run; this module gives them the
CDC-native form — the view advances with the table.

How a sync stays exact without reading old row values:

- The snapshot differ never emits pre-images, and it does not need to here:
  buckets whose file sets did not move between the two snapshots contribute
  IDENTICALLY to both, so for the additive aggregates (count / sum — avg is
  sum/count at read) the delta is ``partial(new, changed buckets) −
  partial(old, changed buckets)``, two bucket-pruned map-side-combinable
  partial aggregations merged into the stored view by group key. Untouched
  buckets are never read; untouched groups are carried verbatim.
- min/max are not self-maintainable under delete/update (the dropped row may
  BE the extremum). The recompute set is ROW-precise: a keyed diff over the
  changed buckets finds groups that LOST a row (deleted key, or an updated
  key whose group/value moved) — only those get their min/max recomputed
  exactly, with ONE scan of the current snapshot semi-joined to that group
  set. Groups merely co-located in a touched bucket (their rows survive
  identically) and insert-only groups merge monotonically
  (``least``/``greatest``) with no recompute. That scan is the honest cost
  of exact extrema in the default ``minmax="scan"`` mode; it runs at most
  once per sync and skips entirely for insert-only batches. For metric-view
  workloads ``minmax="partials"`` removes it: a persisted per-(group,
  bucket) min/max PARTIAL TREE (partitioned by bucket, hardlink-carried
  like the distinct support) is refreshed for the changed buckets from the
  read the sync already holds, and affected groups fold their extrema from
  the partial table — update/delete syncs become fully bucket-bounded, no
  data-table scan at all.

Sums are maintained in DECIMAL(28,4) (values cast to DECIMAL(18,4) before
the first SUM): decimal add/subtract is exact, so incremental deltas never
drift from the full recompute — float sums would diverge by fold order.

Storage/lifecycle: the view is an artifact-store versioned payload
(``view/`` parquet + ``sync.json`` carrying {table_uuid, version, group_col,
value_col}) with the same contract as the band/IVF indexes — atomic CURRENT
flip, CAS'd mutating lifecycle (one sync writer; a lost CAS re-enters),
snapshot-keyed rebuilds, GC grace + reader pins.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from recidiviz_data_spark.operators.base import _qx
from recidiviz_data_spark.session import materialize

_VAL_T = "decimal(18,4)"   # cast-before-SUM type (repo exactness rule)
_SUM_T = "decimal(28,4)"   # stored running-sum type: exact +/- deltas


def agg_view_path(table, group_col: str, value_col: str) -> str:
    uid = table.manifest()["table_uuid"]
    return os.path.join(
        tempfile.gettempdir(), f"rds_aggview_{uid}_{group_col}_{value_col}"
    )


def _aggs(df, group_col: str, value_col: str):
    """The view's aggregate shape — used by full rebuilds AND by the two
    changed-bucket partials (Spark plans both with a map-side partial
    aggregate, so the shuffle carries one row per (task, group))."""
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(value_col).cast(_VAL_T)).cast(_SUM_T).alias("sum_val"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
    )


def agg_view_read(spark, path: str):
    """Current view: (group, n_rows, sum_val, min_val, max_val, avg_val).
    avg derives at read (sum/count are the maintained state). Accepts a
    resolved payload dir in place of the artifact base (pinned readers)."""
    from recidiviz_data_spark.tables import artifacts

    r = artifacts.resolve(path)
    payload = r[0] if r is not None else path
    df = spark.read.parquet(os.path.join(payload, "view"))
    return df.withColumn(
        "avg_val", F.col("sum_val").cast("double") / F.col("n_rows")
    )


def agg_view_sync(spark, table, path: str | None = None, *,
                  group_col: str, value_col: str,
                  rebuild_changed_fraction: float = 0.5,
                  minmax: str = "scan") -> dict:
    """Advance the materialized aggregate view to the table's current
    version. First call (or spec/table/mode mismatch, or a version the view
    is ahead of, or lost bucket identity) rebuilds from a full scan; after
    that every sync is incremental AND exact — see the module docstring.

    ``minmax`` selects how extrema survive deletes/updates:

    - ``"scan"`` (default): groups that lost a row get min/max recomputed
      with one scan of the current snapshot semi-joined to that group set.
      Zero extra storage; the scan is the cost (it prices like a rebuild's
      scan whenever any group lost a row).
    - ``"partials"``: the view also persists a per-(group, BUCKET) min/max
      partial tree (``minmax/`` partitioned by bucket). A sync recomputes
      partials ONLY for the changed buckets (from the changed-bucket read it
      already holds — no extra data-table scan), hardlink-carries the rest,
      and folds affected groups' extrema from the PARTIAL table instead of
      the data table. Update/delete syncs become fully bucket-bounded: the
      full data scan disappears; the fold reads the partial table, which is
      one row per (group, bucket) pair with data — use when
      group_cardinality × num_buckets ≪ row count (the usual case for
      metric views), stay on "scan" for pathological group cardinalities.

    ``rebuild_changed_fraction``: when MORE than this fraction of buckets
    moved since the last sync, rebuild instead — the incremental path costs
    two changed-bucket scans plus merges, so past roughly half the table it
    is strictly worse than the one full scan a rebuild pays (measured: a
    batch scattered over 60/64 buckets synced 3.4× SLOWER than its rebuild —
    tools/ivm_scale_bench.py). The incremental win lives where web-scale CDC
    lives: batches touching a small fraction of a large bucket count.
    Returns {action, version, groups, recomputed_groups}."""
    from recidiviz_data_spark.tables import artifacts

    if minmax not in ("scan", "partials"):
        raise ValueError(f"minmax must be 'scan' or 'partials': {minmax!r}")
    base = path or agg_view_path(table, group_col, value_col)
    cur_v = table.current_version()
    uid = table.manifest()["table_uuid"] + (
        f"@{table.branch}" if getattr(table, "branch", None) else ""
    )

    def _meta(n_groups: int) -> dict:
        return {"table_uuid": uid, "version": cur_v, "n_groups": n_groups,
                "group_col": group_col, "value_col": value_col,
                "minmax": minmax, "kind": "agg"}

    def _partials_of(df):
        return df.groupBy(group_col, table.bucket_col().alias("bucket")).agg(
            F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
        )

    def _write(stage: str, view_df, meta: dict, partials=None) -> None:
        os.makedirs(stage)
        view_df.write.parquet(os.path.join(stage, "view"))
        if partials is not None:
            _write_partitioned(partials, os.path.join(stage, "minmax"), "bucket")
        with open(os.path.join(stage, "sync.json"), "w") as f:
            json.dump(meta, f)

    def _rebuild() -> dict:
        view = materialize(_aggs(table.read(spark), group_col, value_col))
        n_groups = view.count()
        partials = (
            materialize(_partials_of(table.read(spark)))
            if minmax == "partials" else None
        )
        artifacts.ensure(
            base,
            f"miniberg:{uid}:v{cur_v}:agg:{group_col}:{value_col}:{minmax}",
            lambda stage: _write(stage, view, _meta(n_groups), partials),
        )
        return {"action": "rebuild", "version": cur_v, "groups": n_groups,
                "recomputed_groups": 0}

    # ONE resolve: the meta we plan from and the seq we CAS on must come
    # from the same pointer state (the standard sync-lifecycle rule)
    r0 = artifacts.resolve_full(base)
    meta = artifacts.sync_meta_at(r0[0]) if r0 is not None else None
    if (
        meta is None
        or meta.get("table_uuid") != uid
        or meta["version"] > cur_v
        or meta.get("group_col") != group_col
        or meta.get("value_col") != value_col
        or meta.get("minmax", "scan") != minmax
        or meta.get("kind", "agg") != "agg"  # a distinct/topk artifact at
        # this path rebuilds as an agg view instead of mis-merging its state
    ):
        return _rebuild()
    if meta["version"] == cur_v:
        return {"action": "noop", "version": cur_v,
                "groups": meta["n_groups"], "recomputed_groups": 0}
    cb = table.changed_buckets(meta["version"], cur_v)
    if cb is None:
        return _rebuild()  # bucket function changed: no stable prune identity
    if len(cb) > rebuild_changed_fraction * table.manifest(cur_v)["num_buckets"]:
        return _rebuild()  # most of the table moved: one full scan is cheaper

    g = group_col
    key = table.manifest(cur_v)["key_col"]
    view = spark.read.parquet(os.path.join(r0[0], "view"))
    zero = F.lit(0).cast(_SUM_T)
    # both changed-bucket snapshots are consumed twice (partial aggregate +
    # the keyed removal diff) — materialize each once
    o_rows = materialize(
        table.read(spark, version=meta["version"], buckets=cb)
        .select(key, g, value_col)
    )
    n_rows_df = materialize(
        table.read(spark, version=cur_v, buckets=cb).select(key, g, value_col)
    )
    old_part = _aggs(o_rows, g, value_col).select(
        g, F.col("n_rows").alias("o_n"), F.col("sum_val").alias("o_sum")
    )
    new_part = _aggs(n_rows_df, g, value_col).select(
        g, F.col("n_rows").alias("i_n"), F.col("sum_val").alias("i_sum"),
        F.col("min_val").alias("i_min"), F.col("max_val").alias("i_max"))
    # all group-key joins are NULL-SAFE: a null group is a real group under
    # GROUP BY semantics, and plain equi-joins would never match it (the
    # stored null-group row and its partials would drift apart as duplicates)
    j1 = (
        view.alias("v")
        .join(old_part.alias("o"),
              F.col(f"v.{g}").eqNullSafe(F.col(f"o.{g}")), "full_outer")
        .select(F.coalesce(f"v.{g}", f"o.{g}").alias(g),
                "v.n_rows", "v.sum_val", "v.min_val", "v.max_val",
                "o.o_n", "o.o_sum")
    )
    merged = materialize(
        j1.alias("x")
        .join(new_part.alias("i"),
              F.col(f"x.{g}").eqNullSafe(F.col(f"i.{g}")), "full_outer")
        .select(F.coalesce(f"x.{g}", f"i.{g}").alias(g),
                "x.n_rows", "x.sum_val", "x.min_val", "x.max_val",
                "x.o_n", "x.o_sum", "i.i_n", "i.i_sum", "i.i_min", "i.i_max")
        .withColumn(
            "n2",
            F.coalesce("n_rows", F.lit(0)) - F.coalesce("o_n", F.lit(0))
            + F.coalesce("i_n", F.lit(0)),
        )
        .withColumn(
            "sum2",
            F.coalesce(F.col("sum_val"), zero) - F.coalesce(F.col("o_sum"), zero)
            + F.coalesce(F.col("i_sum"), zero),
        )
        .filter(F.col("n2") > 0)  # emptied groups leave the view
    )

    # min/max recompute set: groups that LOST a row (delete, or an update
    # that changed the row's group/value) — a row-level keyed diff over the
    # changed buckets only. Pure inserts never land here (their bucket
    # neighbours' rows survive identically into the new partial), so
    # append-heavy syncs pay no recompute scan at all.
    a, b = o_rows.alias("a"), n_rows_df.alias("b")
    lost = a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"), "left_anti").select(
        F.col(f"a.{g}").alias(g)
    )
    changed_rows = (
        a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"))
        .filter(
            ~F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}"))
            | ~F.col(f"a.{value_col}").eqNullSafe(F.col(f"b.{value_col}"))
        )
        .select(F.col(f"a.{g}").alias(g))  # the OLD group lost this row
    )
    rec = lost.unionByName(changed_rows).distinct()
    n_rec = rec.count()
    new_partials = None
    if minmax == "partials":
        # partials for the changed buckets, recomputed from the changed-
        # bucket read the sync ALREADY holds — no extra data-table scan;
        # unchanged buckets' partials hardlink-carry at publish below
        new_partials = materialize(_partials_of(n_rows_df))
    if n_rec:
        if minmax == "partials":
            # fold affected groups' extrema from the PARTIAL table: carried
            # partials for unchanged buckets + the fresh changed-bucket ones
            old_partials = spark.read.parquet(os.path.join(r0[0], "minmax"))
            fold_src = old_partials.filter(
                ~F.col("bucket").isin(cb)
            ).unionByName(new_partials).alias("t")
        else:
            fold_src = table.read(spark, version=cur_v).alias("t")
        rx = (
            fold_src.join(rec.alias("r"),
                          F.col(f"t.{g}").eqNullSafe(F.col(f"r.{g}")), "left_semi")
            .groupBy(g)
        )
        if minmax == "partials":
            rx = rx.agg(F.min("mn").alias("r_min"), F.max("mx").alias("r_max"))
        else:
            rx = rx.agg(F.min(value_col).alias("r_min"),
                        F.max(value_col).alias("r_max"))
        rx = rx.withColumn("_rec", F.lit(True))
        merged = (
            merged.alias("m")
            .join(rx.alias("rx"),
                  F.col(f"m.{g}").eqNullSafe(F.col(f"rx.{g}")), "left_outer")
            .drop(F.col(f"rx.{g}"))
        )
        # _rec marks recomputed groups (r_min/r_max may be legitimately null
        # when the group's surviving values are all null)
        min_expr = F.when(F.col("_rec").isNotNull(), F.col("r_min")).otherwise(
            F.least("min_val", "i_min")
        )
        max_expr = F.when(F.col("_rec").isNotNull(), F.col("r_max")).otherwise(
            F.greatest("max_val", "i_max")
        )
    else:  # insert-only sync: pure monotone merge, no table scan at all
        min_expr = F.least("min_val", "i_min")
        max_expr = F.greatest("max_val", "i_max")

    out = materialize(
        merged.select(
            g,
            F.col("n2").cast("long").alias("n_rows"),
            F.col("sum2").cast(_SUM_T).alias("sum_val"),
            min_expr.alias("min_val"),
            max_expr.alias("max_val"),
        )
    )
    n_out = out.count()

    def _build(stage: str) -> None:
        _write(stage, out, _meta(n_out))
        if minmax == "partials":
            # carry unchanged buckets' partial partitions; write the rest
            os.makedirs(os.path.join(stage, "minmax"), exist_ok=True)
            src = os.path.join(r0[0], "minmax")
            for d in os.listdir(src):
                full = os.path.join(src, d)
                if not os.path.isdir(full):
                    continue
                if int(d.split("=", 1)[1]) not in cb:
                    artifacts.link_tree(full, os.path.join(stage, "minmax", d))
            _write_partitioned(new_partials, os.path.join(stage, "minmax"),
                               "bucket")

    try:
        artifacts.publish(base, artifacts.mutated_key(r0[1]), _build,
                          expected_seq=r0[2])
    except artifacts.ArtifactConflict:
        # a concurrent sync advanced the view: re-enter against its state
        return agg_view_sync(spark, table, path,
                             group_col=group_col, value_col=value_col,
                             rebuild_changed_fraction=rebuild_changed_fraction,
                             minmax=minmax)
    return {"action": "incremental", "version": cur_v, "groups": n_out,
            "recomputed_groups": n_rec}


def _agg_oracle_sql() -> str:
    """DuckDB oracle: the LWW fold of the deterministic generated changelog,
    aggregated per source with the view's exact column set. Single division
    for avg on both engines (exact-integer operands → bit-identical)."""
    from recidiviz_data_spark.operators.cdcops import APPLY_GEN, changelog_dir

    glob_path = os.path.join(
        changelog_dir("apply", APPLY_GEN), "batch_id=*", "part-*.parquet"
    )
    return f"""
    WITH ev AS (
      SELECT doc_id, op, n_tok, source,
             row_number() OVER (PARTITION BY doc_id ORDER BY event_seq DESC) AS rn
      FROM read_parquet('{glob_path}')
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS total_tokens,
           MIN(n_tok) AS min_tok,
           MAX(n_tok) AS max_tok,
           CAST(SUM(CAST(n_tok AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_tok
    FROM ev WHERE rn = 1 AND op <> 'D'
    GROUP BY source
    """


@_qx("x_agg_view_sync", _agg_oracle_sql())
def x_agg_view_sync(spark, sf_dir):
    """End-to-end IVM demo on the deterministic engine changelog: apply it
    batch-by-batch into the shared miniberg table (same workdir as
    ``cdc_apply_state`` — watermark makes re-application a noop) and
    ``agg_view_sync`` after EVERY batch, so the returned state was reached
    through incremental maintenance, not one final recompute. The oracle is
    the single-shot SQL LWW fold + GROUP BY — batchwise view maintenance
    must converge to exactly it."""
    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
    from recidiviz_data_spark.operators.cdcops import (
        APPLY_GEN,
        _payload_schema,
        _workdir,
        ensure_changelog,
    )
    from recidiviz_data_spark.tables.miniberg import Miniberg

    cl = ensure_changelog("apply", APPLY_GEN)
    wd = _workdir("apply", APPLY_GEN)
    troot = os.path.join(wd, "table")
    if Miniberg.exists(troot):
        table = Miniberg(troot)
    else:
        table = create_empty_table(troot, _payload_schema(), num_buckets=8)
    vpath = os.path.join(wd, "aggview_source_ntok")
    for b in range(APPLY_GEN["n_batches"]):
        apply_batches(spark, table, cl, upto=b)
        # the demo table has 8 buckets and every generated batch touches all
        # of them — disable the changed-fraction rebuild guard so the path
        # under oracle-check is the INCREMENTAL one
        agg_view_sync(spark, table, vpath, group_col="source",
                      value_col="n_tok", rebuild_changed_fraction=1.0)
    return agg_view_read(spark, vpath).select(
        "source",
        F.col("n_rows").alias("n_docs"),
        F.col("sum_val").cast("long").alias("total_tokens"),
        F.col("min_val").alias("min_tok"),
        F.col("max_val").alias("max_tok"),
        F.col("avg_val").alias("avg_tok"),
    )


# --------------------------------------------------------------------------
# COUNT(DISTINCT) views — the other non-self-maintainable aggregate, made
# exactly incremental with the classic SUPPORT MULTISET: persist per
# (group, value) multiplicities; distinct-count = live support rows per
# group. Every delta is additive at the (group, value) grain, so inserts,
# updates AND deletes maintain exactly — no recompute scan exists in this
# lifecycle at all (unlike min/max). The support table is the honest cost:
# one row per live (group, value) pair.
#
# At-scale layout: support is hash-partitioned on the group key
# (``part = pmod(xxhash64(g), DISTINCT_SUPPORT_PARTS)``); a sync rewrites
# ONLY the partitions holding changed groups and hardlink-carries the rest
# from the previous version — write cost scales with the batch's group
# footprint, not the support size. The per-group summary (``view/``) is
# maintained incrementally too: +groups whose value appeared, −values that
# dropped to multiplicity 0 (computed from the same merge, before dead
# support rows are filtered).
#
# SQL semantics: COUNT(DISTINCT x) ignores NULL values — null values never
# enter the support; a NULL GROUP is still a real group (null-safe joins,
# as in agg_view_sync).

DISTINCT_SUPPORT_PARTS = 32


def _part_of(g):
    return F.pmod(F.xxhash64(F.col(g)), F.lit(DISTINCT_SUPPORT_PARTS)).cast("int")


def distinct_view_path(table, group_col: str, value_col: str) -> str:
    uid = table.manifest()["table_uuid"]
    return os.path.join(
        tempfile.gettempdir(), f"rds_distview_{uid}_{group_col}_{value_col}"
    )


def distinct_view_read(spark, path: str):
    """Current summary: (group, n_distinct). Accepts a resolved payload dir
    (pinned readers) in place of the artifact base."""
    from recidiviz_data_spark.tables import artifacts

    r = artifacts.resolve(path)
    payload = r[0] if r is not None else path
    return spark.read.parquet(os.path.join(payload, "view"))


def distinct_view_support(spark, path: str):
    """The support multiset: (group, value, cnt, part) — one row per live
    (group, value) pair with its multiplicity."""
    from recidiviz_data_spark.tables import artifacts

    r = artifacts.resolve(path)
    payload = r[0] if r is not None else path
    return spark.read.parquet(os.path.join(payload, "support"))


def _support_of(df, g: str, v: str):
    return (
        df.filter(F.col(v).isNotNull())  # COUNT(DISTINCT) ignores nulls
        .groupBy(g, v)
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("part", _part_of(g))
    )


def _write_partitioned(df, out: str, part_col: str = "part") -> None:
    """partitionBy-append, plus the empty-table edge: a partitioned write of
    ZERO rows leaves no parquet at all (schema inference on the next read
    would fail), so an emptied table lands as one zero-row unpartitioned
    file that still carries the full schema."""
    df.write.mode("append").partitionBy(part_col).parquet(out)
    has_files = any(
        f.endswith(".parquet")
        for _r, _d, fs in os.walk(out)
        for f in fs
    )
    if not has_files:
        df.limit(0).write.mode("overwrite").parquet(out)


def distinct_view_sync(spark, table, path: str | None = None, *,
                       group_col: str, value_col: str,
                       rebuild_changed_fraction: float = 0.5) -> dict:
    """Advance the COUNT(DISTINCT value_col) view per group_col to the
    table's current version. Fully incremental and exact under I/U/D — the
    delta multiset from the changed buckets merges into the support at the
    (group, value) grain; only support partitions holding changed groups
    are rewritten (the rest hardlink-carry). ``rebuild_changed_fraction``:
    same guard as ``agg_view_sync`` — past this fraction of moved buckets
    the two delta scans cost more than the rebuild's one. Returns {action,
    version, groups, changed_parts}."""
    from recidiviz_data_spark.tables import artifacts

    base = path or distinct_view_path(table, group_col, value_col)
    cur_v = table.current_version()
    uid = table.manifest()["table_uuid"] + (
        f"@{table.branch}" if getattr(table, "branch", None) else ""
    )
    g, v = group_col, value_col

    def _meta(n_groups: int) -> dict:
        return {"table_uuid": uid, "version": cur_v, "n_groups": n_groups,
                "group_col": g, "value_col": v, "kind": "distinct"}

    def _rebuild() -> dict:
        sup = materialize(_support_of(table.read(spark), g, v))
        summary = materialize(
            sup.groupBy(g).agg(F.count("*").cast("long").alias("n_distinct"))
        )
        n_groups = summary.count()

        def _build(stage: str) -> None:
            os.makedirs(stage)
            _write_partitioned(sup, os.path.join(stage, "support"))
            summary.write.parquet(os.path.join(stage, "view"))
            with open(os.path.join(stage, "sync.json"), "w") as f:
                json.dump(_meta(n_groups), f)

        artifacts.ensure(
            base, f"miniberg:{uid}:v{cur_v}:distinct:{g}:{v}", _build
        )
        return {"action": "rebuild", "version": cur_v, "groups": n_groups,
                "changed_parts": DISTINCT_SUPPORT_PARTS}

    r0 = artifacts.resolve_full(base)
    meta = artifacts.sync_meta_at(r0[0]) if r0 is not None else None
    if (
        meta is None
        or meta.get("table_uuid") != uid
        or meta["version"] > cur_v
        or meta.get("group_col") != g
        or meta.get("value_col") != v
        or meta.get("kind") != "distinct"
    ):
        return _rebuild()
    if meta["version"] == cur_v:
        return {"action": "noop", "version": cur_v,
                "groups": meta["n_groups"], "changed_parts": 0}
    cb = table.changed_buckets(meta["version"], cur_v)
    if cb is None:
        return _rebuild()
    if len(cb) > rebuild_changed_fraction * table.manifest(cur_v)["num_buckets"]:
        return _rebuild()  # most of the table moved: one full scan is cheaper

    payload = r0[0]
    # delta multiset at the (group, value) grain: -old +new multiplicities
    o_sup = _support_of(
        table.read(spark, version=meta["version"], buckets=cb).select(g, v), g, v
    ).withColumn("cnt", -F.col("cnt"))
    n_sup = _support_of(
        table.read(spark, version=cur_v, buckets=cb).select(g, v), g, v
    )
    delta = materialize(
        o_sup.unionByName(n_sup)
        .groupBy(g, v, "part")
        .agg(F.sum("cnt").cast("long").alias("d"))
        .filter(F.col("d") != 0)
    )
    changed_parts = sorted(
        r["part"] for r in delta.select("part").distinct().collect()
    )
    if not changed_parts:  # file sets moved (compaction) but values didn't
        n_groups = meta["n_groups"]

        def _carry(stage: str) -> None:
            os.makedirs(stage)
            artifacts.link_tree(os.path.join(payload, "support"),
                                os.path.join(stage, "support"))
            artifacts.link_tree(os.path.join(payload, "view"),
                                os.path.join(stage, "view"))
            with open(os.path.join(stage, "sync.json"), "w") as f:
                json.dump(_meta(n_groups), f)

        try:
            artifacts.publish(base, artifacts.mutated_key(r0[1]), _carry,
                              expected_seq=r0[2])
        except artifacts.ArtifactConflict:
            return distinct_view_sync(
                spark, table, path, group_col=g, value_col=v,
                rebuild_changed_fraction=rebuild_changed_fraction)
        return {"action": "incremental", "version": cur_v,
                "groups": n_groups, "changed_parts": 0}

    # merge the delta into ONLY the touched support partitions (partition
    # pruning on part); keep dead rows long enough to compute the summary
    # delta (a value dropping to multiplicity 0 decrements n_distinct)
    old_sup = spark.read.parquet(os.path.join(payload, "support")).filter(
        F.col("part").isin(changed_parts)
    )
    merged = materialize(
        old_sup.alias("s")
        .join(
            delta.alias("d"),
            F.col(f"s.{g}").eqNullSafe(F.col(f"d.{g}"))
            & (F.col(f"s.{v}") == F.col(f"d.{v}")),
            "full_outer",
        )
        .select(
            F.coalesce(f"s.{g}", f"d.{g}").alias(g),
            F.coalesce(f"s.{v}", f"d.{v}").alias(v),
            (F.coalesce("s.cnt", F.lit(0)) + F.coalesce("d.d", F.lit(0)))
            .cast("long").alias("cnt"),
            F.coalesce("s.part", "d.part").alias("part"),
            F.col("s.cnt").isNotNull().alias("was_live"),
        )
    )
    new_support = merged.filter(F.col("cnt") > 0).select(g, v, "cnt", "part")
    sum_delta = (
        merged.withColumn(
            "dd",
            F.when(~F.col("was_live") & (F.col("cnt") > 0), 1)
            .when(F.col("was_live") & (F.col("cnt") <= 0), -1)
            .otherwise(0),
        )
        .groupBy(g).agg(F.sum("dd").cast("long").alias("dd"))
        .filter(F.col("dd") != 0)
    )
    old_view = spark.read.parquet(os.path.join(payload, "view"))
    new_view = materialize(
        old_view.alias("o")
        .join(sum_delta.alias("x"),
              F.col(f"o.{g}").eqNullSafe(F.col(f"x.{g}")), "full_outer")
        .select(
            F.coalesce(f"o.{g}", f"x.{g}").alias(g),
            (F.coalesce("o.n_distinct", F.lit(0)) + F.coalesce("x.dd", F.lit(0)))
            .cast("long").alias("n_distinct"),
        )
        .filter(F.col("n_distinct") > 0)
    )
    n_groups = new_view.count()

    def _build(stage: str) -> None:
        os.makedirs(os.path.join(stage, "support"))
        # hardlink-carry the untouched support partitions; rewrite the rest
        for d in os.listdir(os.path.join(payload, "support")):
            full = os.path.join(payload, "support", d)
            if not os.path.isdir(full):
                continue  # parquet _SUCCESS etc. — regenerated by the write
            k = int(d.split("=", 1)[1])
            if k not in changed_parts:
                artifacts.link_tree(full, os.path.join(stage, "support", d))
        _write_partitioned(new_support, os.path.join(stage, "support"))
        new_view.write.parquet(os.path.join(stage, "view"))
        with open(os.path.join(stage, "sync.json"), "w") as f:
            json.dump(_meta(n_groups), f)

    try:
        artifacts.publish(base, artifacts.mutated_key(r0[1]), _build,
                          expected_seq=r0[2])
    except artifacts.ArtifactConflict:
        # pass the caller's guard through the re-entry (ADVICE r7: dropping
        # it reverted a conflict retry to the 0.5 default — a caller on a
        # few-bucket table asking 1.0 silently got a full rebuild)
        return distinct_view_sync(
            spark, table, path, group_col=g, value_col=v,
            rebuild_changed_fraction=rebuild_changed_fraction,
        )
    return {"action": "incremental", "version": cur_v, "groups": n_groups,
            "changed_parts": len(changed_parts)}


def _distinct_oracle_sql() -> str:
    from recidiviz_data_spark.operators.cdcops import APPLY_GEN, changelog_dir

    glob_path = os.path.join(
        changelog_dir("apply", APPLY_GEN), "batch_id=*", "part-*.parquet"
    )
    return f"""
    WITH ev AS (
      SELECT doc_id, op, n_tok, source,
             row_number() OVER (PARTITION BY doc_id ORDER BY event_seq DESC) AS rn
      FROM read_parquet('{glob_path}')
    )
    SELECT source, CAST(COUNT(DISTINCT n_tok) AS BIGINT) AS n_distinct
    FROM ev WHERE rn = 1 AND op <> 'D'
    GROUP BY source
    """


@_qx("x_distinct_view_sync", _distinct_oracle_sql())
def x_distinct_view_sync(spark, sf_dir):
    """COUNT(DISTINCT) IVM demo on the deterministic engine changelog:
    batch-by-batch `distinct_view_sync` must converge to the single-shot
    DuckDB fold's per-source distinct n_tok count."""
    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
    from recidiviz_data_spark.operators.cdcops import (
        APPLY_GEN,
        _payload_schema,
        _workdir,
        ensure_changelog,
    )
    from recidiviz_data_spark.tables.miniberg import Miniberg

    cl = ensure_changelog("apply", APPLY_GEN)
    wd = _workdir("apply", APPLY_GEN)
    troot = os.path.join(wd, "table")
    if Miniberg.exists(troot):
        table = Miniberg(troot)
    else:
        table = create_empty_table(troot, _payload_schema(), num_buckets=8)
    vpath = os.path.join(wd, "distview_source_ntok")
    for b in range(APPLY_GEN["n_batches"]):
        apply_batches(spark, table, cl, upto=b)
        # see x_agg_view_sync: keep the incremental path under oracle-check
        distinct_view_sync(spark, table, vpath, group_col="source",
                           value_col="n_tok", rebuild_changed_fraction=1.0)
    return distinct_view_read(spark, vpath).select("source", "n_distinct")


# --------------------------------------------------------------------------
# TOP-K per group — the order-statistics member of the IVM family (additive:
# count/sum; extrema: min/max; multiset: COUNT DISTINCT; order: top-k).
# A materialized "top k rows by value per group" (the w1_topk_per_group
# shape) maintained from the change feed.
#
# The partial tree does the heavy lifting, exactly as minmax="partials":
# per (group, BUCKET) the top-k rows are persisted (at most k rows per
# group per bucket, partitioned by bucket, hardlink-carried). The global
# top-k per group is always a subset of the union of its per-bucket top-k
# (any row beating a global top-k row beats its bucket's k-th row too), so
# a sync only has to (a) recompute partials for the CHANGED buckets from
# the read it already holds, and (b) re-fold the view rows of groups whose
# changed-bucket partials differ — a delete of a top-k member refills from
# the carried partials of untouched buckets, never from the data table.
# Fully bucket-bounded, exact, no recompute scan.
#
# Ordering is (value DESC, key ASC) — the total-order tiebreak every
# ranked view needs for determinism. NULL values are excluded (their rank
# order is engine-dependent; SQL consumers filter them before ranking).

def topk_view_path(table, group_col: str, value_col: str, k: int) -> str:
    uid = table.manifest()["table_uuid"]
    return os.path.join(
        tempfile.gettempdir(), f"rds_topkview_{uid}_{group_col}_{value_col}_{k}"
    )


def topk_view_read(spark, path: str):
    """Current view: (group, rnk, <key>, <value>) — k rows per group."""
    from recidiviz_data_spark.tables import artifacts

    r = artifacts.resolve(path)
    payload = r[0] if r is not None else path
    return spark.read.parquet(os.path.join(payload, "view"))


def _topk_fold(partials, g: str, key: str, v: str, k: int):
    """Global top-k per group from per-bucket partial rows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(g).orderBy(F.col(v).desc(), F.col(key).asc())
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(g, "rnk", key, v)
    )


def topk_view_sync(spark, table, path: str | None = None, *,
                   group_col: str, value_col: str, k: int = 3,
                   rebuild_changed_fraction: float = 0.5) -> dict:
    """Advance the materialized top-k view to the table's current version.
    Incremental syncs are bucket-bounded: changed buckets' partials
    recompute from the changed-bucket read, untouched partials hardlink-
    carry, and only groups whose changed-bucket partials DIFFER re-fold
    their view rows (from the partial table, never the data table).
    Returns {action, version, groups, refolded_groups}."""
    from pyspark.sql.window import Window

    from recidiviz_data_spark.tables import artifacts

    base = path or topk_view_path(table, group_col, value_col, k)
    cur_v = table.current_version()
    uid = table.manifest()["table_uuid"] + (
        f"@{table.branch}" if getattr(table, "branch", None) else ""
    )
    g, v = group_col, value_col
    key = table.manifest(cur_v)["key_col"]

    def _meta(n_groups: int) -> dict:
        return {"table_uuid": uid, "version": cur_v, "n_groups": n_groups,
                "group_col": g, "value_col": v, "k": k, "kind": "topk"}

    def _partials_of(df):
        wb = Window.partitionBy(g, "bucket").orderBy(
            F.col(v).desc(), F.col(key).asc()
        )
        return (
            df.filter(F.col(v).isNotNull())
            .withColumn("bucket", table.bucket_col())
            .withColumn("_r", F.row_number().over(wb))
            .filter(F.col("_r") <= k)
            .select(g, key, v, "bucket")
        )

    def _write(stage: str, view_df, partials, meta: dict) -> None:
        os.makedirs(stage)
        view_df.write.parquet(os.path.join(stage, "view"))
        _write_partitioned(partials, os.path.join(stage, "parts"), "bucket")
        with open(os.path.join(stage, "sync.json"), "w") as f:
            json.dump(meta, f)

    def _rebuild() -> dict:
        partials = materialize(_partials_of(table.read(spark)))
        view = materialize(_topk_fold(partials, g, key, v, k))
        n_groups = view.select(g).distinct().count()
        artifacts.ensure(
            base, f"miniberg:{uid}:v{cur_v}:topk:{g}:{v}:{k}",
            lambda stage: _write(stage, view, partials, _meta(n_groups)),
        )
        return {"action": "rebuild", "version": cur_v, "groups": n_groups,
                "refolded_groups": 0}

    r0 = artifacts.resolve_full(base)
    meta = artifacts.sync_meta_at(r0[0]) if r0 is not None else None
    if (
        meta is None
        or meta.get("table_uuid") != uid
        or meta["version"] > cur_v
        or meta.get("group_col") != g
        or meta.get("value_col") != v
        or meta.get("k") != k
        or meta.get("kind") != "topk"
    ):
        return _rebuild()
    if meta["version"] == cur_v:
        return {"action": "noop", "version": cur_v,
                "groups": meta["n_groups"], "refolded_groups": 0}
    cb = table.changed_buckets(meta["version"], cur_v)
    if cb is None:
        return _rebuild()
    if len(cb) > rebuild_changed_fraction * table.manifest(cur_v)["num_buckets"]:
        return _rebuild()

    payload = r0[0]
    new_partials = materialize(_partials_of(
        table.read(spark, version=cur_v, buckets=cb).select(key, g, v)
    ))
    old_partials = spark.read.parquet(os.path.join(payload, "parts"))
    old_cb = old_partials.filter(F.col("bucket").isin(cb))
    # groups whose changed-bucket partials DIFFER: only these can have a
    # different global top-k (rows outside the bucket top-k can't displace
    # view rows — they don't even displace their bucket's k-th row)
    cols = [g, key, v, "bucket"]
    diff_g = (
        old_cb.select(*cols).exceptAll(new_partials.select(*cols))
        .unionByName(new_partials.select(*cols).exceptAll(old_cb.select(*cols)))
        .select(g).distinct()
    )
    n_ref = diff_g.count()
    old_view = spark.read.parquet(os.path.join(payload, "view"))
    if n_ref == 0:
        out = old_view
    else:
        all_partials = old_partials.filter(
            ~F.col("bucket").isin(cb)
        ).unionByName(new_partials)
        refolded = _topk_fold(
            all_partials.alias("p").join(
                diff_g.alias("d"),
                F.col(f"p.{g}").eqNullSafe(F.col(f"d.{g}")), "left_semi"),
            g, key, v, k,
        )
        kept = old_view.alias("o").join(
            diff_g.alias("d"),
            F.col(f"o.{g}").eqNullSafe(F.col(f"d.{g}")), "left_anti")
        out = kept.unionByName(refolded)
    out = materialize(out)
    n_groups = out.select(g).distinct().count()

    def _build(stage: str) -> None:
        os.makedirs(stage)
        out.write.parquet(os.path.join(stage, "view"))
        os.makedirs(os.path.join(stage, "parts"), exist_ok=True)
        src = os.path.join(payload, "parts")
        for d in os.listdir(src):
            full = os.path.join(src, d)
            if not os.path.isdir(full):
                continue
            if int(d.split("=", 1)[1]) not in cb:
                artifacts.link_tree(full, os.path.join(stage, "parts", d))
        _write_partitioned(new_partials, os.path.join(stage, "parts"), "bucket")
        with open(os.path.join(stage, "sync.json"), "w") as f:
            json.dump(_meta(n_groups), f)

    try:
        artifacts.publish(base, artifacts.mutated_key(r0[1]), _build,
                          expected_seq=r0[2])
    except artifacts.ArtifactConflict:
        return topk_view_sync(spark, table, path, group_col=g, value_col=v,
                              k=k,
                              rebuild_changed_fraction=rebuild_changed_fraction)
    return {"action": "incremental", "version": cur_v, "groups": n_groups,
            "refolded_groups": n_ref}


def _topk_oracle_sql() -> str:
    from recidiviz_data_spark.operators.cdcops import APPLY_GEN, changelog_dir

    glob_path = os.path.join(
        changelog_dir("apply", APPLY_GEN), "batch_id=*", "part-*.parquet"
    )
    return f"""
    WITH ev AS (
      SELECT doc_id, op, n_tok, source,
             row_number() OVER (PARTITION BY doc_id ORDER BY event_seq DESC) AS rn
      FROM read_parquet('{glob_path}')
    ),
    live AS (SELECT doc_id, source, n_tok FROM ev
             WHERE rn = 1 AND op <> 'D' AND n_tok IS NOT NULL)
    SELECT source, rnk, doc_id, n_tok FROM (
      SELECT source, doc_id, n_tok,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_tok DESC, doc_id) AS rnk
      FROM live)
    WHERE rnk <= 3
    """


@_qx("x_topk_view_sync", _topk_oracle_sql())
def x_topk_view_sync(spark, sf_dir):
    """Top-k IVM demo on the deterministic engine changelog: batch-by-batch
    `topk_view_sync` must converge to the single-shot ranked fold (top-3
    docs per source by n_tok, doc_id tiebreak)."""
    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
    from recidiviz_data_spark.operators.cdcops import (
        APPLY_GEN,
        _payload_schema,
        _workdir,
        ensure_changelog,
    )
    from recidiviz_data_spark.tables.miniberg import Miniberg

    cl = ensure_changelog("apply", APPLY_GEN)
    wd = _workdir("apply", APPLY_GEN)
    troot = os.path.join(wd, "table")
    if Miniberg.exists(troot):
        table = Miniberg(troot)
    else:
        table = create_empty_table(troot, _payload_schema(), num_buckets=8)
    vpath = os.path.join(wd, "topkview_source_ntok")
    for b in range(APPLY_GEN["n_batches"]):
        apply_batches(spark, table, cl, upto=b)
        # 8-bucket demo table, every batch touches all buckets: keep the
        # incremental path under oracle-check (see x_agg_view_sync)
        topk_view_sync(spark, table, vpath, group_col="source",
                       value_col="n_tok", k=3, rebuild_changed_fraction=1.0)
    return topk_view_read(spark, vpath).select(
        "source", "rnk", "doc_id", F.col("n_tok"))
