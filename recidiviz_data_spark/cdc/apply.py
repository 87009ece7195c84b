"""The CDC apply path: changelog batch -> LWW dedup -> bucket-pruned
copy-on-write MERGE -> atomic snapshot commit (SURVEY.md §3.1 "ours", §4.3).

This is the Spark-first re-expression of the reference's per-scrape-session
persistence transaction (entity match -> compare -> write master + history
rows -> COMMIT; see SURVEY.md §3.1 entry point A):

  reference ``persistence/entity_matching.py`` (match on external key)
      -> equi-join on doc_id (J1)
  reference ``update_historical_snapshots.py`` (compare, close/open snapshot)
      -> LWW winner classification (applied / deleted / stale)
  reference single-DB-transaction commit
      -> miniberg atomic manifest commit, idempotent on batch_id

Scale design (10^10 events / 1000 executors):
- ONE wide shuffle per batch: the LWW dedup keyed on (bucket, doc_id).
  Default strategy ``agg`` = ``max(struct(event_seq, op, payload))`` — partial
  aggregation (map-side combine) collapses duplicates/hot keys before the
  shuffle, so Zipf skew never concentrates raw events on one reducer.
  ``window`` (the spec-named row_number form) and ``salted_window``
  (two-phase: per-salt partial row_number, then global) are provided and
  tested equivalent; see bench for the comparison.
- Target I/O is bucket-pruned: only manifest files whose bucket intersects
  the batch's buckets are read/rewritten (Iceberg COW MERGE re-expressed).
- The decision pass reads ONLY (doc_id, _seq) from the target — column
  pruning reaches the parquet scan.
- The rewrite pass anti-joins the (small) changed-doc set against the target;
  AQE turns that into a broadcast join — target payload streams through
  UNSHUFFLED (its files are bucket-pure); only the winner rows re-shuffle for
  bucket placement. ``compact='auto'`` folds a full per-bucket re-bucketing
  into the commit once a bucket accumulates too many files (compaction rides
  along with a normal write instead of being a separate job).
- Winners are persisted (MEMORY_AND_DISK) — they are one row per doc touched,
  orders of magnitude smaller than the raw event stream.
- The batch is scanned ONCE: the agg dedup fuses LWW winner selection with
  the per-bucket input metrics (struct-max with map-side combine).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from recidiviz_data_spark.functions.tokens import normalize_tokens_native
from recidiviz_data_spark.sources.changelog import (
    list_batches,
    payload_columns,
    read_batch,
    read_range,
)
from recidiviz_data_spark.tables.miniberg import (
    Miniberg,
    _type_from_json,
    align_to_schema as _align,
    keys_from_entries,
)

BUCKET = "_bucket"
SEQ = "_seq"
DELETED = "_deleted"

# decision-read pruning ("auto"): collecting the batch's distinct buckets
# costs one extra Spark job; only pay it when the target is big enough that
# an unpruned 2-column (doc_id, _seq) scan would cost more than the job
# round-trip. At lake scale this always prunes; small tables skip the job.
DECISION_PRUNE_MIN_BYTES = 1 << 30


class InvalidBatchError(Exception):
    """Batch rejected by the invalid-event threshold gate (no commit)."""


# --------------------------------------------------------------------- dedup
def dedup_lww(
    valid: DataFrame,
    payload_cols: list[str],
    *,
    strategy: str = "agg",
    salt_partitions: int = 16,
) -> DataFrame:
    """One winner row per doc_id: the max-event_seq event (LWW).

    agg           groupBy(bucket, doc_id).max(struct(event_seq, op, payload)) —
                  partial agg absorbs skew map-side; the shuffle moves ≤1 row
                  per (doc, partition).
    window        row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC)=1
                  (the BASELINE.json-named form); full event shuffle + sort.
    salted_window two-phase window for hot keys: partition (doc_id, salt)
                  first, then (doc_id) over the ≤salt_partitions survivors.
    """
    cols = [BUCKET, "doc_id", "event_seq", "op", *payload_cols]
    # total-order tiebreak for the row_number strategies, mirroring the agg
    # strategy's max(struct(event_seq, op, *payload)) lexicographic order
    # (struct-max treats a null field as lowest; DESC NULLS LAST matches).
    # The generator only emits bit-identical duplicate (doc_id, event_seq)
    # events, but LWW must not DEPEND on that — distinct same-seq payloads
    # (e.g. two differ outputs sharing a snapshot_seq) need a deterministic,
    # strategy-independent winner.
    tiebreak = [
        F.desc("event_seq"),
        F.desc_nulls_last("op"),
        *[F.desc_nulls_last(c) for c in payload_cols],
    ]
    if strategy == "agg":
        # struct-max, NOT max_by: max_by's tie resolution on equal event_seq
        # depends on physical row/partition order, so two distinct payloads
        # sharing (doc_id, event_seq) could pick different winners between
        # bootstrap replay and incremental apply. max(struct(...)) is a
        # lexicographic total order — same tiebreak as the window strategies
        # and _dedup_agg_fused.
        w = F.struct("event_seq", "op", *payload_cols)
        g = valid.groupBy(BUCKET, "doc_id").agg(F.max(w).alias("_w"))
        return g.select(BUCKET, "doc_id", "_w.*")
    if strategy == "window":
        w = Window.partitionBy("doc_id").orderBy(*tiebreak)
        return (
            valid.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*cols)
        )
    if strategy == "salted_window":
        salt = F.pmod(F.xxhash64("event_seq"), F.lit(salt_partitions))
        w1 = Window.partitionBy("doc_id", "_salt").orderBy(*tiebreak)
        partial = (
            valid.withColumn("_salt", salt)
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
        )
        w2 = Window.partitionBy("doc_id").orderBy(*tiebreak)
        return (
            partial.withColumn("_rn2", F.row_number().over(w2))
            .filter(F.col("_rn2") == 1)
            .select(*cols)
        )
    raise ValueError(f"unknown dedup strategy {strategy!r}")


# ------------------------------------------------------------------ helpers
def _validity(df: DataFrame) -> F.Column:
    """An event is valid iff op∈{I,U,D} and non-deletes carry a consistent
    payload (the reference's ingest-validator analog, SURVEY.md §2.2 P4)."""
    op_ok = F.col("op").isin("I", "U", "D")
    payload_ok = F.when(
        F.col("op") == "D", F.lit(True)
    ).otherwise(
        F.col("doc_id").isNotNull()
        & F.col("tokens").isNotNull()
        & (F.col("n_tok").cast("long") == F.size("tokens").cast("long"))
    )
    return op_ok & F.col("doc_id").isNotNull() & payload_ok


# -------------------------------------------------------------------- apply
def _dedup_agg_fused(raw: DataFrame, payload_cols: list[str]) -> DataFrame:
    """ONE scan of the batch: per-(bucket, doc) LWW winner AND input metrics.

    Winner = max over valid events of struct(event_seq, op, payload) — struct
    ordering is lexicographic, so max event_seq wins and ties (exact duplicate
    events) break deterministically on identical payload. max() ignores nulls,
    so invalid events never win; a doc with only invalid events keeps
    event_seq NULL (metrics-only row, excluded from the merge).
    Partial aggregation (map-side combine) collapses hot keys per partition
    BEFORE the shuffle — this is the skew story at 10^10 events.
    """
    w = F.struct("event_seq", "op", *payload_cols)
    g = raw.groupBy(BUCKET, "doc_id").agg(
        F.max(F.when(F.col("_valid"), w)).alias("_w"),
        F.count("*").alias("_n_events"),
        F.sum(F.when(F.col("_valid"), 0).otherwise(1)).alias("_n_invalid"),
    )
    return g.select(BUCKET, "doc_id", "_n_events", "_n_invalid", "_w.*")


def _dedup_argmax_fused(raw: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Bandwidth-lean LWW: the heavy token payload NEVER rides the wide
    shuffle.

    Pass 1 aggregates only (bucket, doc_id) -> max valid event_seq + metrics —
    a pure-long HashAggregate whose shuffle moves ~24 bytes per doc.
    Pass 2 re-scans the batch and inner-joins it against that key set on
    (doc_id, event_seq): only WINNER rows survive (AQE broadcasts the key set
    when it fits, so the payload is filtered in place, not shuffled); exact
    duplicate copies of a winner collapse via a winner-sized group-by.

    Trade vs ``agg``: one extra scan of the batch (cheap on cached/columnar
    storage) for ~an-order-of-magnitude less shuffle traffic whenever events
    per doc > 1. Same fused metrics contract as _dedup_agg_fused.
    """
    keys = raw.groupBy(BUCKET, "doc_id").agg(
        F.max(F.when(F.col("_valid"), F.col("event_seq"))).alias("event_seq"),
        F.count("*").alias("_n_events"),
        F.sum(F.when(F.col("_valid"), 0).otherwise(1)).alias("_n_invalid"),
    )
    wrows = (
        # join only VALID rows back: an invalid event sharing the winner's
        # (doc_id, event_seq) must never supply the applied payload
        raw.filter("_valid")
        .join(keys.select("doc_id", "event_seq"), ["doc_id", "event_seq"], "inner")
        .groupBy("doc_id", "event_seq")
        .agg(F.max(F.struct("op", *payload_cols)).alias("_w"))
    )
    return keys.join(wrows, ["doc_id", "event_seq"], "left").select(
        BUCKET, "doc_id", "_n_events", "_n_invalid", "event_seq", "_w.*"
    )


def apply_batch(
    spark: SparkSession,
    table: Miniberg,
    batch_df: DataFrame,
    batch_id: int,
    *,
    dedup_strategy: str = "agg",
    salt_partitions: int = 16,
    normalize: bool = True,
    compact: str | bool = "auto",
    compact_files_per_bucket: int = 4,
    cache: bool = True,
    max_invalid_ratio: float | None = None,
    commit_props: dict | None = None,
    decision_prune: bool | str = "auto",
    mor: bool | str = "auto",
    mor_max_changed_fraction: float = 0.05,
    bloom_ndv: int | str | None = None,
) -> list[dict]:
    """MERGE one changelog batch into the table. Exactly-once: a batch_id at
    or below the committed watermark is a no-op. Returns lineage rows.

    Per batch this runs ONE wide shuffle over the events (the LWW dedup; the
    upsert rows are re-shuffled once more, but that set is winners-only), two
    target reads (a 2-column decision read + the rewrite read — both
    bucket-pruned, the decision read adaptively per ``decision_prune``),
    and one partitioned write. ``compact='auto'`` re-buckets the whole rewrite
    only when a bucket's file count exceeds ``compact_files_per_bucket``,
    otherwise target rows stream through the broadcast anti-join unshuffled.
    ``mor`` ('auto'/True/False) writes merge-on-read DELTA files instead of
    rewriting buckets whose changed fraction is below
    ``mor_max_changed_fraction`` — the write-amplification fix for dribble
    batches at lake scale; auto-compaction bounds delta depth.

    Driver-synchronous work is kept to the minimum: 2 collect jobs + 1 write
    per batch on the common path (metrics/changed-bucket selection share one
    aggregation; the decision-prune job is skipped below
    ``DECISION_PRUNE_MIN_BYTES``) — the serial term that bounds scaling at
    high executor counts.
    """
    t0 = time.monotonic()
    m = table.manifest()
    if batch_id <= m["last_applied_batch"]:
        return []  # idempotent replay

    num_buckets = m["num_buckets"]
    # the merge logic (joins, changed-doc sets, validity) is written against
    # the changelog's fixed key column name; a table created with a different
    # key_col would silently bucket/prune inconsistently with maintenance ops
    # (which honor key_col) — refuse instead
    if m.get("key_col", "doc_id") != "doc_id":
        raise ValueError(
            f"apply_batch merges on 'doc_id' but table key_col={m['key_col']!r}"
        )
    bucket_expr = F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")
    payload_cols = [c for c in payload_columns(batch_df) if c != "doc_id"]
    clashes = [c for c in batch_df.columns if c.startswith("_")]
    if clashes:
        raise ValueError(
            f"changelog columns {clashes} collide with the engine's internal "
            "underscore-prefixed columns (_seq/_deleted/_bucket/...)"
        )
    raw = batch_df.withColumn(BUCKET, bucket_expr).withColumn(
        "_valid", _validity(batch_df)
    )

    # ---- schema evolution: table schema grows to cover this batch's payload
    batch_payload_schema = T.StructType(
        [f for f in batch_df.schema.fields if f.name in {"doc_id", *payload_cols}]
        + [T.StructField(SEQ, T.LongType(), True), T.StructField(DELETED, T.BooleanType(), True)]
    )
    new_fields, schema_changed = table.evolve_schema(batch_payload_schema)
    target_schema = T.StructType(
        [
            T.StructField(f["name"], _type_from_json(f["type"]), f["nullable"])
            for f in new_fields["fields"]
        ]
    )

    # ---- pass 1: LWW winners (+ fused input metrics on the agg paths)
    if dedup_strategy == "agg":
        winners = _dedup_agg_fused(raw, payload_cols)
    elif dedup_strategy == "argmax":
        winners = _dedup_argmax_fused(raw, payload_cols)
    else:
        in_metrics_df = raw.groupBy(BUCKET).agg(
            F.count("*").alias("_n_events"),
            F.sum(F.when(F.col("_valid"), 0).otherwise(1)).alias("_n_invalid"),
        )
        in_rows = {r[BUCKET]: r for r in in_metrics_df.collect()}
        winners = dedup_lww(
            raw.filter("_valid").drop("_valid"),
            payload_cols,
            strategy=dedup_strategy,
            salt_partitions=salt_partitions,
        ).withColumn("_n_events", F.lit(None).cast("long")).withColumn(
            "_n_invalid", F.lit(None).cast("long")
        )
    if normalize:
        winners = normalize_tokens_native(winners)  # winners only — cheap

    # buckets any winner touches: prunes the DECISION read (stale checks need
    # the target's _seq for every winner doc). The rewrite prunes further, to
    # buckets with actual changes. Empty table -> nothing to prune, skip the
    # extra job entirely (bootstrap/first-batch fast path). On a small target
    # ("auto" below DECISION_PRUNE_MIN_BYTES) the distinct-bucket collect job
    # costs more than the unpruned 2-column scan it would save — skip it.
    # O(buckets) summaries — the two-level manifest means the driver never
    # parses the file list on the apply path (reads load only touched
    # buckets' sidecars)
    bucket_summ = table.bucket_summaries(m)
    total_target_bytes = sum(s.get("bytes", 0) for s in bucket_summ.values())
    prune = decision_prune is True or (
        decision_prune == "auto" and total_target_bytes >= DECISION_PRUNE_MIN_BYTES
    )
    persisted: list[DataFrame] = []
    try:
        if not bucket_summ:
            affected: list[int] | None = []
        elif prune:
            # pruning gives winners TWO consumers (this collect + the decision
            # join) — persist; the unpruned path consumes winners exactly once
            # (inside the decisions persist), so caching them would be waste
            if cache:
                winners = winners.persist(StorageLevel.MEMORY_AND_DISK)
                persisted.append(winners)
            affected = sorted(
                (r[BUCKET] for r in winners.select(BUCKET).distinct().collect()),
                key=lambda b: (b is None, b),
            )
        else:
            affected = None  # decision read covers all buckets

        # ---- pass 2: decisions — winners vs target (doc_id, _seq) ONLY.
        # Bootstrap fast path: an empty table means no row can be stale —
        # skip the join (and its AQE stages) entirely.
        if not bucket_summ:
            matched = winners.withColumn("_t_seq", F.lit(None).cast("long"))
        else:
            target_min = (
                table.read(spark, buckets=affected, include_internal=True)
                .select("doc_id", F.col(SEQ).alias("_t_seq"))
            )
            matched = winners.join(target_min, "doc_id", "left")
        # staleness compares against the row's _seq watermark, INCLUDING
        # tombstone rows — that is why deletes must leave a tombstone: a stale
        # update that arrives after a delete would otherwise resurrect the doc.
        cls = (
            F.when(F.col("event_seq").isNull(), F.lit("invalid_only"))
            .when(
                F.col("_t_seq").isNotNull() & (F.col("event_seq") <= F.col("_t_seq")),
                F.lit("stale"),
            )
            .when(F.col("op") == "D", F.lit("deleted"))
            .otherwise(F.lit("applied"))
        )
        decisions = matched.withColumn("_cls", cls)
        if cache:
            decisions = decisions.persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(decisions)
        dec_metrics = {
            r[BUCKET]: r.asDict()
            for r in decisions.groupBy(BUCKET)
            .agg(
                F.sum("_n_events").alias("events_in"),
                F.sum("_n_invalid").alias("invalid"),
                F.count(F.col("event_seq")).alias("winners"),
                F.sum(F.when(F.col("_cls") == "applied", 1).otherwise(0)).alias("applied"),
                F.sum(F.when(F.col("_cls") == "deleted", 1).otherwise(0)).alias("deleted"),
                F.sum(F.when(F.col("_cls") == "stale", 1).otherwise(0)).alias("stale_winners"),
                # brand-new keys this batch: winners whose doc has NO row in
                # the target (tombstones count as rows) — feeds the exact
                # per-bucket logical key count stamped into the manifest
                # (winners are LWW-unique per doc, so count = distinct docs)
                F.sum(
                    F.when(
                        F.col("_t_seq").isNull()
                        & F.col("_cls").isin("applied", "deleted"),
                        1,
                    ).otherwise(0)
                ).alias("new_keys"),
            )
            .collect()
        }
        if dedup_strategy not in ("agg", "argmax"):
            # window paths carry metrics in a separate raw-side pass; buckets
            # whose events were ALL invalid have no winner rows, so add them
            # here too — otherwise their invalid counts vanish and the gate
            # undercounts
            for b, ir in in_rows.items():
                d = dec_metrics.setdefault(
                    b, {"winners": 0, "applied": 0, "deleted": 0, "stale_winners": 0}
                )
                d["events_in"] = ir["_n_events"]
                d["invalid"] = ir["_n_invalid"]

        # error-threshold gate (the reference aborts the persistence write when
        # the scrape's error rate is too high — SURVEY.md §4.1): too many
        # invalid events means the upstream is broken; abort BEFORE any file is
        # written, leaving the table untouched (no commit, watermark unchanged).
        if max_invalid_ratio is not None:
            tot = sum((r["events_in"] or 0) for r in dec_metrics.values())
            bad = sum((r["invalid"] or 0) for r in dec_metrics.values())
            if tot and bad / tot > max_invalid_ratio:
                raise InvalidBatchError(
                    f"batch {batch_id}: invalid ratio {bad}/{tot} exceeds "
                    f"{max_invalid_ratio}; aborting before write"
                )

        n_changed = sum(
            (r["applied"] or 0) + (r["deleted"] or 0) for r in dec_metrics.values()
        )

        added: list[dict] = []
        changed_buckets: set[int] = set()
        cow_buckets: set[int] = set()
        mor_buckets: set[int] = set()
        inexact_keys: set[int] = set()
        if n_changed:
            # ---- pass 3: copy-on-write rewrite — ONLY buckets that actually
            # changed (a stale-heavy replay batch may touch every bucket with
            # winners yet change none of them; rewriting those would be pure
            # write amplification). The changed-bucket set falls out of the
            # per-bucket metrics already collected — no extra Spark job.
            changed = decisions.filter(F.col("_cls").isin("applied", "deleted"))
            changed_per_bucket = {
                b: (r.get("applied") or 0) + (r.get("deleted") or 0)
                for b, r in dec_metrics.items()
            }
            changed_buckets = {b for b, n in changed_per_bucket.items() if n > 0}
            files_per_bucket = {b: s["n_files"] for b, s in bucket_summ.items()}
            need_compact = compact is True or (
                compact == "auto"
                and any(
                    files_per_bucket.get(b, 0) >= compact_files_per_bucket
                    for b in changed_buckets
                )
            )
            # ---- merge-on-read: buckets whose changed-row fraction is below
            # the threshold get a DELTA file (winner rows only) instead of a
            # copy-on-write rewrite — at 100 TB a 0.1%-dribble batch then
            # writes ~0.1% of the bytes COW would, and the bucket's base
            # files are not even read for rewrite. Reads resolve deltas via
            # a broadcast anti-join (miniberg._read_files); auto-compaction
            # (file count >= compact_files_per_bucket) folds them back into
            # base files, bounding delta depth. A compacting batch writes
            # everything COW (the rewrite is already full-bucket).
            # exact logical size per changed bucket (distinct doc_ids incl.
            # tombstones): the manifest's `keys` stamp when present — exact
            # even with merge-on-read deltas that added new keys — else
            # BASE-file rows (pre-stamp tables; exact when the bucket has no
            # deltas, under-counts delta-added keys — the drift the stamp
            # fixes). The fallback needs those buckets' sidecars: O(changed
            # buckets) metadata the rewrite read loads anyway. Feeds BOTH the
            # merge-on-read threshold denominator and the `keys` stamp this
            # commit writes (keys_before + brand-new winners).
            logical_rows: dict[int, int] = {}
            need_scan: list[int] = []
            for b in changed_buckets:
                s = bucket_summ.get(b, {})
                if s.get("keys") is not None:
                    logical_rows[b] = s["keys"]
                elif s.get("rows"):
                    need_scan.append(b)
            for e in table.files(buckets=need_scan, manifest=m) if need_scan else []:
                if e.get("kind") != "delta":
                    logical_rows[e["bucket"]] = (
                        logical_rows.get(e["bucket"], 0) + e.get("rows", 0)
                    )
                else:
                    # unstamped bucket WITH deltas: base rows under-count any
                    # delta-added keys, so the count is a lower bound — usable
                    # as a threshold denominator, never re-stamped as exact
                    inexact_keys.add(e["bucket"])
            if mor and not need_compact:
                for b in changed_buckets:
                    if not logical_rows.get(b):
                        continue  # no base rows: the "delta" would be the base
                    if mor is True or (
                        changed_per_bucket[b]
                        <= mor_max_changed_fraction * logical_rows[b]
                    ):
                        mor_buckets.add(b)
            cow_buckets = changed_buckets - mor_buckets
            changed_docs = changed.select("doc_id")
            target_full = _align(
                table.read(spark, buckets=sorted(cow_buckets), include_internal=True),
                target_schema,
            )
            kept = target_full.join(changed_docs, "doc_id", "left_anti").withColumn(
                BUCKET, bucket_expr
            )
            # applied -> live row; deleted -> tombstone (payload nulled, _seq kept)
            tombstoned = changed
            for c in payload_cols:
                tombstoned = tombstoned.withColumn(
                    c, F.when(F.col("_cls") == "deleted", F.lit(None)).otherwise(F.col(c))
                )
            upserts = _align(
                tombstoned.withColumn(SEQ, F.col("event_seq")).withColumn(
                    DELETED, F.col("_cls") == "deleted"
                ),
                target_schema,
            ).withColumn(BUCKET, bucket_expr)

            n_out = max(len(changed_buckets), 1)
            if need_compact:
                # full re-bucket: one file per bucket after this commit
                rewrite = kept.unionByName(upserts).repartition(n_out, BUCKET)
            else:
                # cheap path: target rows stream through the broadcast anti-join
                # unshuffled (their files are bucket-pure); only winners shuffle
                rewrite = kept.unionByName(upserts.repartition(n_out, BUCKET))
            staging = table.staging_dir()
            writer = rewrite.write
            if bloom_ndv == "auto":
                # size the filter from metadata already in hand: the largest
                # output file holds at most (bucket's current rows + its
                # applied winners) keys — parquet blooms must be configured
                # BEFORE the write, so this manifest-summary estimate stands
                # in for the exact footer counts (an over-sized bloom only
                # costs ~1.2 bytes/key; an under-sized one loses precision).
                # Floor keeps degenerate demo batches from a useless filter.
                bloom_ndv = max(
                    1024,
                    max(
                        (
                            bucket_summ.get(b, {}).get("rows", 0)
                            + changed_per_bucket.get(b, 0)
                            for b in changed_buckets
                        ),
                        default=0,
                    ),
                )
            if bloom_ndv:
                # parquet-native bloom filter on the key column — row-group
                # skipping for point lookups whose key falls inside a file's
                # wide min/max range (hash-distributed keys overlap ranges on
                # uncompacted buckets). Off by default: a bloom sized for
                # ``bloom_ndv`` distinct keys costs ~1.2 bytes/key per file,
                # which only pays once files carry ~10^5+ rows (the lake
                # shape, not the demo shape). ``'auto'`` sizes ndv from the
                # per-bucket row counts above; an int overrides.
                writer = writer.option(
                    "parquet.bloom.filter.enabled#doc_id", "true"
                ).option("parquet.bloom.filter.expected.ndv#doc_id", str(bloom_ndv))
            writer.partitionBy(BUCKET).parquet(staging)
            schema_id = m["schema_id"] + (1 if schema_changed else 0)
            added = table.collect_staged_files(staging, schema_id)
            for e in added:
                if e["bucket"] in mor_buckets:
                    e["kind"] = "delta"

        # ---- lineage rows (FIXTURES.md §A5 reconciliation invariant)
        wall_ms = int((time.monotonic() - t0) * 1000)
        lineage = []
        for b in sorted(dec_metrics, key=lambda x: (x is None, x)):
            r = dec_metrics[b]
            g = lambda k: r.get(k) or 0
            losers = g("events_in") - g("invalid") - g("winners")
            row = {
                "batch_id": batch_id,
                "bucket": b,
                "events_in": int(g("events_in")),
                "applied": int(g("applied")),
                "deleted": int(g("deleted")),
                "skipped_stale": int(g("stale_winners") + losers),
                "invalid": int(g("invalid")),
                "wall_ms": wall_ms,
            }
            if b in changed_buckets:  # write-mode observability (delta depth
                row["write_mode"] = "mor" if b in mor_buckets else "cow"  # audits)
            lineage.append(row)

        # exact logical key count after this batch: keys_before (stamped or
        # derived above) + brand-new winners. A bucket whose keys_before was
        # only a lower bound (unstamped + existing deltas) is NOT stamped —
        # it becomes exact again at its next compaction, which stamps rows
        # (= keys, one row per key by construction).
        bucket_keys = {
            b: logical_rows.get(b, 0) + int(dec_metrics[b].get("new_keys") or 0)
            for b in changed_buckets
            if b not in inexact_keys
        }
        table.commit(
            added_files=added,
            # MOR buckets are NOT replaced: their delta entries append into
            # the carried sidecar; only copy-on-write buckets swap wholesale
            replaced_buckets=cow_buckets,
            schema_fields=new_fields if schema_changed else None,
            last_applied_batch=batch_id,
            lineage_rows=lineage,
            expected_parent=m["version"],
            props=commit_props,
            bucket_keys=bucket_keys or None,
        )
    finally:
        # unpersist on EVERY exit path (success, gate abort, write failure,
        # commit conflict) — a leaked persist lives for the session lifetime
        for df in persisted:
            df.unpersist()
    return lineage


def apply_batches(
    spark: SparkSession,
    table: Miniberg,
    changelog_dir: str,
    *,
    upto: int | None = None,
    **kw,
) -> list[dict]:
    """Tail the changelog: apply every batch above the committed watermark
    (checkpoint resume = just call this again; the manifest remembers)."""
    lineage: list[dict] = []
    watermark = table.manifest()["last_applied_batch"]
    for b in list_batches(changelog_dir):
        if b <= watermark or (upto is not None and b > upto):
            continue
        lineage.extend(
            apply_batch(spark, table, read_batch(spark, changelog_dir, b), b, **kw)
        )
    return lineage


def apply_full_log(
    spark: SparkSession,
    table_root: str,
    changelog_dir: str,
    *,
    num_buckets: int = 16,
    dedup_strategy: str = "agg",
    normalize: bool = True,
) -> Miniberg:
    """M1 naive replay: the whole log in one commit (bulk-bootstrap path —
    equivalent final state to batch-by-batch apply; used as the baseline)."""
    log = read_range(spark, changelog_dir, normalize=True)
    payload_cols = [c for c in payload_columns(log) if c != "doc_id"]
    raw = log.withColumn(
        BUCKET, F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")
    )
    valid = raw.filter(_validity(log))
    if normalize:
        valid = normalize_tokens_native(valid)
    winners = dedup_lww(valid, payload_cols, strategy=dedup_strategy)
    # keep delete winners as tombstones (payload nulled) so later incremental
    # applies on top of this table stay stale-safe
    final = winners.withColumn(SEQ, F.col("event_seq")).withColumn(
        DELETED, F.col("op") == "D"
    )
    for c in payload_cols:
        final = final.withColumn(
            c, F.when(F.col(DELETED), F.lit(None)).otherwise(F.col(c))
        )

    schema = T.StructType(
        [f for f in log.schema.fields if f.name in {"doc_id", *payload_cols}]
        + [T.StructField(SEQ, T.LongType(), True), T.StructField(DELETED, T.BooleanType(), True)]
    )
    table = Miniberg.create(table_root, schema, num_buckets=num_buckets)
    staging = table.staging_dir()
    out = _align(final, table.spark_schema()).withColumn(
        BUCKET, F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")
    )
    out.repartition(num_buckets, BUCKET).write.partitionBy(BUCKET).parquet(staging)
    added = table.collect_staged_files(staging, table.manifest()["schema_id"])
    last = max(list_batches(changelog_dir))
    table.commit(added_files=added, replaced_buckets=set(range(num_buckets)),
                 last_applied_batch=last, bucket_keys=keys_from_entries(added))
    return table


def create_empty_table(
    root: str,
    payload_schema: T.StructType,
    *,
    num_buckets: int = 16,
) -> Miniberg:
    """Create an empty target table whose schema is the payload + the internal
    ``_seq`` (per-row staleness watermark) and ``_deleted`` (tombstone flag)
    columns the merge relies on."""
    schema = T.StructType(
        list(payload_schema.fields)
        + [T.StructField(SEQ, T.LongType(), True), T.StructField(DELETED, T.BooleanType(), True)]
    )
    return Miniberg.create(root, schema, num_buckets=num_buckets)


def bootstrap_table(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    *,
    num_buckets: int = 16,
) -> Miniberg:
    """Create a table from an initial (non-CDC) snapshot; rows get _seq=-1 so
    any changelog event (seq>=0) supersedes them."""
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(SEQ, T.LongType(), True), T.StructField(DELETED, T.BooleanType(), True)]
    )
    table = Miniberg.create(root, schema, num_buckets=num_buckets)
    staging = table.staging_dir()
    out = df.withColumn(SEQ, F.lit(-1).cast("long")).withColumn(DELETED, F.lit(False)).withColumn(
        BUCKET, F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")
    )
    out.repartition(num_buckets, BUCKET).write.partitionBy(BUCKET).parquet(staging)
    added = table.collect_staged_files(staging, 0)
    table.commit(added_files=added, replaced_buckets=set(range(num_buckets)),
                 bucket_keys=keys_from_entries(added))
    return table
