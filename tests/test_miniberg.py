"""miniberg table-format tests (SURVEY.md §5.2 #2-4): atomic commits,
exactly-once idempotency, time travel, orphan invisibility, schema evolution."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import types as T

from recidiviz_data_spark.cdc.apply import apply_batch, apply_batches, create_empty_table
from recidiviz_data_spark.oracle import assert_state_equal, expected_state, expected_state_with_lang
from recidiviz_data_spark.sources.changelog import read_batch
from recidiviz_data_spark.tables.miniberg import CommitConflict, Miniberg
from tests.test_replay import V1_PAYLOAD, table_state


def test_time_travel_matches_oracle_per_batch(spark, changelog_plain, tmp_path):
    """Every snapshot version = oracle state folded up to that batch."""
    d, spec = changelog_plain
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, table, d)
    # version v (1-based after create) corresponds to batch v-1
    for v in range(1, table.current_version() + 1):
        batch = table.manifest(v)["last_applied_batch"]
        df = table.read(spark, version=v).selectExpr(
            "doc_id", "tokens", "CAST(n_tok AS BIGINT) AS n_tok", "source"
        )
        assert_state_equal(df.toPandas(), expected_state(d, upto_batch=batch))


def test_idempotent_reapply_is_noop(spark, changelog_plain, tmp_path):
    d, _ = changelog_plain
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, table, d)
    v = table.current_version()
    # re-apply an already-committed batch: no-op, no new snapshot
    out = apply_batch(spark, table, read_batch(spark, d, 0), 0)
    assert out == []
    assert table.current_version() == v


def test_crash_before_commit_leaves_no_trace(spark, changelog_plain, tmp_path):
    """Simulate a crash between the staging write and the manifest commit:
    data files exist on disk but no snapshot references them -> invisible,
    and a clean re-run produces the correct state."""
    d, _ = changelog_plain
    root = str(tmp_path / "t")
    table = create_empty_table(root, V1_PAYLOAD, num_buckets=4)
    apply_batch(spark, table, read_batch(spark, d, 0), 0)

    # "crash": stage batch 1's output straight into data/ without committing
    from pyspark.sql import functions as F

    orphan_df = read_batch(spark, d, 1).filter("op <> 'D'").limit(50)
    staging = table.staging_dir()
    orphan_df.withColumn("_bucket", F.lit(0)).write.partitionBy("_bucket").parquet(staging)
    for p in glob.glob(os.path.join(staging, "_bucket=0", "*.parquet")):
        os.rename(p, os.path.join(root, "data", "orphan-" + os.path.basename(p)))

    n_visible = table.read(spark).count()
    assert n_visible == len(expected_state(d, upto_batch=0))

    removed = table.gc_orphans(grace_seconds=0)
    assert removed, "orphan files should have been collected"

    # re-run from the watermark: final state correct
    apply_batches(spark, table, d)
    assert_state_equal(table_state(spark, table), expected_state(d))


def test_resume_from_checkpoint_new_process(spark, changelog_small, tmp_path):
    """Stop after batch 1; a NEW Miniberg handle (new process analog) resumes
    at batch 2 and converges to the uninterrupted state."""
    d, _ = changelog_small
    root = str(tmp_path / "t")
    t1 = create_empty_table(root, V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, t1, d, upto=1)
    assert t1.manifest()["last_applied_batch"] == 1

    t2 = Miniberg(root)  # fresh handle — reads watermark from the manifest
    apply_batches(spark, t2, d)
    assert_state_equal(
        table_state(spark, t2, with_lang=True), expected_state_with_lang(d)
    )


def test_commit_conflict_on_same_parent(tmp_path):
    root = str(tmp_path / "t")
    table = create_empty_table(root, V1_PAYLOAD, num_buckets=4)
    v = table.current_version()
    table.commit(added_files=[], last_applied_batch=0, expected_parent=v)
    # raw CAS (rebase disabled): the stale parent is detected and raised
    with pytest.raises(CommitConflict):
        table.commit(added_files=[], last_applied_batch=1, expected_parent=v,
                     rebase_retries=0)
    # default: a bucket-disjoint, watermark-advancing commit auto-rebases
    assert table.commit(added_files=[], last_applied_batch=1, expected_parent=v) == 2
    # watermark regress can never rebase
    with pytest.raises(CommitConflict):
        table.commit(added_files=[], last_applied_batch=1, expected_parent=v)


def test_schema_evolution_add_and_widen(spark, changelog_small, tmp_path):
    """Mid-log schema_ver bump: lang column appears, n_tok widens to long;
    old snapshots stay readable (time travel across schemas)."""
    d, _ = changelog_small
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, table, d)

    cur = table.spark_schema(include_internal=False)
    by_name = {f.name: f.dataType for f in cur.fields}
    assert isinstance(by_name["lang"], T.StringType)
    assert isinstance(by_name["n_tok"], T.LongType)

    # old snapshot (pre-bump) read under ITS schema: no lang, int n_tok
    m1 = table.manifest(1)
    old_fields = {f["name"]: f["type"] for f in m1["schemas"][str(m1["schema_id"])]["fields"]}
    assert "lang" not in old_fields
    assert old_fields["n_tok"] == "integer"
    assert table.read(spark, version=1).count() > 0

    # new reader over old+new files: v1 rows have null lang, values correct
    assert_state_equal(
        table_state(spark, table, with_lang=True), expected_state_with_lang(d)
    )


def test_incompatible_schema_change_rejected(tmp_path):
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    bad = T.StructType([T.StructField("n_tok", T.StringType(), True)])
    with pytest.raises(ValueError, match="incompatible"):
        table.evolve_schema(bad)


def test_manifest_is_sole_source_of_truth(tmp_path):
    """Every version file is immutable JSON; VERSION discovery = max(v*.json)."""
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    table.commit(added_files=[], last_applied_batch=0)
    paths = sorted(glob.glob(os.path.join(table.meta_dir, "v*.json")))
    assert len(paths) == 2
    for p in paths:
        m = json.load(open(p))
        assert m["format"] == "miniberg/1"
    assert table.manifest(0)["last_applied_batch"] == -1
    assert table.manifest(1)["last_applied_batch"] == 0


def test_legacy_single_level_manifest_migrates(spark, changelog_plain, tmp_path):
    """Round-2 tables carried the file list INLINE in v{N}.json. A legacy
    manifest must (a) read correctly as-is, and (b) be migrated to the
    two-level layout (per-bucket sidecars) by the first commit on top."""
    d, _ = changelog_plain
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, table, d, upto=0)

    # rewrite the current manifest in the legacy layout: inline "files",
    # no "buckets" key (exactly what a round-2 writer produced)
    v = table.current_version()
    m = table.manifest(v)
    legacy = dict(m)
    legacy["files"] = table.files(manifest=m)
    legacy.pop("buckets")
    os.unlink(table._vpath(v))
    with open(table._vpath(v), "w") as f:
        json.dump(legacy, f)

    # (a) reads + summaries work on the legacy layout unchanged
    assert "buckets" not in table.manifest(v)
    assert_state_equal(table_state(spark, table), expected_state(d, upto_batch=0))
    summ = Miniberg.bucket_summaries(table.manifest(v))
    assert sum(s["n_files"] for s in summ.values()) == len(legacy["files"])

    # (b) the next commit migrates: new manifest is two-level, carries every
    # carried bucket as a sidecar reference, and state stays oracle-exact
    apply_batches(spark, table, d)
    m2 = table.manifest()
    assert "files" not in m2 and "buckets" in m2
    for s in m2["buckets"].values():
        assert os.path.exists(os.path.join(table.root, s["path"]))
    assert_state_equal(table_state(spark, table), expected_state(d))


def test_unchanged_buckets_reuse_sidecars(spark, tmp_path):
    """Content-addressed sidecars: a commit that replaces only SOME buckets
    must re-reference the untouched buckets' sidecar files verbatim (same
    path, no rewrite) — the O(buckets) commit property."""
    from tests.test_tombstones import write_batch

    cl = str(tmp_path / "cl")
    write_batch(cl, 0, [{"seq": i, "op": "I", "doc": f"d{i}", "tokens": [i]} for i in range(40)])
    write_batch(cl, 1, [{"seq": 100, "op": "U", "doc": "d0", "tokens": [9]}])
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=8)
    apply_batches(spark, table, cl, upto=0)
    m1 = table.manifest()
    apply_batches(spark, table, cl)  # batch 1 touches d0's bucket ONLY
    m2 = table.manifest()
    untouched = [
        bk for bk in m1["buckets"]
        if bk in m2["buckets"] and m2["buckets"][bk] == m1["buckets"][bk]
    ]
    replaced = [bk for bk in m2["buckets"] if m2["buckets"][bk] != m1["buckets"].get(bk)]
    assert len(replaced) == 1, (replaced, untouched)
    assert len(untouched) == len(m1["buckets"]) - 1
    for bk in untouched:
        assert m2["buckets"][bk]["path"] == m1["buckets"][bk]["path"]


def test_point_lookup_skips_files_by_key_range(spark, tmp_path):
    """Manifest key-range stats (footer min/max recorded at write time)
    must let a point lookup skip files that cannot contain the key, and
    the pruned read must equal the full-scan filter."""
    from tests.test_tombstones import write_batch

    cl = str(tmp_path / "cl")
    # two disjoint doc_id ranges arriving in separate batches -> each
    # bucket holds one file per batch with a NARROW key range
    write_batch(cl, 0, [{"seq": i, "op": "I", "doc": f"d{i:03d}", "tokens": [i]}
                        for i in range(20)])
    write_batch(cl, 1, [{"seq": 100 + i, "op": "I", "doc": f"d{100 + i:03d}", "tokens": [i]}
                        for i in range(20)])
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=2)
    # compact='auto' would merge the narrow files back together — keep them
    apply_batches(spark, table, cl, compact=False)

    files = table.files()
    assert all("key_min" in f for f in files), files
    # the lookup key lives only in batch 1's files
    kept = Miniberg.files_for_keys(files, ["d105"])
    assert kept and all(f["key_min"] >= "d100" for f in kept), kept
    assert len(kept) < len(files), (len(kept), len(files))

    got = table.read_keys(spark, ["d105"]).collect()
    assert len(got) == 1 and got[0]["doc_id"] == "d105"
    # pruned result == unpruned filter, including multi-key across batches
    want = {r["doc_id"] for r in table.read(spark).filter(
        "doc_id IN ('d003', 'd105', 'nope')").collect()}
    got2 = {r["doc_id"] for r in table.read_keys(spark, ["d003", "d105", "nope"]).collect()}
    assert got2 == want == {"d003", "d105"}


def test_point_lookup_sees_tombstones_only_when_internal(spark, tmp_path):
    from tests.test_tombstones import write_batch

    cl = str(tmp_path / "cl")
    write_batch(cl, 0, [{"seq": 1, "op": "I", "doc": "a", "tokens": [1]},
                        {"seq": 2, "op": "I", "doc": "b", "tokens": [2]}])
    write_batch(cl, 1, [{"seq": 10, "op": "D", "doc": "a"}])
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=2)
    apply_batches(spark, table, cl)
    assert table.read_keys(spark, ["a"]).count() == 0  # tombstoned
    internal = table.read_keys(spark, ["a"], include_internal=True).collect()
    assert len(internal) == 1 and internal[0]["_deleted"] is True


def test_rollback_restores_state_and_replays(spark, changelog_small, tmp_path):
    """rollback(v) = one O(buckets) metadata commit re-referencing v's
    sidecars; state equals the old snapshot, the watermark reverts, and
    re-tailing the changelog replays forward to the correct final state
    (the time-travel + reprocess workflow). changelog_small includes a
    mid-log schema bump, so this also proves a post-rollback re-evolution
    never redefines a historical schema id."""
    d, _ = changelog_small
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, table, d)
    v_final = table.current_version()
    ids_before = set(table.manifest()["schemas"])

    v_restore = 1  # after batch 0, before the schema bump
    rb = table.rollback(v_restore)
    assert rb == v_final + 1
    assert table.manifest()["last_applied_batch"] == table.manifest(v_restore)["last_applied_batch"]
    assert_state_equal(
        table_state(spark, table),
        expected_state(d, upto_batch=table.manifest(v_restore)["last_applied_batch"]),
    )
    # rollback moved zero data: its buckets reference v_restore's sidecars
    assert table.manifest()["buckets"] == Miniberg(table.root)._bucket_entries_migrated(
        table.manifest(v_restore), exclude=set()
    )

    # replay forward: re-applies every later batch, converges, and any
    # re-evolved schema got a FRESH id (historical ids never redefined)
    apply_batches(spark, table, d)
    assert_state_equal(
        table_state(spark, table, with_lang=True), expected_state_with_lang(d)
    )
    ids_after = set(table.manifest()["schemas"])
    assert ids_before <= ids_after


def test_table_changes_between_versions(spark, changelog_plain, tmp_path):
    """Change-data-feed: table_changes(v1, v2) emits exactly the I/U/D set
    that the differ-apply identity guarantees — applying it to v1 rebuilds
    v2 (spot-checked via op counts and key membership)."""
    d, _ = changelog_plain
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, table, d)
    v2 = table.current_version()
    v1 = v2 - 1
    changes = table.table_changes(spark, v1, v2).collect()
    assert changes, "consecutive snapshots should differ"
    old_keys = {r["doc_id"] for r in table.read(spark, version=v1).select("doc_id").collect()}
    new_keys = {r["doc_id"] for r in table.read(spark, version=v2).select("doc_id").collect()}
    for r in changes:
        if r["op"] == "I":
            assert r["doc_id"] in new_keys - old_keys
        elif r["op"] == "D":
            assert r["doc_id"] in old_keys - new_keys
        else:
            assert r["op"] == "U" and r["doc_id"] in old_keys & new_keys
    # completeness: every membership change appears
    assert {r["doc_id"] for r in changes if r["op"] == "I"} == new_keys - old_keys
    assert {r["doc_id"] for r in changes if r["op"] == "D"} == old_keys - new_keys
