"""Compaction / snapshot-expiry / tombstone-purge tests."""

from __future__ import annotations

from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
from recidiviz_data_spark.oracle import assert_state_equal, expected_state
from recidiviz_data_spark.tables.maintenance import compact, expire_snapshots, table_stats
from tests.test_replay import V1_PAYLOAD, table_state


def _loaded_table(spark, changelog, tmp_path, name):
    table = create_empty_table(str(tmp_path / name), V1_PAYLOAD, num_buckets=4)
    # cheap write path (no auto-compact) so files accumulate per bucket
    apply_batches(spark, table, changelog, compact=False)
    return table


def test_compact_preserves_state_and_bounds_files(spark, changelog_plain, tmp_path):
    d, _ = changelog_plain
    table = _loaded_table(spark, d, tmp_path, "t")
    before = table_stats(table)
    assert before["max_files_per_bucket"] > 1
    v = compact(spark, table)
    assert v == before["version"] + 1
    after = table_stats(table)
    assert after["max_files_per_bucket"] == 1
    assert_state_equal(table_state(spark, table), expected_state(d))


def test_tombstone_purge_with_horizon(spark, changelog_plain, tmp_path):
    d, _ = changelog_plain
    table = _loaded_table(spark, d, tmp_path, "t2")
    n_with = table.read(spark, include_internal=True).count()
    n_live = table.read(spark).count()
    assert n_with > n_live, "fixture should have tombstones"
    # horizon = everything seen so far: all tombstones are purgeable
    horizon = max(r["event_seq"] for r in
                  __import__("duckdb").sql(
                      f"SELECT max(event_seq) AS event_seq FROM read_parquet('{d}/batch_id=*/*.parquet', hive_partitioning=true, union_by_name=true)"
                  ).df().to_dict("records"))
    compact(spark, table, tombstone_horizon=horizon)
    assert table.read(spark, include_internal=True).count() == n_live
    assert_state_equal(table_state(spark, table), expected_state(d))


def test_expire_snapshots_keeps_current_state(spark, changelog_plain, tmp_path):
    d, _ = changelog_plain
    table = _loaded_table(spark, d, tmp_path, "t3")
    v = table.current_version()
    removed = expire_snapshots(table, keep_last=2, grace_seconds=0)
    assert removed, "old manifests/files should be removed"
    assert table.current_version() == v
    assert_state_equal(table_state(spark, table), expected_state(d))
    # time travel now limited to survivors
    assert table.manifest(v - 1) is not None
    try:
        table.manifest(0)
        raise AssertionError("expired snapshot should be gone")
    except FileNotFoundError:
        pass
