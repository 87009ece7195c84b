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


def test_compact_sorts_within_bucket_files(spark, changelog_plain, tmp_path):
    """Sorted compaction: each rewritten bucket file is key-ordered, so
    parquet row-group min/max stats support key point-lookup skipping."""
    import pyarrow.parquet as pq

    d, _ = changelog_plain
    table = _loaded_table(spark, d, tmp_path, "tsort")
    compact(spark, table, sort=True)
    import os

    for f in table.files():
        ids = pq.read_table(os.path.join(table.root, f["path"]), columns=["doc_id"])[
            "doc_id"
        ].to_pylist()
        assert ids == sorted(ids), f["path"]
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


def test_split_buckets_preserves_state_and_future_applies(spark, changelog_small, tmp_path):
    """N -> 2N bucket split: same state, shuffle-free rewrite plan, and later
    incremental applies keep working against the new bucket function."""
    from pyspark.sql import functions as F

    from recidiviz_data_spark.cdc.apply import apply_batches as apply_more
    from recidiviz_data_spark.tables.maintenance import split_buckets

    d, spec = changelog_small
    table = create_empty_table(str(tmp_path / "ts"), V1_PAYLOAD, num_buckets=4)
    # apply only the first batches, split, then apply the rest on top
    apply_more(spark, table, d, upto=2)
    v = split_buckets(spark, table)
    m = table.manifest()
    assert m["num_buckets"] == 8 and m["version"] == v
    assert all(f["bucket"] < 8 for f in table.files(manifest=m))
    assert_state_equal(table_state(spark, table), expected_state(d, upto_batch=2))
    # the split plan must be map-only: bucket-pure inputs fan out locally
    df = table.read(spark, version=v - 1, include_internal=True).withColumn(
        "_bucket", F.pmod(F.xxhash64(m["key_col"]), F.lit(8)).cast("int")
    )
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
    # every row sits in the bucket the NEW function assigns it (file purity)
    import os

    for f in table.files(manifest=m):
        rows = spark.read.parquet(os.path.join(table.root, f["path"])).select("doc_id")
        bad = rows.filter(
            F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int") != f["bucket"]
        ).count()
        assert bad == 0, f
    # incremental applies continue against the split table
    apply_more(spark, table, d)
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
