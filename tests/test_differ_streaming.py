"""Differ identity (SURVEY.md §7 M6) + structured-streaming apply tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from recidiviz_data_spark.cdc.apply import apply_batch, create_empty_table
from recidiviz_data_spark.cdc.differ import snapshot_diff
from recidiviz_data_spark.gen import gen_changelog
from recidiviz_data_spark.oracle import assert_state_equal, expected_state
from recidiviz_data_spark.streaming.microbatch import (
    ChangelogTailer,
    stream_apply_available_now,
)
from recidiviz_data_spark.tables.miniberg import Miniberg
from tests.test_replay import V1_PAYLOAD, table_state


def _tokens_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_differ_emits_minimal_events(spark):
    old = _tokens_df(spark, [
        ("a", [1], 1, "web"), ("b", [2, 2], 2, "web"), ("c", [3], 1, "code"),
    ])
    new = _tokens_df(spark, [
        ("a", [1], 1, "web"),            # unchanged -> no event
        ("b", [9, 9, 9], 3, "web"),      # changed   -> U
        ("d", [4], 1, "books"),          # added     -> I
    ])                                    # c removed -> D
    ev = {r["doc_id"]: r for r in snapshot_diff(old, new, snapshot_seq=5).collect()}
    assert set(ev) == {"b", "c", "d"}
    assert ev["b"]["op"] == "U" and ev["b"]["tokens"] == [9, 9, 9]
    assert ev["c"]["op"] == "D" and ev["c"]["tokens"] is None
    assert ev["d"]["op"] == "I"
    assert all(r["event_seq"] == 5 for r in ev.values())


def test_differ_then_apply_is_identity(spark, tmp_path):
    """differ ∘ apply == identity: applying the diff of (v1 -> v2) onto a
    table holding v1 reproduces v2 exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from recidiviz_data_spark.cdc.apply import bootstrap_table

    old = _tokens_df(spark, [
        ("a", [1], 1, "web"), ("b", [2, 2], 2, "web"), ("c", [3], 1, "code"),
    ])
    new = _tokens_df(spark, [
        ("a", [1], 1, "web"), ("b", [9, 9, 9], 3, "web"), ("d", [4], 1, "books"),
    ])
    table = bootstrap_table(spark, str(tmp_path / "t"), old, num_buckets=4)
    ev = snapshot_diff(old, new, snapshot_seq=0).withColumn(
        "batch_id", F.lit(0).cast("long")
    )
    apply_batch(spark, table, ev, 0)
    got = {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in table.read(spark).collect()
    }
    want = {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in new.collect()
    }
    assert got == want


def test_tailer_availablenow(spark, changelog_plain, tmp_path):
    d, _ = changelog_plain
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    tailer = ChangelogTailer(spark, table, d)
    lineage = tailer.run_available()
    assert tailer.watermark == max(r["batch_id"] for r in lineage)
    assert tailer.run_available() == []  # drained -> no-op
    assert_state_equal(table_state(spark, table), expected_state(d))


def _write_batch_file(cl_dir, batch_id, rows):
    """Hand-built changelog batch: rows = [(event_seq, op, doc_id, tokens)]."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    bdir = os.path.join(cl_dir, f"batch_id={batch_id}")
    os.makedirs(bdir, exist_ok=True)
    tbl = pa.table(
        {
            "event_seq": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "doc_id": pa.array([r[2] for r in rows], pa.string()),
            "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[3]) for r in rows], pa.int32()),
            "source": pa.array(["web"] * len(rows), pa.string()),
            "ts": pa.array([datetime.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")),
            "schema_ver": pa.array([1] * len(rows), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(bdir, "part-0.parquet"))


def _live_docs(spark, table):
    return {r["doc_id"] for r in table.read(spark).collect()}


def test_streaming_recreated_checkpoint_keeps_new_data(spark, tmp_path):
    """A recreated checkpoint restarts epoch ids at 0; the persisted
    epoch->batch_id base from the OLD checkpoint must not map the new
    (bundled) epoch below the watermark and silently drop fresh events."""
    cl = str(tmp_path / "cl")
    _write_batch_file(cl, 0, [(1, "I", "a", [1]), (2, "I", "b", [2])])
    _write_batch_file(cl, 1, [(3, "I", "c", [3])])
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    stream_apply_available_now(spark, table, cl, str(tmp_path / "ck1"),
                               max_files_per_trigger=1)
    assert _live_docs(spark, table) == {"a", "b", "c"}
    # new data arrives; the checkpoint is lost/recreated (fresh dir)
    _write_batch_file(cl, 2, [(4, "I", "d", [4]), (5, "I", "e", [5])])
    stream_apply_available_now(spark, table, cl, str(tmp_path / "ck2"),
                               max_files_per_trigger=10)  # all files, 1 epoch
    assert _live_docs(spark, table) == {"a", "b", "c", "d", "e"}


def test_streaming_survives_interleaved_batch_writer(spark, tmp_path):
    """A foreign batch writer advancing the table watermark between stream
    runs must not make the stream's next (new-data) epoch look like a replay."""
    cl = str(tmp_path / "cl")
    _write_batch_file(cl, 0, [(1, "I", "a", [1])])
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    ckpt = str(tmp_path / "ck")
    stream_apply_available_now(spark, table, cl, ckpt, max_files_per_trigger=10)
    assert _live_docs(spark, table) == {"a"}
    # a direct batch apply jumps the watermark far ahead of the stream's base
    foreign = spark.createDataFrame(
        [(100, "I", "f", [6], 1, "web")],
        "event_seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    apply_batch(spark, table, foreign, table.manifest()["last_applied_batch"] + 7)
    # new stream data: its epoch id maps below the watermark under the old base
    _write_batch_file(cl, 1, [(101, "I", "g", [7])])
    stream_apply_available_now(spark, table, cl, ckpt, max_files_per_trigger=10)
    assert _live_docs(spark, table) == {"a", "f", "g"}


def test_structured_streaming_apply(spark, tmp_path):
    """readStream + foreachBatch MERGE, availableNow, multiple micro-batches;
    a SECOND run with the same checkpoint is a no-op (exactly-once)."""
    cl = str(tmp_path / "cl")
    gen_changelog(cl, n_docs=300, n_events=2500, n_batches=4, seed=3,
                  delete_rate=0.1, dup_rate=0.05)
    table = create_empty_table(str(tmp_path / "t"), V1_PAYLOAD, num_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    stream_apply_available_now(spark, table, cl, ckpt, max_files_per_trigger=1)
    assert_state_equal(table_state(spark, table), expected_state(cl))
    v = table.current_version()
    stream_apply_available_now(spark, table, cl, ckpt, max_files_per_trigger=1)
    assert table.current_version() == v  # checkpoint replay adds nothing
    assert_state_equal(table_state(spark, table), expected_state(cl))
    assert os.path.isdir(ckpt)
