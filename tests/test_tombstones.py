"""Regression: delete-then-stale-replay must NOT resurrect a doc.

Found during end-to-end verification (spark-submit apply of a changelog with
stale replays): after a delete removed the row, the doc's _seq watermark was
lost, so a stale update in a later batch was classified 'applied'. Fix:
deletes write tombstones (_deleted=true, _seq kept); reads filter them.

Hand-built changelogs in the style of the reference's
update_historical_snapshots tests (SURVEY.md §5.1)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def write_batch(root: str, batch_id: int, events: list[dict]) -> None:
    d = os.path.join(root, f"batch_id={batch_id}")
    os.makedirs(d, exist_ok=True)
    tbl = pa.table(
        {
            "event_seq": pa.array([e["seq"] for e in events], pa.int64()),
            "op": pa.array([e["op"] for e in events], pa.string()),
            "doc_id": pa.array([e["doc"] for e in events], pa.string()),
            "tokens": pa.array([e.get("tokens") for e in events], pa.list_(pa.int32())),
            "n_tok": pa.array(
                [len(e["tokens"]) if e.get("tokens") is not None else None for e in events],
                pa.int32(),
            ),
            "source": pa.array(["web"] * len(events), pa.string()),
            "ts": pa.array([1_700_000_000_000_000 + e["seq"] for e in events], pa.timestamp("us")),
            "schema_ver": pa.array([1] * len(events), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "part-0.parquet"))


def state(spark, table):
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"])
        for r in table.read(spark).collect()
    }


def test_delete_then_stale_update_stays_deleted(spark, tmp_path):
    cl = str(tmp_path / "cl")
    write_batch(cl, 0, [
        {"seq": 1, "op": "I", "doc": "a", "tokens": [1, 2]},
        {"seq": 2, "op": "U", "doc": "a", "tokens": [3, 4, 5]},
        {"seq": 3, "op": "I", "doc": "b", "tokens": [7]},
    ])
    write_batch(cl, 1, [{"seq": 4, "op": "D", "doc": "a"}])
    # stale replay of seq 2 arrives AFTER the delete
    write_batch(cl, 2, [{"seq": 2, "op": "U", "doc": "a", "tokens": [3, 4, 5]}])

    table = create_empty_table(str(tmp_path / "t"), PAYLOAD, num_buckets=4)
    lineage = apply_batches(spark, table, cl)
    assert state(spark, table) == {"b": ((7,), 1)}
    by_batch = {}
    for r in lineage:
        b = by_batch.setdefault(r["batch_id"], dict(applied=0, deleted=0, stale=0))
        b["applied"] += r["applied"]
        b["deleted"] += r["deleted"]
        b["stale"] += r["skipped_stale"]
    assert by_batch[1] == {"applied": 0, "deleted": 1, "stale": 0}
    assert by_batch[2] == {"applied": 0, "deleted": 0, "stale": 1}


def test_delete_of_absent_doc_blocks_older_events(spark, tmp_path):
    """A D for a doc the table never saw still writes a tombstone, so an
    even-later stale I cannot insert it."""
    cl = str(tmp_path / "cl2")
    write_batch(cl, 0, [{"seq": 10, "op": "D", "doc": "ghost"}])
    write_batch(cl, 1, [{"seq": 5, "op": "I", "doc": "ghost", "tokens": [9, 9]}])
    table = create_empty_table(str(tmp_path / "t2"), PAYLOAD, num_buckets=4)
    apply_batches(spark, table, cl)
    assert state(spark, table) == {}


def test_reinsert_after_delete(spark, tmp_path):
    """A genuinely NEWER insert after a delete must come back."""
    cl = str(tmp_path / "cl3")
    write_batch(cl, 0, [{"seq": 1, "op": "I", "doc": "a", "tokens": [1]}])
    write_batch(cl, 1, [{"seq": 2, "op": "D", "doc": "a"}])
    write_batch(cl, 2, [{"seq": 3, "op": "I", "doc": "a", "tokens": [2, 2]}])
    table = create_empty_table(str(tmp_path / "t3"), PAYLOAD, num_buckets=4)
    apply_batches(spark, table, cl)
    assert state(spark, table) == {"a": ((2, 2), 2)}
