"""Event-time watermark semantics (SURVEY.md §2.7 'watermark / late data').

Spark's guarantee: once the watermark passes a window's end, the window is
finalized — emitted exactly once (append mode) and its state evicted; events
arriving AFTER that are dropped and can never re-emit or duplicate the
window. (Events later than the watermark but arriving before eviction may
still be merged — that is documented best-effort, not asserted here.)"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

US_HOUR = 3_600_000_000
BASE = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def _write(dirpath, name, rows, mtime):
    os.makedirs(dirpath, exist_ok=True)
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    p = os.path.join(dirpath, name)
    pq.write_table(tbl, p)
    os.utime(p, (mtime, mtime))


def test_watermark_finalizes_windows_exactly_once(spark, tmp_path):
    src = str(tmp_path / "stream")
    t0 = 1_700_000_000
    # b1: two hour-0 events + an hour-5 event (pushes watermark to 3h)
    _write(src, "b1.parquet", [(1, BASE + 10, 1.0), (1, BASE + 20, 1.0),
                               (2, BASE + 5 * US_HOUR, 1.0)], t0)
    # b2: unrelated on-time row; end of this batch EVICTS + EMITS hour-0 (n=2)
    _write(src, "b2.parquet", [(2, BASE + 5 * US_HOUR + 30, 1.0)], t0 + 10)
    # b3: a very LATE hour-0 event — window already finalized -> dropped
    _write(src, "b3.parquet", [(1, BASE + 40, 1.0)], t0 + 20)
    # b4: hour-9 event advances the watermark further (emits hour-5 later)
    _write(src, "b4.parquet", [(3, BASE + 9 * US_HOUR, 1.0)], t0 + 30)

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = [(r["w"]["start"].hour, r["n"]) for r in spark.table("wm_out").collect()]
    hour0 = [n for h, n in emitted if h == 22]  # BASE is 22:13Z -> hour-0 window starts 22:00
    # exactly ONE finalized emission, counting only the on-time events; the
    # post-eviction late event neither re-emits nor duplicates the window
    assert hour0 == [2], emitted
    # hour-5 window (03:00Z) finalized once the watermark passed it
    assert [n for h, n in emitted if h == 3] == [2], emitted
