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


def test_watermarked_stream_matches_batch_tumbling(spark, tmp_path):
    """readStream + withWatermark + 1-day windowed agg in APPEND mode over the
    events table (4 ts-ordered micro-batches) == the batch st_tumbling_daily
    aggregate, modulo windows the final watermark never passed (the last
    day(s) stay in state when the availableNow stream stops). Closes the one
    §2.7 surface the batch-deterministic engine paths don't exercise."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    sf = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.01")
    tbl = pq.read_table(os.path.join(sf, "events.parquet"),
                        columns=["ts", "event_type", "value"])
    tbl = tbl.sort_by("ts")
    n = tbl.num_rows
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    t0 = 1_700_000_000
    for i in range(4):
        chunk = tbl.slice(cuts[i], cuts[i + 1] - cuts[i])
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(chunk, p)
        os.utime(p, (t0 + 10 * i, t0 + 10 * i))
    # watermark visible after batch 3 = max ts of files 0..2 - 1h: windows
    # ending at or before it are GUARANTEED emitted by the final batch
    wm3 = max(
        pq.read_table(os.path.join(src, f"b{i}.parquet"))["ts"].to_pylist()
        for i in range(3)
    )[-1]

    # withWatermark requires TIMESTAMP (LTZ), not NTZ; pin the session TZ to
    # UTC so the parquet's naive micros round-trip bit-identically on both
    # the stream and batch sides AND compare cleanly against pyarrow's naive
    # datetimes (wm3)
    tz_prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = "ts timestamp, event_type string, value double"
    agg_cols = lambda g: g.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    ).select(
        F.date_format("w.start", "yyyy-MM-dd").alias("day"),
        F.col("w.end").alias("w_end"),
        "event_type", "n", "total_value",
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        agg_cols(
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_daily")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()

        batch = agg_cols(
            spark.read.schema(schema).parquet(src)
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        )
        expected = {
            (r["day"], r["event_type"]): (r["n"], r["total_value"], r["w_end"])
            for r in batch.collect()
        }
        emitted = {
            (r["day"], r["event_type"]): (r["n"], r["total_value"])
            for r in spark.table("wm_daily").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_prev)
    assert emitted, "append-mode stream emitted nothing"
    # every emitted window is EXACTLY the batch answer (same counts and the
    # same decimal-summed total) — append emits a window at most once
    for k, (n_em, tv_em) in emitted.items():
        assert k in expected, k
        assert (n_em, tv_em) == expected[k][:2], (k, emitted[k], expected[k])
    # completeness modulo the final window(s): everything the watermark
    # passed before the last batch must have been emitted
    from datetime import timedelta

    for k, (_, _, w_end) in expected.items():
        if w_end <= wm3 - timedelta(hours=1):
            assert k in emitted, (k, sorted(emitted))
    # and the tail is the ONLY thing missing
    assert set(emitted) | {
        k for k, v in expected.items() if v[2] > wm3 - timedelta(hours=1)
    } >= set(expected)


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming dedup: dropDuplicatesWithinWatermark keeps ONE row per key
    among events whose event times fall within the watermark delay of each
    other, and cannot re-emit a key once its state is evicted — the
    streaming analog of the exact-dedup operator."""
    src = str(tmp_path / "stream")
    t0 = 1_700_000_000
    # b1: k1 twice (dup within delay) + k2 once
    _write(src, "b1.parquet", [(1, BASE + 10, 1.0), (1, BASE + 20, 1.0),
                               (2, BASE + 30, 1.0)], t0)
    # b2: watermark jumps 5h ahead -> k1/k2 state becomes evictable
    _write(src, "b2.parquet", [(3, BASE + 5 * US_HOUR, 1.0)], t0 + 10)
    # b2b: one more batch — the watermark (max event time - delay = +3h)
    # only becomes effective in the batch AFTER the advancing event, and
    # in-batch dedup runs BEFORE end-of-batch eviction, so k1's state is
    # truly gone only after this batch commits
    _write(src, "b2b.parquet", [(4, BASE + 5 * US_HOUR + 10, 1.0)], t0 + 15)
    # b3: k1 again AFTER its state expired -> re-emitted once more (dedup
    # window is the watermark delay, not forever); a dup of k3 in the same
    # batch still collapses
    _write(src, "b3.parquet", [(1, BASE + 5 * US_HOUR + 40, 1.0),
                               (3, BASE + 5 * US_HOUR + 50, 1.0)], t0 + 20)

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dedup = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["user_id"]
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("ddw_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ddw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("ddw_out").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r["ts"])
    # k1: once in the first window + once after state eviction = 2 emissions;
    # k2 and k3 exactly once each despite k3's same-batch duplicate
    assert len(by_key.get(1, [])) == 2, by_key
    assert len(by_key.get(2, [])) == 1, by_key
    assert len(by_key.get(3, [])) == 1, by_key
