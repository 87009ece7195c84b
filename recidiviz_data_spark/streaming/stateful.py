"""Custom stateful streaming operator (SURVEY.md §2.7 / guide:
``applyInPandasWithState``): per-key running state maintained across
micro-batches — the Structured-Streaming analog of the reference's
open-snapshot-per-entity state.

The demo keeps (event count, integer-scaled value sum, max event_id) per
user over a streamed read of the events table and emits the updated totals
each micro-batch. With a single input file the stream is exactly one
micro-batch, so emissions are deterministic and the FINAL state equals a
plain GROUP BY — which is what the contract oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)
OUT_SCHEMA = "user_id bigint, n_events bigint, value_e4_sum bigint, last_event_id bigint"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from recidiviz_data_spark.functions.rounding import round_half_away

    n, vsum, last = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].to_numpy() * 10000
        # exact SQL round() (half away from zero, midpoint-adjacent safe)
        vsum += int(round_half_away(v).astype("int64").sum())
        last = max(last, int(pdf["event_id"].max()))
    state.update((n, vsum, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_e4_sum": [vsum], "last_event_id": [last]}
    )


def stream_user_state(spark: SparkSession, sf_dir: str, query_name: str = "_user_state") -> DataFrame:
    """Run the stateful stream to completion (availableNow) and return the
    per-user final state from the memory sink."""
    import hashlib
    import os
    import tempfile

    # the file stream source requires a DIRECTORY; expose the single events
    # parquet through a symlinked dir (one file -> exactly one micro-batch)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src_dir = os.path.join(tempfile.gettempdir(), f"rds_events_stream_{tag}")
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    # lexists (exists follows symlinks: a dangling link reads as absent and a
    # re-create raises FileExistsError) + abspath (a relative target would
    # dangle relative to the tempdir, silently streaming zero files)
    if os.path.lexists(link):
        os.unlink(link)
    os.symlink(os.path.abspath(os.path.join(sf_dir, "events.parquet")), link)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUT_SCHEMA,
        stateStructType="n bigint, vsum bigint, last bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # re-entrant: a previous run's memory-sink table must not accumulate
    try:
        spark.catalog.dropTempView(query_name)
    except Exception:
        pass
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one input file -> one micro-batch -> exactly one emission per user
    return spark.table(query_name)


# ---------------------------------------------------------------------------
# streaming SESSION WINDOWS (round-4 verdict item 5): per-user 30-minute-gap
# sessions maintained ACROSS micro-batches — the stateful shape
# F.session_window covers in batch (operators/relational.py x_session_window),
# re-expressed as applyInPandasWithState so a session split over two
# micro-batches still merges. Semantics match the batch gaps-and-islands
# oracle exactly: a gap >= 30 min starts a NEW session.

SESSION_GAP_US = 1_800_000_000  # 30 minutes
SESSION_OUT_SCHEMA = "user_id bigint, session_start string, n_events bigint"


def _update_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's (time-ordered) events into the user's open
    session; emit every CLOSED session with its final count plus the open
    session's running count (update mode — later batches re-emit the open
    session's row with a larger count, so max(n_events) per (user, start)
    is the final answer)."""
    start, last, n = state.get if state.exists else (-1, -1, 0)
    rows: list[tuple[int, int]] = []  # (session_start_us, n_events)
    # applyInPandasWithState gives NO intra-group ordering and splits a
    # group's micro-batch data into multiple Arrow chunks past
    # arrow.maxRecordsPerBatch — sorting per chunk but folding in arrival
    # order would misorder events across chunk boundaries. Concatenate the
    # whole micro-batch first, then sort ONCE.
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for ts_us in pdf["ts"].astype("datetime64[us]").astype("int64"):
            ts_us = int(ts_us)
            if start < 0:
                start, last, n = ts_us, ts_us, 1
            elif ts_us - last >= SESSION_GAP_US:
                rows.append((start, n))  # closed: final emission
                start, last, n = ts_us, ts_us, 1
            else:
                last, n = ts_us, n + 1
    state.update((start, last, n))
    if start >= 0:
        rows.append((start, n))  # open session: running emission
    starts, counts = [r[0] for r in rows], [r[1] for r in rows]
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(rows),
            "session_start": pd.to_datetime(pd.Series(starts), unit="us").dt.strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
            "n_events": counts,
        }
    )


def _chunked_events_dir(spark, sf_dir: str, n_files: int) -> str:
    """Split the events table into ``n_files`` TIME-ORDERED parquet files
    with strictly increasing mtimes, so the file stream source (which orders
    by modification time) feeds micro-batches in event-time order — the
    arrival pattern a session stream assumes. Cached per source identity."""
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq

    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    st = os.stat(src)
    tag = hashlib.md5(f"{src}:{st.st_mtime_ns}:{st.st_size}:{n_files}".encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"rds_events_chunks_{tag}")
    if os.path.exists(os.path.join(out, "_CHUNKS_OK")):
        return out
    t = pq.read_table(src)
    order = pd.DataFrame(
        {"ts": t["ts"].to_pandas(), "event_id": t["event_id"].to_pandas()}
    ).sort_values(["ts", "event_id"]).index.to_numpy()
    t = t.take(order)
    os.makedirs(out, exist_ok=True)
    step = -(-t.num_rows // n_files)
    for i in range(n_files):
        chunk = t.slice(i * step, step)
        p = os.path.join(out, f"part-{i:03d}.parquet")
        pq.write_table(chunk, p)
        # the file stream source orders by MILLISECOND mtime — space the
        # chunks a full second apart so the order is unambiguous
        ns = st.st_mtime_ns + (i + 1) * 1_000_000_000
        os.utime(p, ns=(ns, ns))
    with open(os.path.join(out, "_CHUNKS_OK"), "w") as f:
        f.write("ok")
    return out


def stream_session_state(
    spark: SparkSession, sf_dir: str, *, n_files: int = 4,
    query_name: str = "_session_state",
) -> DataFrame:
    """Run the stateful session stream to completion (availableNow, one file
    per micro-batch so sessions genuinely span batch boundaries) and return
    the final per-session counts: max(n_events) per (user_id, session_start)
    over the update-mode emissions. Equals the batch gaps-and-islands /
    F.session_window result — pytest-asserted."""
    from pyspark.sql import functions as F

    src_dir = _chunked_events_dir(spark, sf_dir, n_files)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType="start bigint, last bigint, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    try:
        spark.catalog.dropTempView(query_name)
    except Exception:
        pass
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("user_id", "session_start")
        .agg(F.max("n_events").alias("n_events"))
    )
