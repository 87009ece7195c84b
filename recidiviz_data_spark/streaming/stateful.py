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
