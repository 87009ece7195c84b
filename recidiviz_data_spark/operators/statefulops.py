"""Stateful-streaming contract entry (SURVEY §2.7 / §2.8)."""

from __future__ import annotations

from recidiviz_data_spark.operators.base import _q


@_q(
    "st_stateful_user_state",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4_sum,
           CAST(MAX(event_id) AS BIGINT) AS last_event_id
    FROM events GROUP BY user_id
    """,
)
def st_stateful_user_state(spark, sf_dir):
    """applyInPandasWithState over a streamed read of events: per-user state
    (count, scaled value sum, last event id) maintained in the state store;
    final emissions must equal the batch GROUP BY."""
    from recidiviz_data_spark.streaming.stateful import stream_user_state

    import hashlib

    name = "_user_state_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return stream_user_state(spark, sf_dir, query_name=name)
