"""Physical-plan assertions: the 100TB questions, asked of every plan.

Did the filter reach the parquet scan (PushedFilters)? Did partition pruning
fire (PartitionFilters)? Did the small side broadcast? Is the hot path free of
row-at-a-time Python (BatchEvalPython)? Did the aggregation get a map-side
partial phase? Used in tests/test_plans.py and available for ad-hoc tuning.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    plan = plan_string(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(column in ln for ln in pushed), (
        f"filter on {column} did not reach the scan:\n" + "\n".join(pushed or [plan])
    )


def assert_partition_filter(df: DataFrame, column: str) -> None:
    plan = plan_string(df)
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert lines and any(column in ln for ln in lines), (
        f"no partition pruning on {column}:\n" + "\n".join(lines or [plan])
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join:\n" + plan
    )


def assert_no_row_python(df: DataFrame) -> None:
    """Row-at-a-time Python UDFs are banned on the hot path (BASELINE.json);
    ArrowEvalPython (pandas UDFs) and mapInPandas are the allowed Python."""
    plan = plan_string(df)
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in plan:\n" + plan


def assert_partial_aggregation(df: DataFrame) -> None:
    """Two-phase hash aggregation (map-side combine before the shuffle)."""
    plan = plan_string(df, mode="simple")
    assert plan.count("HashAggregate") >= 2 or "partial" in plan, (
        "no partial aggregation phase:\n" + plan
    )


def assert_column_pruned(df: DataFrame, must_not_read: list[str]) -> None:
    """ReadSchema at the scan must exclude the given columns."""
    plan = plan_string(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, "no ReadSchema in plan:\n" + plan
    for col in must_not_read:
        assert all(col not in ln for ln in read), (
            f"column {col} read but should be pruned:\n" + "\n".join(read)
        )
