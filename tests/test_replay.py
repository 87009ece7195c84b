"""Replay-equality golden tests (SURVEY.md §5.2 #1) — the engine's batch-by-
batch apply must reproduce the oracle's single-pass LWW fold with per-row
token-array equality, mirroring the reference's historical-snapshot update
tests (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from recidiviz_data_spark.cdc.apply import (
    apply_batches,
    apply_full_log,
    create_empty_table,
)
from recidiviz_data_spark.oracle import (
    assert_state_equal,
    expected_state,
    expected_state_with_lang,
)

V1_PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def table_state(spark, table, with_lang=False):
    df = table.read(spark)
    cols = ["doc_id", "tokens", "n_tok", "source"] + (["lang"] if with_lang else [])
    return df.selectExpr(
        *[c if c != "n_tok" else "CAST(n_tok AS BIGINT) AS n_tok" for c in cols]
    ).toPandas()


@pytest.mark.parametrize("strategy", ["agg", "argmax", "window", "salted_window"])
def test_incremental_apply_matches_oracle(spark, changelog_small, tmp_path, strategy):
    d, _ = changelog_small
    table = create_empty_table(str(tmp_path / f"t_{strategy}"), V1_PAYLOAD, num_buckets=8)
    lineage = apply_batches(spark, table, d, dedup_strategy=strategy)
    assert lineage, "no lineage rows emitted"
    assert_state_equal(table_state(spark, table, with_lang=True),
                       expected_state_with_lang(d))


def test_full_log_replay_matches_oracle(spark, changelog_plain, tmp_path):
    d, _ = changelog_plain
    table = apply_full_log(spark, str(tmp_path / "t_full"), d, num_buckets=8)
    assert_state_equal(table_state(spark, table), expected_state(d))


def test_incremental_equals_full_log(spark, changelog_small, tmp_path):
    d, _ = changelog_small
    t_inc = create_empty_table(str(tmp_path / "t_inc"), V1_PAYLOAD, num_buckets=8)
    apply_batches(spark, t_inc, d)
    t_full = apply_full_log(spark, str(tmp_path / "t_full2"), d, num_buckets=8)
    a = table_state(spark, t_inc, with_lang=True)
    b = table_state(spark, t_full, with_lang=True)
    assert_state_equal(a, b)


def test_metrics_reconcile(spark, changelog_small, tmp_path):
    """FIXTURES.md §A5: events_in = applied + deleted + skipped_stale + invalid."""
    d, spec = changelog_small
    table = create_empty_table(str(tmp_path / "t_metrics"), V1_PAYLOAD, num_buckets=8)
    lineage = apply_batches(spark, table, d)
    for row in lineage:
        assert row["events_in"] == (
            row["applied"] + row["deleted"] + row["skipped_stale"] + row["invalid"]
        ), row
    # totals: every generated event accounted for exactly once
    import duckdb

    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{d}/batch_id=*/*.parquet', "
        "hive_partitioning=true, union_by_name=true)"
    ).fetchone()[0]
    assert sum(r["events_in"] for r in lineage) == n_events
    # lineage persisted with the table
    assert table.lineage() == lineage


@pytest.mark.parametrize("mode", [True, False, "auto"])
def test_decision_prune_modes_equivalent(spark, changelog_plain, tmp_path, mode):
    """decision_prune only changes WHICH jobs run (prune-collect vs unpruned
    2-column read) — the final state must be identical in every mode."""
    d, _ = changelog_plain
    table = create_empty_table(str(tmp_path / f"t_{mode}"), V1_PAYLOAD, num_buckets=4)
    apply_batches(spark, table, d, decision_prune=mode)
    assert_state_equal(table_state(spark, table), expected_state(d))
