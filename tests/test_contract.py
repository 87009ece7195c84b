"""Driver-contract replica (SURVEY.md §5.2 #7): every queries() entry vs its
oracle_sql() on DuckDB at sf0.01 — exact value equality, order-insensitive."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from recidiviz_data_spark.plans.contract_check import compare, duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.01")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# pytest-only queries (the driver checks at most the first 50 queries()
# entries, so these register outside the driver contract — same oracles,
# same exactness bar)
from recidiviz_data_spark.operators import registry as _registry  # noqa: E402

EXTRA_QUERIES = dict(_registry.EXTRA_QUERIES)
EXTRA_ORACLES = dict(_registry.EXTRA_ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_every_query_has_callable():
    assert QUERIES, "no contract queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_registry_within_driver_cap():
    """The driver checks at most the first 50 queries() entries (round-1
    CORRECTNESS held exactly the first 50 in dict order). Everything past the
    cap would silently go unchecked — keep the registry at the cap exactly."""
    from recidiviz_data_spark.operators.base import DRIVER_QUERY_CAP

    assert len(QUERIES) <= DRIVER_QUERY_CAP, sorted(QUERIES)
    assert not set(QUERIES) & set(EXTRA_QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    expected = duck.execute(ORACLES[name]).df()
    compare(df, expected, name=name)


@pytest.mark.parametrize("name", sorted(EXTRA_ORACLES))
def test_extra_query_matches_oracle(spark, duck, name):
    df = EXTRA_QUERIES[name](spark, SF_DIR)
    expected = duck.execute(EXTRA_ORACLES[name]).df()
    compare(df, expected, name=name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()


def test_compare_rejects_int_vs_float(spark):
    """The driver hashes raw values, so int 6 vs float 6.0 must FAIL locally
    too (round-1 root cause: uncast DuckDB SUM(int) -> HUGEINT -> float64)."""
    import pandas as pd

    sdf = spark.createDataFrame([(1, 6)], "k int, v long")
    ok = pd.DataFrame({"k": [1], "v": [6]})
    compare(sdf, ok, name="int_vs_int")  # same kind: passes
    bad = pd.DataFrame({"k": [1], "v": [6.0]})
    with pytest.raises(AssertionError, match="dtype kind"):
        compare(sdf, bad, name="int_vs_float")


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must run and return a DataFrame."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
