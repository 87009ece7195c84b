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


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_every_query_has_callable():
    assert QUERIES, "no contract queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    expected = duck.execute(ORACLES[name]).df()
    compare(df, expected, name=name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must run and return a DataFrame."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
