"""Local replica of the driver's correctness gate: run a contract query on
Spark and its oracle SQL on DuckDB over the same parquet tables, compare
row-count + columns + order-insensitive values (exact — the driver hashes)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>") else v
            )
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the class the driver's raw-value hash is
    sensitive to: int widths hash alike, but int-vs-float does NOT (verified
    round 1: DuckDB SUM(int)->HUGEINT->float64 vs Spark BIGINT hash-mismatched
    while int32-vs-int64 queries passed)."""
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def compare(spark_df, oracle_df: pd.DataFrame, *, name: str = "") -> None:
    a = _canon(spark_df.toPandas())
    b = _canon(oracle_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for col in a.columns:
        ka, kb = _kind(a[col].dtype), _kind(b[col].dtype)
        # dtype agreement, modulo int width: the driver hashes raw values, so
        # 6 (int64) vs 6.0 (float64) is a FAILURE even though values match.
        # object-dtype columns (strings, arrays, or int-with-nulls) are
        # compared value-by-value below instead.
        if "other" not in (ka, kb):
            assert ka == kb, f"{name}: col {col} dtype kind {ka} (spark) != {kb} (oracle)"
        for i in range(len(a)):
            x, y = a[col].iloc[i], b[col].iloc[i]
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            elif isinstance(x, float) or isinstance(y, float):
                # both floats (kind check above rejects int-vs-float columns;
                # object columns may still hold mixed scalars — flag those)
                ok = isinstance(x, float) == isinstance(y, float) and float(x) == float(y)
            else:
                ok = str(x) == str(y)
            assert ok, f"{name}: col {col} row {i}: spark={x!r} oracle={y!r}"
