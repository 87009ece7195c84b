"""Replay oracle: single-pass LWW fold of a changelog via DuckDB
(FIXTURES.md §A4; analog of the reference's historical-snapshot expectation
tests, SURVEY.md §5.1). Independent of the Spark engine by construction.
"""

from __future__ import annotations

import duckdb
import pandas as pd


def _scan(changelog_dir: str) -> str:
    # union_by_name + hive partitioning: schema-evolved batches (added `lang`,
    # widened n_tok) read as one relation, exactly like the engine must.
    return (
        f"read_parquet('{changelog_dir}/batch_id=*/*.parquet', "
        "hive_partitioning=true, union_by_name=true)"
    )


def expected_state_sql(changelog_dir: str, upto_batch: int | None = None) -> str:
    where = "" if upto_batch is None else f"WHERE batch_id <= {upto_batch}"
    return f"""
        WITH log AS (SELECT * FROM {_scan(changelog_dir)} {where}),
        w AS (
          SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY event_seq DESC,
                               -- total-order tiebreak mirroring the engine's
                               -- max(struct(event_seq, op, payload...)): the
                               -- generator only emits bit-identical duplicate
                               -- (doc_id, event_seq) events, but the oracle
                               -- must not DEPEND on that
                               op DESC NULLS LAST, tokens DESC NULLS LAST,
                               n_tok DESC NULLS LAST, source DESC NULLS LAST
                    ) AS rn
          FROM log
        )
        SELECT doc_id,
               tokens,
               CAST(n_tok AS BIGINT) AS n_tok,
               source
        FROM w WHERE rn = 1 AND op <> 'D'
    """


def expected_state(changelog_dir: str, upto_batch: int | None = None) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        return con.execute(expected_state_sql(changelog_dir, upto_batch)).df()
    finally:
        con.close()


def expected_state_with_lang(changelog_dir: str, upto_batch: int | None = None) -> pd.DataFrame:
    where = "" if upto_batch is None else f"WHERE batch_id <= {upto_batch}"
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            WITH log AS (SELECT * FROM {_scan(changelog_dir)} {where}),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY event_seq DESC, op DESC NULLS LAST,
                             tokens DESC NULLS LAST, n_tok DESC NULLS LAST,
                             source DESC NULLS LAST,
                             -- lang included so the tiebreak is a TOTAL order
                             -- over every payload column, matching the
                             -- engine's struct(event_seq, op, *payload) max
                             lang DESC NULLS LAST) AS rn FROM log)
            SELECT doc_id, tokens, CAST(n_tok AS BIGINT) AS n_tok, source, lang
            FROM w WHERE rn = 1 AND op <> 'D'
            """
        ).df()
    finally:
        con.close()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort rows by doc_id, normalize token lists to python tuples of int."""
    out = df.copy()
    if "tokens" in out.columns:
        out["tokens"] = out["tokens"].map(
            lambda v: None if v is None else tuple(int(x) for x in v)
        )
    return out.sort_values("doc_id").reset_index(drop=True)[sorted(out.columns)]


def assert_state_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Per-row token-array equality (the BASELINE.json:15 invariant)."""
    a, e = canonical(actual), canonical(expected)
    assert list(a.columns) == list(e.columns), f"columns {a.columns} != {e.columns}"
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for col in a.columns:
        av, ev_ = a[col], e[col]
        neq = av.ne(ev_) & ~(av.isna() & ev_.isna())
        if neq.any():
            i = int(neq.idxmax())
            raise AssertionError(
                f"column {col} differs at row {i}: {av[i]!r} != {ev_[i]!r} "
                f"(doc_id={a['doc_id'][i]!r})"
            )
