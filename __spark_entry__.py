"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes one
callable per implemented operator from SURVEY.md §2 (plus the training-data
operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted
only for genuinely non-SQL-expressible ops, which get a rows-only check).

Implementations live in ``recidiviz_data_spark/operators/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue per region/nation
    through the full dimension-join chain (SURVEY §2.3 J3)."""
    from recidiviz_data_spark.operators.relational import j3_dim_join_revenue

    return j3_dim_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from recidiviz_data_spark.operators import registry

    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    from recidiviz_data_spark.operators import cdcops, registry

    # the cdc_* oracles read a deterministic generated changelog with DuckDB
    # read_parquet; materialize it now (pure pyarrow, no Spark) so the oracle
    # works even if it runs before the Spark query on a cold /tmp
    cdcops.ensure_changelogs()
    return dict(registry.ORACLES)
