"""recidiviz_data_spark — a brand-new PySpark-native CDC / incremental-ingest
engine with the query & data-processing capabilities of the reference repo
``msmeeseeks/recidiviz-data`` (see SURVEY.md), re-expressed Spark-first.

Layers
------
- ``gen``        deterministic changelog / table synthesis (FIXTURES.md §A)
- ``oracle``     DuckDB / pandas LWW-fold oracle for replay-equality tests
- ``tables``     "miniberg": Iceberg-style snapshot-committed Parquet tables
                 (atomic commits, time travel, schema evolution, watermarks)
- ``cdc``        the apply path: LWW dedup, salted repartition, bucket-pruned
                 copy-on-write MERGE, lineage metrics, checkpoint resume;
                 plus the snapshot differ (table-version diff -> changelog)
- ``operators``  relational / dedup / similarity / text / multimodal operators
                 exposed through the driver contract (__spark_entry__.py)
- ``functions``  vectorized token-array & hashing helpers (no per-row Python)
- ``sources``    changelog & file-format readers
- ``streaming``  micro-batch tailer (availableNow semantics) + structured
                 streaming demo with a foreachBatch exactly-once sink
"""

__version__ = "0.1.0"
