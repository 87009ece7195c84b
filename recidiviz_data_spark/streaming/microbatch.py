"""Streaming ingestion (SURVEY.md §2.7): two equivalent tailers.

1. ``ChangelogTailer`` — deterministic micro-batch loop over changelog
   ``batch_id`` partitions (availableNow semantics). This is the production
   path: batches are the WAL's own commit units, the manifest watermark is the
   checkpoint, replay is idempotent. The reference analog is the scrape-task
   queue worker draining its queue (SURVEY §2.1 S8).

2. ``stream_apply_available_now`` — genuine Structured Streaming
   (``readStream.parquet`` + ``foreachBatch`` -> miniberg MERGE), trigger
   availableNow, Spark checkpointLocation for source progress + the miniberg
   watermark for sink idempotency (the standard exactly-once foreachBatch
   recipe). Correct for ANY file->microbatch grouping because staleness is
   event_seq-based, not arrival-based.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from recidiviz_data_spark.cdc.apply import apply_batch, apply_batches
from recidiviz_data_spark.tables.miniberg import Miniberg


class ChangelogTailer:
    """Micro-batch tail of a changelog directory into a miniberg table."""

    def __init__(self, spark: SparkSession, table: Miniberg, changelog_dir: str, **apply_kw):
        self.spark = spark
        self.table = table
        self.changelog_dir = changelog_dir
        self.apply_kw = apply_kw

    def run_available(self) -> list[dict]:
        """Drain everything past the committed watermark (availableNow)."""
        return apply_batches(self.spark, self.table, self.changelog_dir, **self.apply_kw)

    @property
    def watermark(self) -> int:
        return self.table.manifest()["last_applied_batch"]


CHANGELOG_V1_SCHEMA = T.StructType(
    [
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("schema_ver", T.IntegerType(), True),
        T.StructField("batch_id", T.LongType(), True),
    ]
)


def stream_apply_available_now(
    spark: SparkSession,
    table: Miniberg,
    changelog_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 2,
    **apply_kw,
) -> None:
    """Structured-Streaming drive of the same MERGE: each source micro-batch
    is applied as one engine batch keyed past the current watermark; the
    sink's manifest watermark makes epoch replays no-ops (exactly-once)."""

    def sink(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        # idempotency key derived from the STREAM EPOCH, anchored to the
        # table's watermark at the stream's first commit (persisted in table
        # props): a replayed epoch after a crash between the miniberg commit
        # and the Spark checkpoint commit maps to the SAME batch_id, which the
        # watermark makes a clean no-op — true exactly-once, no duplicate
        # lineage, no double-advanced watermark.
        m = table.manifest()
        base = m["props"].get("stream_epoch_base")
        if base is None:
            base = m["last_applied_batch"] + 1 - epoch_id
        batch_id = base + epoch_id
        if batch_id <= m["last_applied_batch"]:
            return  # replayed epoch
        apply_batch(
            spark, table, batch_df.drop("batch_id"), batch_id,
            commit_props={"stream_epoch_base": base}, **apply_kw,
        )

    stream = (
        spark.readStream.schema(CHANGELOG_V1_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changelog_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
