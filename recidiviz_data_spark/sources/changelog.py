"""Changelog (WAL/binlog) source — SURVEY.md §2.1 S1/S8.

The changelog is an append-only, hive-partitioned Parquet tree
``root/batch_id=N/part-*.parquet``. Partition pruning on ``batch_id`` is the
"binlog seek": Spark reads only the requested batch directories (check the
plan: PartitionFilters on batch_id).

Schema across batches EVOLVES (added ``lang``, ``n_tok`` int32->int64); the
per-batch readers return the batch's own physical schema (the sink decides
how to evolve), while ``read_range(..., normalize=True)`` aligns everything
to the widest schema for whole-log consumers.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_COLS = ("event_seq", "op", "ts", "schema_ver", "batch_id")


def list_batches(changelog_dir: str) -> list[int]:
    out = []
    for p in glob.glob(os.path.join(changelog_dir, "batch_id=*")):
        m = re.match(r"batch_id=(\d+)$", os.path.basename(p))
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _schema_from_footer(batch_dir: str):
    """Batch schema from ONE parquet footer via pyarrow (driver-side, ~1ms).

    Spark's own parquet schema inference costs a full job round-trip
    (~1.3s measured) per read; the generator guarantees every file in one
    batch_id directory shares a physical schema (schema is decided per
    BATCH), so the first footer is authoritative. Returns None (fall back to
    Spark inference) for non-local paths or unreadable footers."""
    files = sorted(glob.glob(os.path.join(batch_dir, "*.parquet")))
    if not files:
        return None
    try:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        arrow = pq.ParquetFile(files[0]).schema_arrow
        try:
            # match Spark's reader: plain parquet timestamps load as NTZ
            return from_arrow_schema(arrow, prefer_timestamp_ntz=True)
        except TypeError:  # older pyspark without the kwarg
            return from_arrow_schema(arrow)
    except Exception:
        return None


def read_batch(spark: SparkSession, changelog_dir: str, batch_id: int) -> DataFrame:
    """One batch, its own physical schema, with batch_id attached."""
    bdir = os.path.join(changelog_dir, f"batch_id={batch_id}")
    schema = _schema_from_footer(bdir)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(bdir)
    return df.withColumn("batch_id", F.lit(batch_id).cast("long"))


def read_range(
    spark: SparkSession,
    changelog_dir: str,
    *,
    after: int = -1,
    upto: int | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Batches in (after, upto], aligned to the widest schema when normalize.

    Built on per-batch reads + unionByName(allowMissingColumns=True) because
    plain multi-dir parquet reads cannot widen int32->int64 across files.
    """
    ids = [b for b in list_batches(changelog_dir) if b > after and (upto is None or b <= upto)]
    if not ids:
        raise ValueError(f"no batches in ({after}, {upto}] under {changelog_dir}")
    parts = [read_batch(spark, changelog_dir, b) for b in ids]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    if normalize:
        if "lang" not in out.columns:
            out = out.withColumn("lang", F.lit(None).cast("string"))
        out = out.withColumn("n_tok", F.col("n_tok").cast("long"))
    return out


def payload_columns(df: DataFrame) -> list[str]:
    """Payload = everything that lands in the target table (key included)."""
    return [c for c in df.columns if c not in META_COLS]
