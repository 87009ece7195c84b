"""CDC engine operators exposed through the driver contract.

``cdc_differ_opcounts`` is fully SQL-expressible (oracle-checked).
``cdc_apply_state`` and ``cdc_stream_state`` exercise the real engine
(miniberg MERGE / structured streaming) on a deterministic generated
changelog — not expressible over the oracle's fixed views, so they carry no
oracle_sql and get the driver's rows-only check; their correctness gate is
the pytest replay-equality suite.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from recidiviz_data_spark.operators.base import _q
from recidiviz_data_spark.operators.relational import load


def _old_new(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    old = d.filter("doc_id % 7 <> 0")
    new = d.filter("doc_id % 5 <> 0").withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(F.col("lang"))
    )
    return old, new


@_q(
    "cdc_differ_opcounts",
    """
    WITH old_v AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 7 <> 0),
         new_v AS (SELECT doc_id, text,
                          CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang
                   FROM documents WHERE doc_id % 5 <> 0)
    SELECT op, COUNT(*) AS n FROM (
      SELECT CASE WHEN o.doc_id IS NULL THEN 'I'
                  WHEN n.doc_id IS NULL THEN 'D'
                  WHEN o.text IS DISTINCT FROM n.text
                       OR o.lang IS DISTINCT FROM n.lang THEN 'U' END AS op
      FROM old_v o FULL OUTER JOIN new_v n ON o.doc_id = n.doc_id)
    WHERE op IS NOT NULL GROUP BY op
    """,
)
def cdc_differ_opcounts(spark, sf_dir):
    """The snapshot differ (engine module cdc/differ.py) run over two derived
    versions of documents: emitted I/U/D event counts."""
    from recidiviz_data_spark.cdc.differ import snapshot_diff

    old, new = _old_new(spark, sf_dir)
    ev = snapshot_diff(old, new, key="doc_id", payload_cols=["text", "lang"], snapshot_seq=1)
    return ev.groupBy("op").agg(F.count("*").alias("n"))


def _workdir(sf_dir: str, tag: str) -> str:
    h = hashlib.md5(f"{sf_dir}:{tag}".encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"rds_cdc_{tag}_{h}")


@_q("cdc_apply_state")  # rows-only: the engine itself is the system under test
def cdc_apply_state(spark, sf_dir):
    """End-to-end engine demo: generate a deterministic changelog (dups,
    deletes, stale replays, Zipf skew), MERGE it batch-by-batch into a
    miniberg table, return the final state aggregated per source."""
    from pyspark.sql import types as T

    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table
    from recidiviz_data_spark.gen import gen_changelog
    from recidiviz_data_spark.tables.miniberg import Miniberg

    wd = _workdir(sf_dir, "apply")
    cl = os.path.join(wd, "changelog")
    troot = os.path.join(wd, "table")
    if not os.path.exists(os.path.join(cl, "_GEN_SUCCESS")):
        # sentinel, not dir presence: an interrupted generation must never be
        # mistaken for a finished one (the table built on top would be wrong
        # forever, since later runs are idempotent no-ops)
        shutil.rmtree(cl, ignore_errors=True)
        gen_changelog(cl, n_docs=800, n_events=6000, n_batches=4, seed=7,
                      zipf_a=1.2, delete_rate=0.08, dup_rate=0.05, stale_rate=0.03)
    if Miniberg.exists(troot):
        table = Miniberg(troot)
    else:
        payload = T.StructType([
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ])
        table = create_empty_table(troot, payload, num_buckets=8)
    apply_batches(spark, table, cl)  # no-op if already applied (idempotent)
    return (
        table.read(spark)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum(F.col("n_tok").cast("long")).alias("total_tokens"))
    )


@_q("cdc_stream_state")  # rows-only: structured-streaming drive of the MERGE
def cdc_stream_state(spark, sf_dir):
    """Structured Streaming (availableNow + foreachBatch -> miniberg MERGE)
    over a v1-only changelog; returns the resulting table state summary."""
    from pyspark.sql import types as T

    from recidiviz_data_spark.cdc.apply import create_empty_table
    from recidiviz_data_spark.gen import gen_changelog
    from recidiviz_data_spark.streaming.microbatch import stream_apply_available_now
    from recidiviz_data_spark.tables.miniberg import Miniberg

    wd = _workdir(sf_dir, "stream")
    cl = os.path.join(wd, "changelog")
    troot = os.path.join(wd, "table")
    ckpt = os.path.join(wd, "ckpt")
    if not os.path.exists(os.path.join(cl, "_GEN_SUCCESS")):
        shutil.rmtree(cl, ignore_errors=True)
        gen_changelog(cl, n_docs=400, n_events=3000, n_batches=4, seed=11, delete_rate=0.1)
    if Miniberg.exists(troot):
        table = Miniberg(troot)
    else:
        payload = T.StructType([
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ])
        table = create_empty_table(troot, payload, num_buckets=4)
    stream_apply_available_now(spark, table, cl, ckpt, max_files_per_trigger=1)
    return (
        table.read(spark)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum(F.col("n_tok").cast("long")).alias("total_tokens"))
    )
