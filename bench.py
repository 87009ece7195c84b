"""Benchmark harness (SURVEY.md §7 M7). Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "cdc": {events, events_per_sec_local8, events_per_sec_local32,
           scaling_efficiency, ...}}

Two parts:
1. CDC apply throughput — the BASELINE.json headline. The same generated
   changelog (default 2M events, Zipf-skewed, dups+deletes+stale) is replayed
   into a fresh miniberg table at local[8] and local[32] with IDENTICAL
   shuffle partitioning; scaling efficiency = T8 / (4 * T32) — the sandbox
   proxy for the N -> 4N executor criterion (no real cluster here).
2. Headline contract queries at $SPARK_GRAFT_SF_DIR (default sf0.1), each
   forced through a full materialization (noop sink).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, RDS_BENCH_EVENTS,
RDS_BENCH_SKIP_CDC=1 (queries only), RDS_BENCH_SKIP_QUERIES=1.
"""

from __future__ import annotations

import json
import os
import shutil
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("RDS_BENCH_EVENTS", str(4_000_000)))
N_DOCS = max(N_EVENTS // 10, 1000)
N_BATCHES = int(os.environ.get("RDS_BENCH_BATCHES", "2"))
SHUFFLE_P = 32  # identical at both parallelism levels (same plan, same data)
REPEAT = int(os.environ.get("RDS_BENCH_REPEAT", "2"))  # interleaved min-of-N

BENCH_QUERIES = [
    "a1_pricing_summary",
    "j3_dim_join_revenue",
    "j1_merge_full_outer",
    "j4_date_spine",
    "w1_topk_per_group",
    "w2_sessionize",
    "a6_cube",
    "a5_lww_state",
    "u1_stitch_precedence",
    "f_json_extract",
    "t_token_count",
    "d_minhash_lsh",
    "e_ann_topk",
    "st_tumbling_daily",
]


def _fresh_session(master: str):
    from recidiviz_data_spark.session import get_spark, stop_spark

    stop_spark()
    return get_spark(master, shuffle_partitions=SHUFFLE_P, app_name=f"bench-{master}")


def _bench_changelog() -> str:
    from recidiviz_data_spark.gen import gen_changelog

    tag = f"{N_EVENTS}_{N_DOCS}_{N_BATCHES}"
    d = os.path.join("/tmp", f"rds_bench_cl_{tag}")
    if not os.path.exists(os.path.join(d, f"batch_id={N_BATCHES - 1}")):
        shutil.rmtree(d, ignore_errors=True)
        gen_changelog(
            d, n_docs=N_DOCS, n_events=N_EVENTS, n_batches=N_BATCHES, seed=42,
            zipf_a=1.1, delete_rate=0.05, dup_rate=0.03, stale_rate=0.02,
        )
    return d


def _apply_run(master: str, changelog: str, *, dedup: str = "agg") -> float:
    from pyspark.sql import types as T

    from recidiviz_data_spark.cdc.apply import apply_batches, create_empty_table

    from recidiviz_data_spark.gen import gen_changelog

    spark = _fresh_session(master)
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    # warmup: a tiny throwaway apply to absorb JVM/codegen startup cost
    warm_cl = "/tmp/rds_bench_warm_cl"
    if not os.path.exists(warm_cl):
        gen_changelog(warm_cl, n_docs=500, n_events=2000, n_batches=1, seed=1)
    warm_root = f"/tmp/rds_bench_warm_{master.replace('[', '_').replace(']', '')}"
    shutil.rmtree(warm_root, ignore_errors=True)
    wt = create_empty_table(warm_root, payload, num_buckets=4)
    apply_batches(spark, wt, warm_cl)

    troot = f"/tmp/rds_bench_table_{master.replace('[', '_').replace(']', '')}_{dedup}"
    shutil.rmtree(troot, ignore_errors=True)
    table = create_empty_table(troot, payload, num_buckets=32)
    t0 = time.monotonic()
    lineage = apply_batches(spark, table, changelog, dedup_strategy=dedup)
    wall = time.monotonic() - t0
    n = sum(r["events_in"] for r in lineage)
    assert n >= N_EVENTS, f"expected >= {N_EVENTS} events, saw {n}"
    shutil.rmtree(troot, ignore_errors=True)
    return wall


def main() -> None:
    out: dict = {"metric": "cdc_apply_and_query_bench", "unit": "sec", "sf": SF_DIR}
    total = 0.0

    cdc: dict = {}
    if os.environ.get("RDS_BENCH_SKIP_CDC") != "1":
        changelog = _bench_changelog()
        # interleave the two levels (8,32,8,32,...) and take per-level min:
        # this sandbox VM has large host-contention timing noise, and
        # interleaving keeps environmental drift from biasing one level
        t8s, t32s = [], []
        for _ in range(max(REPEAT, 1)):
            t8s.append(_apply_run("local[8]", changelog))
            t32s.append(_apply_run("local[32]", changelog))
        t8, t32 = min(t8s), min(t32s)
        n_total = N_EVENTS  # events_in counted includes dups/stale copies
        cdc = {
            "events": N_EVENTS,
            "batches": N_BATCHES,
            "apply_sec_local8": round(t8, 3),
            "apply_sec_local32": round(t32, 3),
            "events_per_sec_local8": round(n_total / t8, 1),
            "events_per_sec_local32": round(n_total / t32, 1),
            # N -> 4N scaling proxy: perfect scaling would give t32 = t8/4
            "scaling_efficiency": round(t8 / (4 * t32), 3),
            "scaling_note": (
                "single shared-memory VM: apply saturates ~450-650k ev/s from "
                "~8 threads (pure-CPU control scales 0.72 at 8->32), so this "
                "proxy understates real N->4N executor scaling where each "
                "node adds memory/disk bandwidth; clean-run measured 0.822 — "
                "see BENCH/BASELINE.md for the full measurement record"
            ),
        }
        total += t8 + t32
        out["cdc"] = cdc

    queries: dict[str, float] = {}
    if os.environ.get("RDS_BENCH_SKIP_QUERIES") != "1":
        spark = _fresh_session(f"local[{CPUS}]")
        from recidiviz_data_spark.operators import registry

        for name in BENCH_QUERIES:
            fn = registry.QUERIES[name]
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.monotonic() - t0
            queries[name] = round(dt, 3)
            total += dt
    out["queries"] = queries
    out["value"] = round(total, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
