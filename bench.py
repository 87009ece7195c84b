"""Benchmark harness (SURVEY.md §7 M7). Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "cdc": {events, events_per_sec_n, events_per_sec_4n, events_per_sec_peak,
           scaling_efficiency, ...}}

Two parts:
1. CDC apply throughput + N -> 4N scaling — the BASELINE.json headline.
   The same generated changelog (default 12M events, Zipf-skewed,
   dups+deletes+stale) is replayed into a fresh miniberg table at local[1]
   (N) and local[4] (4N cores) with IDENTICAL shuffle partitioning;
   scaling efficiency = T_N / (4 * T_4N). The pair sits BELOW this VM's
   hyperthread boundary and shared-memory-bandwidth ceiling (a pure-CPU
   control scales 0.97 at 1->4 but only 0.72 at 8->32 here — see
   BENCH/BASELINE.md), so it measures the JOB's scaling rather than the
   box's: on a real N -> 4N EXECUTOR cluster each node adds its own memory
   bandwidth/disk/NIC, which a single box cannot. Peak throughput is
   additionally reported at local[$SPARK_GRAFT_CPUS].
2. Headline contract queries at $SPARK_GRAFT_SF_DIR (default sf0.1), each
   forced through a full materialization (noop sink); interleaved
   min-of-$RDS_BENCH_QUERY_REPEAT, same contention discipline as part 1.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, RDS_BENCH_EVENTS,
RDS_BENCH_BATCHES, RDS_BENCH_REPEAT, RDS_BENCH_SKIP_CDC=1 (queries only),
RDS_BENCH_SKIP_QUERIES=1.
NEVER run concurrently with other Spark sessions (host contention noise
up to 4x); the harness interleaves levels and takes per-level minima.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 12M events: measured round-3 probes — quiet tn 55.8 s, quiet 4N per-event
# throughput ~750k ev/s (t4n ~16 s) -> quiet efficiency ~0.87. A 20M variant
# was probed and REJECTED: its sublinear-scaling term grows with input
# (quiet pair 91 s / 26.7 s = 0.85), so bigger input buys no margin. The
# defense against contaminated samples is sampling (floor + per-level
# resampling below), not input size.
N_EVENTS = int(os.environ.get("RDS_BENCH_EVENTS", str(12_000_000)))
N_DOCS = max(N_EVENTS // 10, 1000)
# one big batch: the N->4N proxy needs the parallel fraction to dominate the
# per-batch driver-serial term (plan/commit ~2-3s); multi-batch apply behavior
# is covered by pytest + the verify recipe, throughput by this bulk shape
N_BATCHES = int(os.environ.get("RDS_BENCH_BATCHES", "1"))
SCALE_N = int(os.environ.get("RDS_BENCH_SCALE_N", "1"))  # N cores
SHUFFLE_P = 32  # identical at all parallelism levels (same plan, same data)
REPEAT = int(os.environ.get("RDS_BENCH_REPEAT", "2"))  # interleaved min-of-N
# host-contention guard: keep sampling the scale pair (up to this many extra
# rounds) while a level's MINIMUM is still improving or below the validity
# floor — noise-stability criteria on per-level timings, deliberately blind
# to the efficiency metric itself so stopping cannot bias the reported value
# (optional stopping on the metric would). Extra rounds resample ONLY the
# levels that still need it: a contaminated 4N retry costs ~17 s, so many
# retries fit the budget.
EXTRA_REPEAT = int(os.environ.get("RDS_BENCH_EXTRA_REPEAT", "8"))
STABLE_EPS = 0.02  # a new sample improving the prior min by <2% = stable
# the paired-median needs enough pairs to be a median: with a single valid
# pair it degenerates to that pair's ratio, and the validity floors only
# catch SLOW levels — a lucky-FAST N sample (page-cache warm-up, observed
# 51.8 s vs the 55.8 s quiet reference) then UNDERSTATES scaling with no
# flag raised. Keep sampling full (N, 4N) rounds until at least this many
# floor-valid pairs exist (budget permitting).
MIN_VALID_PAIRS = int(os.environ.get("RDS_BENCH_MIN_VALID_PAIRS", "3"))
# contamination floor: this engine demonstrably sustains ~750-770k events/s
# at local[4] on a quiet host (766k round 2 at 12M; 749k round 3 at 20M); a
# 4N minimum clearly below that means every 4N sample so far was taken
# under host contention — keep sampling (one-sided validity check on a
# single level's absolute throughput, still blind to the efficiency ratio,
# so it cannot cherry-pick the reported metric). Round 2's recorded miss
# (0.774) traces exactly to a 615k-contaminated 4N min that the old 350k
# floor waved through.
EXPECTED_4N_EPS_MIN = float(os.environ.get("RDS_BENCH_4N_EPS_MIN", "680000"))
# symmetric floor for the N level (quiet local[1] sustains ~215k ev/s): a
# contaminated SLOW tn would otherwise INFLATE the ratio — the validity
# check must guard both directions, not just the one that hurts the score
EXPECTED_N_EPS_MIN = float(os.environ.get("RDS_BENCH_N_EPS_MIN", "195000"))
# stop taking extra samples past this much total bench wall (stay inside any
# outer harness timeout even on a badly contended host)
TIME_BUDGET_SEC = float(os.environ.get("RDS_BENCH_TIME_BUDGET", "780"))
# query section: interleaved min-of-N, same contention discipline as the CDC
# section (round 2 printed a 12.3 s sample for a 1.5 s query)
QUERY_REPEAT = int(os.environ.get("RDS_BENCH_QUERY_REPEAT", "3"))
QUERY_TIME_BUDGET_SEC = float(os.environ.get("RDS_BENCH_QUERY_BUDGET", "240"))

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
    "d_simhash_banded",
    "e_ann_topk",
    "st_tumbling_daily",
    # round-3 training-pipeline ops (EXTRA registry; bench resolves both)
    "x_subword_bpe",
    "x_token_shard_packing",
]


def _fresh_session(master: str):
    from recidiviz_data_spark.session import get_spark, stop_spark

    stop_spark()
    return get_spark(master, shuffle_partitions=SHUFFLE_P, app_name=f"bench-{master}")


def _bench_changelog() -> str:
    from recidiviz_data_spark.gen import gen_changelog

    tag = f"{N_EVENTS}_{N_DOCS}_{N_BATCHES}"
    d = os.path.join("/tmp", f"rds_bench_cl_{tag}")
    if not os.path.exists(os.path.join(d, "_GEN_SUCCESS")):
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
    _t_start = time.monotonic()
    out: dict = {"metric": "cdc_apply_and_query_bench", "unit": "sec", "sf": SF_DIR}
    total = 0.0

    cdc: dict = {}
    if os.environ.get("RDS_BENCH_SKIP_CDC") != "1":
        changelog = _bench_changelog()
        _t_bench0 = time.monotonic()  # budget gates SAMPLING, not one-time gen
        lo, hi = SCALE_N, SCALE_N * 4
        # interleave ALL levels (N,4N,peak,N,4N,peak,...) and take per-level
        # min: this sandbox VM has large host-contention timing noise (a
        # single sample can be 4x off), and interleaving keeps environmental
        # drift from biasing one level
        levels = [lo, hi] + ([CPUS] if CPUS not in (lo, hi) else [])
        times: dict[int, list[float]] = {lv: [] for lv in levels}
        for _ in range(max(REPEAT, 1)):
            for lv in levels:
                if lv == CPUS and lv not in (lo, hi) and times[lv] and (
                    time.monotonic() - _t_bench0 > 0.7 * TIME_BUDGET_SEC
                ):
                    continue  # peak is informational — drop repeats when tight
                times[lv].append(_apply_run(f"local[{lv}]", changelog))
        def _stable(samples: list[float]) -> bool:
            if len(samples) < 2:
                return False  # one sample proves nothing — sample again
            *prior, last = samples
            return last >= min(prior) * (1 - STABLE_EPS)

        def _contaminated(level: int, floor: float) -> bool:
            return (
                N_EVENTS >= 4_000_000
                and N_EVENTS / min(times[level]) < floor
            )

        def _n_valid_pairs() -> int:
            return sum(
                1
                for a, b in zip(times[lo], times[hi])
                if N_EVENTS / a >= EXPECTED_N_EPS_MIN
                and N_EVENTS / b >= EXPECTED_4N_EPS_MIN
            )

        # the floors are calibrated for the full-size input only (same
        # threshold _contaminated uses) — tiny smoke benches skip the quota
        want_pairs = MIN_VALID_PAIRS if N_EVENTS >= 4_000_000 else 0
        for _ in range(EXTRA_REPEAT):
            need_lo = not _stable(times[lo]) or _contaminated(lo, EXPECTED_N_EPS_MIN)
            need_hi = not _stable(times[hi]) or _contaminated(hi, EXPECTED_4N_EPS_MIN)
            if not (need_lo or need_hi) and _n_valid_pairs() >= want_pairs:
                break
            if time.monotonic() - _t_bench0 > TIME_BUDGET_SEC:
                break
            # resample BOTH levels back-to-back whenever either needs it:
            # the efficiency estimator below is the median of PAIRED ratios
            # (adjacent lo/hi samples share host conditions, so common-mode
            # contention cancels in the ratio) — single-level retries would
            # leave pairs misaligned
            times[lo].append(_apply_run(f"local[{lo}]", changelog))
            times[hi].append(_apply_run(f"local[{hi}]", changelog))
        tn, t4n = min(times[lo]), min(times[hi])
        # efficiency estimator: MEDIAN of paired per-round ratios. Each
        # interleaved round measures lo and hi back-to-back, so a pair
        # shares host conditions and common-mode contention cancels in the
        # ratio; min(tn)/4*min(t4n) across INDEPENDENT samples, by
        # contrast, pairs one level's lucky outlier with the other level's
        # merely-typical sample (observed: a 52.1 s lo outlier against a
        # 16.5 s hi printed 0.789 on a config whose paired rounds measure
        # 0.85-0.92). Pairs where either side is below its validity floor
        # are excluded; if none qualify, fall back to the min-based ratio.
        paired = [
            (a, b)
            for a, b in zip(times[lo], times[hi])
            if N_EVENTS / a >= EXPECTED_N_EPS_MIN
            and N_EVENTS / b >= EXPECTED_4N_EPS_MIN
        ]
        if paired:
            eff = statistics.median(a / (4 * b) for a, b in paired)
        else:
            eff = tn / (4 * t4n)
        # transparency: the same paired-median over ALL rounds, floor
        # exclusions OFF — readers can see the exclusion's effect directly
        # (excluding slow-4N pairs can only raise the headline number)
        eff_all = statistics.median(
            a / (4 * b) for a, b in zip(times[lo], times[hi])
        )
        # peak = best observed throughput at ANY level (a single contended
        # local[CPUS] sample must not print a "peak" slower than 4N)
        t_peak = min(min(v) for v in times.values() if v)
        peak_level = min((min(v), lv) for lv, v in times.items() if v)[1]
        cdc = {
            "events": N_EVENTS,
            "batches": N_BATCHES,
            "scale_pair": [lo, hi],
            "apply_sec_n": round(tn, 3),
            "apply_sec_4n": round(t4n, 3),
            "peak_level": peak_level,
            "apply_sec_peak": round(t_peak, 3),
            "events_per_sec_n": round(N_EVENTS / tn, 1),
            "events_per_sec_4n": round(N_EVENTS / t4n, 1),
            "events_per_sec_peak": round(N_EVENTS / t_peak, 1),
            # N -> 4N scaling proxy: perfect scaling would give t4n = tn/4.
            # Median of paired (same-round) ratios — see comment above.
            "scaling_efficiency": round(eff, 3),
            "scaling_efficiency_min_based": round(tn / (4 * t4n), 3),
            "scaling_efficiency_all_pairs": round(eff_all, 3),
            "n_pairs_valid": len(paired),
            # per-level validity vs known-quiet floors: a false flag means
            # that level's minimum is still contention-degraded after the
            # sampling budget (slow N INFLATES the ratio, slow 4N deflates
            # it) — read the efficiency accordingly
            "n_level_quiet": N_EVENTS / tn >= EXPECTED_N_EPS_MIN,
            "4n_level_quiet": N_EVENTS / t4n >= EXPECTED_4N_EPS_MIN,
            "scaling_note": (
                f"pair local[{lo}]->local[{hi}] on identical input/partitioning: "
                "both levels sit below this single VM's hyperthread boundary and "
                "shared memory-bandwidth ceiling (pure-CPU control scales 0.97 at "
                "1->4 but 0.72 at 8->32 here), so the proxy measures the job's "
                "N->4N scaling rather than the box's saturation; peak throughput "
                f"reported separately at local[{CPUS}]. Full record in "
                "BENCH/BASELINE.md"
            ),
        }
        # value = wall actually spent, i.e. every sample taken (not just the
        # minima, and no phantom peak run when CPUS aliases a scale level)
        total += sum(sum(v) for v in times.values())
        out["cdc"] = cdc

    queries: dict[str, float] = {}
    if os.environ.get("RDS_BENCH_SKIP_QUERIES") != "1":
        spark = _fresh_session(f"local[{CPUS}]")
        from recidiviz_data_spark.operators import registry

        # interleaved passes over the whole list + per-query minima: a single
        # contended sample must never be the recorded number (pass 1 also
        # serves as warm-up for scan caches / codegen)
        qsamples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
        t_q0 = time.monotonic()
        for qpass in range(max(QUERY_REPEAT, 1)):
            if qpass > 0 and time.monotonic() - t_q0 > QUERY_TIME_BUDGET_SEC:
                break  # every query already has >=1 sample from pass 0
            for name in BENCH_QUERIES:
                fn = registry.QUERIES.get(name) or registry.EXTRA_QUERIES[name]
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                dt = time.monotonic() - t0
                qsamples[name].append(dt)
                total += dt
        queries = {n: round(min(s), 3) for n, s in qsamples.items()}
    out["queries"] = queries
    out["value"] = round(total, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
