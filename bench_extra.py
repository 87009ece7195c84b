"""Round-8 optimization harness (guide §1): per-query noop-sink timing and
plan capture, SEPARATE from the frozen bench.py.

Usage:
  python bench_extra.py [--sf DIR] [--repeat N] [--plans OUTDIR] [--queries a,b,c]
                        [--oracle-check] [--label TAG]

- Times each query with the noop sink (guide §1.4) at local[$SPARK_GRAFT_CPUS],
  interleaved passes, per-query min — same discipline as bench.py's query
  section but runnable per-query and at any SF.
- --plans DIR writes each query's .explain("formatted") to DIR/<name>.txt.
- --oracle-check additionally runs the DuckDB-oracle compare at the chosen SF
  (proof that an optimization did not change what the query computes).
Prints one JSON line {"sf":..., "queries": {name: sec}}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--queries", default=None, help="comma list; default = bench.py's BENCH_QUERIES")
    ap.add_argument("--oracle-check", action="store_true")
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from recidiviz_data_spark.operators import registry
    from recidiviz_data_spark.session import get_spark

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", app_name=f"bench_extra{args.label}")

    def q(name):
        fn = registry.QUERIES.get(name) or registry.EXTRA_QUERIES[name]
        return fn(spark, args.sf)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            buf = io.StringIO()
            with redirect_stdout(buf):
                q(name).explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(max(args.repeat, 1)):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            q(name).write.mode("overwrite").format("noop").save()
            samples[name].append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf": args.sf,
        "queries": {n: round(min(s), 3) for n, s in samples.items()},
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
    }
    print(json.dumps(out))

    if args.oracle_check:
        from recidiviz_data_spark.plans.contract_check import compare, duck_connection

        con = duck_connection(args.sf)
        oracles = dict(registry.ORACLES)
        oracles.update(registry.EXTRA_ORACLES)
        for name in names:
            if name not in oracles:
                print(f"ORACLE {name}: (none)")
                continue
            expected = con.execute(oracles[name]).df()
            compare(q(name), expected, name=name)
            print(f"ORACLE {name}: OK ({len(expected)} rows)")
        con.close()


if __name__ == "__main__":
    main()
