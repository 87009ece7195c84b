"""Snapshot / compare exact query results across code changes (round-8
optimization safety net): writes each query's full result, sorted by all
columns, to parquet under --out; --compare re-runs and diffs cell-exactly.

Usage:
  python tools/result_snapshot.py --sf /root/testdata/sf1.0 --out /tmp/res_before
  python tools/result_snapshot.py --sf /root/testdata/sf1.0 --out /tmp/res_before --compare
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--compare", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import BENCH_QUERIES
    from recidiviz_data_spark.operators import registry
    from recidiviz_data_spark.session import get_spark

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", app_name="result_snapshot")
    os.makedirs(args.out, exist_ok=True)

    import pandas as pd

    bad = []
    for name in names:
        fn = registry.QUERIES.get(name) or registry.EXTRA_QUERIES[name]
        df = fn(spark, args.sf)
        pdf = df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)
        path = os.path.join(args.out, f"{name}.parquet")
        if not args.compare:
            pdf.to_parquet(path)
            print(f"SNAP {name}: {len(pdf)} rows")
        else:
            ref = pd.read_parquet(path)
            try:
                pd.testing.assert_frame_equal(pdf, ref, check_exact=True)
                print(f"SAME {name}: {len(pdf)} rows")
            except AssertionError as e:
                bad.append(name)
                print(f"DIFF {name}: {e}")
    if bad:
        sys.exit(f"MISMATCH: {bad}")


if __name__ == "__main__":
    main()
