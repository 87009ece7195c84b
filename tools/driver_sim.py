"""Simulate the driver: fresh SparkSession with a NON-UTC timezone and default
configs (deliberately NOT our session.py), run every queries() entry against
its oracle_sql() on DuckDB at sf0.01 and compare like the driver does
(rows/schema/exact values). Run after clearing cached /tmp query state:

  rm -rf /tmp/rds_jsonsrc_* /tmp/rds_csvsrc_* /tmp/rds_pqexport_* \
         /tmp/rds_cdc_* /tmp/rds_events_stream_*
  python tools/driver_sim.py

Exit 0 = every registered query green under driver-like conditions."""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TZ"] = "America/Los_Angeles"
import time

time.tzset()

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.session.timeZone", "Australia/Eucla")  # +08:45, nasty
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as em
from recidiviz_data_spark.plans.contract_check import compare, duck_connection

SF = "/root/testdata/sf0.01"
Q, O = em.queries(), em.oracle_sql()
con = duck_connection(SF)
fails = []
for name, fn in Q.items():
    try:
        df = fn(spark, SF)
        if name in O:
            compare(df, con.execute(O[name]).df(), name=name)
            status = "green"
        else:
            n = df.count()
            status = f"rows-only n={n}"
            assert n >= 0
    except Exception as e:
        fails.append(name)
        status = f"FAIL {type(e).__name__}: {str(e)[:160]}"
        traceback.print_exc(limit=2)
    print(f"{name}: {status}", flush=True)

# entry smoke
df = em.entry(spark)
print("entry rows:", df.count(), flush=True)
print("FAILS:", fails)
sys.exit(1 if fails else 0)
