"""Construction/execution split for named queries (optimization-round
diagnostic; guide §1 + §7.3).  For each query: time plan CONSTRUCTION
(the Python call building the DataFrame — py4j + analysis) and
EXECUTION (noop write — optimization + codegen + run) separately,
N times each, after a sf0.001 warmup.

Usage: python scripts/split_time.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from gcp_cloudsql_airflow_bigquery_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    allq = entrymod.queries()
    spark = get_spark("split-time")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in names:
        fn = allq[n]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        cons, execu = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(round(t1 - t0, 3))
            execu.append(round(t2 - t1, 3))
        out[n] = {"construct": cons, "execute": execu}
        print(f"# {n}: construct {cons}  execute {execu}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
