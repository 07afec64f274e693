"""Targeted min-of-N timing for named queries (optimization-round
iteration tool; the standing protocol stays bench.py's best-of-2 full
run).

Usage:
    python scripts/bench_some.py q1 q2 ...            # min-of-3 at sf0.1
    SPARK_GRAFT_RUNS=5 python scripts/bench_some.py q1
    SPARK_GRAFT_PLAN_DIR=plans/r10 SPARK_GRAFT_PLAN_TAG=before \
        python scripts/bench_some.py q1               # also dump explain

Each query is warmed once at sf0.001 (JIT/codegen), then timed
SPARK_GRAFT_RUNS times into the noop sink at $SPARK_GRAFT_SF_DIR.
Prints one JSON line {"queries": {name: min_sec}, "all_runs": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, ROTATION_SAMPLE  # noqa: E402
from gcp_cloudsql_airflow_bigquery_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR")
    plan_tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "plan")
    registry = {}
    for n, reg in HEADLINE + ROTATION_SAMPLE:
        registry[n] = reg
    missing = [n for n in names if n not in registry]
    if missing:
        # fall back to the full query registry for unbenched slots
        import __spark_entry__ as entrymod

        allq = entrymod.queries()
        for n in missing:
            if n not in allq:
                raise KeyError(f"unknown query {n!r}")
            registry[n] = allq

    spark = get_spark("bench-some")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for n in names:
        fn = registry[n][n]
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{n}_{plan_tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        ts = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{n}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[n] = min(ts)
        all_runs[n] = ts
        print(f"# {n}: min {min(ts)}  runs {ts}", file=sys.stderr)
    print(json.dumps({"queries": out, "all_runs": all_runs,
                      "sf_dir": sf_dir, "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
