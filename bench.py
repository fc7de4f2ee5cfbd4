"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "queries_warm": {name: sec}, "value_warm": sec,
"sf": ...}.

Each query is executed to completion with a count() action (materializes
the whole result without driver-side collection overhead).

Two passes per query set: COLD (first execution — pays plan compilation +
whole-stage codegen, the number comparable across rounds at ±3s noise) and
WARM (second execution — codegen/classloading amortized, the number that
tracks actual executed-plan cost round over round). Set
SPARK_GRAFT_BENCH_PASSES=1 to skip the warm pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from flinkrunner_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("flinkrunner-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen/parquet-footer paths so the first timed query
    # doesn't absorb session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    queries = entrymod.queries()

    def run_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        for name, fn in sorted(queries.items()):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
        return timings

    cold = run_pass()
    out = {
        "metric": "total_query_runtime",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "sf": sf,
    }
    if os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2") != "1":
        warm = run_pass()
        out["queries_warm"] = warm
        out["value_warm"] = round(sum(warm.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
