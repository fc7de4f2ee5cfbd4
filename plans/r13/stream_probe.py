"""Streaming micro-batch cost breakdown (guide §1: measure first).

Usage: python plans/r13/stream_probe.py stream_key [stream_key...]

Monkeypatches streaming.pipelines.run_to_memory / run_updates_final to
capture every micro-batch's durationMs breakdown (triggerExecution,
queryPlanning, addBatch, getBatch, walCommit, commitOffsets,
stateOperators commit times) so the per-batch overhead is attributable.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from flinkrunner_spark import get_spark  # noqa: E402
from flinkrunner_spark.streaming import pipelines as P  # noqa: E402


def describe(q, label):
    for p in q.recentProgress:
        d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
        pj = p if isinstance(p, dict) else json.loads(p.json)
        rows = pj.get("numInputRows")
        so = [
            {
                "commitMs": s.get("commitTimeMs"),
                "rows": s.get("numRowsTotal"),
                "mem": s.get("memoryUsedBytes"),
            }
            for s in pj.get("stateOperators", [])
        ]
        print(f"  [{label}] batch={pj['batchId']} rows={rows} dur={d} state={so}")


_orig_rtm = P.run_to_memory
_orig_ruf = P.run_updates_final


def rtm(spark, df, name, mode="append", state_partitions=4):
    import shutil

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    ckpt = P.ephemeral_checkpoint()
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        describe(q, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.sql(f"SELECT * FROM {name}")


P.run_to_memory = rtm


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("flinkrunner-spark-streamprobe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # streaming engine warmup (mirrors bench.py)
    import shutil
    import tempfile

    warm_dir = tempfile.mkdtemp(prefix="probe-stream-warm-")
    try:
        spark.range(10).write.mode("overwrite").parquet(warm_dir + "/in")
        wq = (
            spark.readStream.schema("id long")
            .parquet(warm_dir + "/in")
            .writeStream.format("memory")
            .queryName("_probe_stream_warm")
            .option("checkpointLocation", warm_dir + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        wq.awaitTermination(60)
        wq.stop()
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    queries = entrymod.queries()
    for key in sys.argv[1:]:
        t0 = time.perf_counter()
        n = queries[key](spark, sf_dir).count()
        print(f"PROBE {key} total={time.perf_counter()-t0:.3f}s rows={n}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
