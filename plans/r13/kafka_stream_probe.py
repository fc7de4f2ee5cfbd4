"""Phase profile of stream_kafka_roundtrip (guide §1): produce vs
stream-drain vs profile+collect, plus micro-batch breakdown from the
streaming query's recentProgress."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flinkrunner_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kafka-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from flinkrunner_spark.plans.connectors import (
        _ephemeral_ckpt,
        _lang_profile,
    )
    from flinkrunner_spark.sinks.factory import KafkaSinkConfig
    from flinkrunner_spark.sources.factory import KafkaSourceConfig
    from flinkrunner_spark.testing import LoopbackKafkaBroker
    import shutil

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    n_docs = docs.count()
    for rep in range(2):
        t0 = time.time()
        with LoopbackKafkaBroker(num_partitions=4) as broker:
            t1 = time.time()
            KafkaSinkConfig(
                "rt",
                {"connector": "kafka", "transport": "native",
                 "bootstrap.servers": f"localhost:{broker.port}",
                 "topic": "docs_stream_rt", "key.column": "doc_id"},
            ).write(docs)
            t2 = time.time()
            sdf = KafkaSourceConfig(
                "rt",
                {"connector": "kafka", "transport": "native",
                 "bootstrap.servers": f"localhost:{broker.port}",
                 "topic": "docs_stream_rt", "streaming": True,
                 "max.offsets.per.trigger": max(n_docs // 3, 64)},
            ).load(spark)
            t3 = time.time()
            _ck = _ephemeral_ckpt()
            q = (
                sdf.writeStream.format("memory")
                .queryName("q_probe_rt")
                .option("checkpointLocation", _ck)
                .start()
            )
            try:
                q.processAllAvailable()
                prog = [json.loads(p.json) for p in q.recentProgress]
            finally:
                q.stop()
                shutil.rmtree(_ck, ignore_errors=True)
            t4 = time.time()
            back = spark.sql("SELECT value FROM q_probe_rt")
            parsed = back.select(
                F.from_json(
                    F.col("value").cast("string"),
                    ("doc_id long, text string, lang string, "
                     "source string, n_chars int"),
                ).alias("r")
            ).select("r.*")
            profile = _lang_profile(parsed)
            rows = profile.collect()
            t5 = time.time()
        t6 = time.time()
        print(
            f"REP{rep} total={t6-t0:.2f} broker_up={t1-t0:.2f} "
            f"produce={t2-t1:.2f} source_build={t3-t2:.2f} "
            f"drain={t4-t3:.2f} profile_collect={t5-t4:.2f} "
            f"broker_down={t6-t5:.2f} rows={len(rows)}"
        )
        for p in prog:
            dd = p.get("durationMs", {})
            print(
                "  batch", p.get("batchId"),
                "rows", p.get("numInputRows"),
                "trigger", dd.get("triggerExecution"),
                "addBatch", dd.get("addBatch"),
                "latestOffset", dd.get("latestOffset"),
                "queryPlanning", dd.get("queryPlanning"),
                "commit", dd.get("commitOffsets"),
            )


if __name__ == "__main__":
    main()
