"""Phase profile of jdbc_roundtrip (r13 verdict item 6: the slowest
key with no written examination). Splits the roundtrip into its three
phases — Derby DDL+insert write, spark-jdbc read-back, aggregate — and
times each over reps, so the bench row decomposes into sink floor vs
query work.

Usage: python plans/r14/jdbc_probe.py [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from flinkrunner_spark import get_spark  # noqa: E402


def main() -> None:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import hashlib
    import uuid

    from pyspark.sql import functions as F

    from flinkrunner_spark.plans import connectors as C
    from flinkrunner_spark.sinks.factory import sink_from_config

    spark = get_spark("jdbc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    app_tag = hashlib.md5(
        spark.sparkContext.applicationId.encode()
    ).hexdigest()[:10]
    db = C._loc(f"derby-{app_tag}", sf_dir)
    url = f"jdbc:derby:{db};create=true"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    n = docs.count()
    print(f"rows={n}")

    for r in range(reps):
        table = f"probe_rt_{uuid.uuid4().hex[:10]}"
        spark.sparkContext.setJobDescription(f"jdbc write rep{r}")
        t0 = time.perf_counter()
        sink_from_config(
            "rt",
            {
                "connector": "jdbc",
                "url": url,
                "table": table,
                "dialect": "derby",
                "create.table": True,
                "primary.key": "doc_id",
                "options": {"driver": driver},
            },
        ).write(docs)
        t_write = time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"jdbc readback rep{r}")
        t1 = time.perf_counter()
        back = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f'"{table}"')
            .option("driver", driver)
            .load()
        )
        nb = back.count()
        t_read = time.perf_counter() - t1

        spark.sparkContext.setJobDescription(f"jdbc agg rep{r}")
        t2 = time.perf_counter()
        agg = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        agg.write.format("noop").mode("overwrite").save()
        t_agg = time.perf_counter() - t2
        print(
            f"PROBE rep={r} write={t_write:.3f}s readback={t_read:.3f}s "
            f"(rows {nb}) agg_noop={t_agg:.3f}s"
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
