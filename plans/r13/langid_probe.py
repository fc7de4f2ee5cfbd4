"""Isolated cost probe for the NB langid projection (guide §1.4).

Times a noop write of lang_pred over a bounded, repartitioned slice of
documents so the interpreted higher-order-function cost is visible and
parallel (the raw table is one parquet file = one task).

Usage: python plans/r13/langid_probe.py [n_docs] [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from flinkrunner_spark.llm import text as T

docs = (
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .limit(N)
    .repartition(8)
    .localCheckpoint()
)
print(f"docs materialized: {docs.count()}")

cols = T.langid_ngram_cols()

for label, df in [
    ("lang_pred only", docs.select(cols["lang_pred"].alias("p"))),
    ("one nb_score", docs.select(cols["nb_score_de"].alias("s"))),
    (
        "full langid row (8 scores + pred)",
        docs.select(
            *[cols[f"nb_score_{l}"].alias(f"s_{l}") for l in T.LANGID_LANGS],
            cols["lang_pred"].alias("p"),
        ),
    ),
    (
        "two-phase full row",
        docs.select(cols["nb_scores_all"].alias("_nb")).select(
            *[
                T.langid_cols_from_scores()[f"nb_score_{l}"].alias(f"s_{l}")
                for l in T.LANGID_LANGS
            ],
            T.langid_cols_from_scores()["lang_pred"].alias("p"),
        ),
    ),
]:
    for r in range(REPS):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {label}: rep{r} {time.time()-t0:.2f}s")
spark.stop()
