"""Build the sf1.0 validation fixture: /tmp/sf1 = 10x replication of
/root/testdata/sf0.1 with CONSISTENT key offsets (r6 verdict #2 — one
full-suite 10x pass to catch constants hiding at sf0.1).

Replication semantics:
* region/nation copy as-is (fixed dimensions — TPC-H keeps them constant
  across scale factors too);
* every other table unions K=10 replicas with ``replica * 10_000_000``
  added to each KEY column, the same offset applied to both sides of
  every foreign key (o_custkey moves with c_custkey, l_orderkey with
  o_orderkey, ...), so join cardinalities scale exactly 10x and no join
  ever crosses replicas;
* documents keep their text verbatim — a corpus with 10x exact
  duplication, the realistic dedup stress (same convention as
  scale_study.py); embeddings replicate verbatim as well, so pairwise
  similarity work scales ~100x by construction;
* events keep their time range (10x density per window — the realistic
  shape of a busier stream, and the harder case for window state).

Usage: python sf1_fixture.py  (idempotent — skips tables already built)
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_BENCH_PASSES=1 \\
       SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL_sf1.json python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flinkrunner_spark import get_spark  # noqa: E402
from flinkrunner_spark.tables import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/sf1"
FACTOR = 10
STRIDE = 10_000_000

# table -> key columns that shift per replica (both FK sides listed)
KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    for table, keys in KEYS.items():
        dst = os.path.join(OUT, f"{table}.parquet")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            print(f"{table}: exists, skipping")
            continue
        df = load_table(spark, BASE, table)
        if not keys:
            df.write.mode("overwrite").parquet(dst)
            print(f"{table}: copied as-is")
            continue
        out = None
        for i in range(FACTOR):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            out = rep if out is None else out.unionByName(rep)
        out.write.mode("overwrite").parquet(dst)
        print(f"{table}: {FACTOR}x replicated")


if __name__ == "__main__":
    spark = get_spark("sf1-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
