"""Plan-shape audit (guide §1/§7.2): dump .explain("formatted") for every
lazily-built queries() key (connectors and stream_* execute work at build
time and are audited separately), and summarize Exchange counts, join
strategies, Python-eval nodes and scan pushdown per key.

Usage: python plans/r13/plan_audit.py [outdir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from flinkrunner_spark import get_spark  # noqa: E402

# keys whose build function executes the heavy work eagerly (connector
# loopback roundtrips, streaming runs, selector collects) — the plan of
# the returned frame is not the cost; audited separately by measurement
EAGER = re.compile(
    r"roundtrip|^stream_|iceberg|^emb_outliers$|^docs_ccnet|^rhlsh_recall"
    r"|^ann_recall|kmeans|^emb_knn_pq$|^emb_knn_sq8$|^emb_knn$"
)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "plans", "r13", "audit"
    )
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("flinkrunner-spark-planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rows = []
    for key, fn in sorted(entrymod.queries().items()):
        if EAGER.search(key):
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{key}: BUILD ERROR {e}")
            continue
        with open(os.path.join(outdir, f"{key}.txt"), "w") as f:
            f.write(txt)
        n_ex = len(re.findall(r"\bExchange\b", txt))
        joins = sorted(
            set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", txt))
        )
        py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", txt)))
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", txt)
        rows.append((key, n_ex, ",".join(joins) or "-", ",".join(py) or "-"))
        print(
            f"{key:32s} exch={n_ex:2d} joins={','.join(joins) or '-':40s} "
            f"py={','.join(py) or '-'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
