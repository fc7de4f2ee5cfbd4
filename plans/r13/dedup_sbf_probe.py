"""Isolate dedup_sbf / dedup_sbf_check cost (r13 optimization probe).

Breaks the plan into stages and times each with the noop sink (guide
SS1.4), 3 reps, so the python-boundary cost of the SBF scan separates
from the exchange/sort below it and from the check's join above it.
Run on a quiet host; quote medians (this VM's single-thread speed swings
2-4x with hypervisor load — see the calibration stamp).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from flinkrunner_spark import get_spark  # noqa: E402
from flinkrunner_spark.plans import events as ev  # noqa: E402


def cal() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timeit(tag, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{tag:42s} {ts} median={statistics.median(ts)}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dedup-sbf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("cal_before:", cal())

    base = ev._events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    print("events rows:", base.count())

    from pyspark.sql import functions as F
    from flinkrunner_spark.operators.dedup import dedup_sbf

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.sparkContext.setJobDescription("scan only")
    timeit("scan only (noop)", lambda: noop(base))
    shuffled = base.repartition(n_part, "user_id", "event_type") \
        .sortWithinPartitions("ts", "event_id")
    spark.sparkContext.setJobDescription("scan+exchange+sort")
    timeit("scan+exchange+sort (noop)", lambda: noop(shuffled))
    full = dedup_sbf(base, ["user_id", "event_type"], ["ts", "event_id"]) \
        .select("user_id", "event_type", "event_id")
    spark.sparkContext.setJobDescription("dedup_sbf full")
    timeit("dedup_sbf (noop)", lambda: noop(full))
    timeit("dedup_sbf (count, as bench)", lambda: full.count())
    chk = ev.dedup_sbf_check(spark, sf_dir)
    spark.sparkContext.setJobDescription("dedup_sbf_check")
    timeit("dedup_sbf_check (count)", lambda: chk.count())
    print("cal_after:", cal())
    spark.stop()


if __name__ == "__main__":
    main()
