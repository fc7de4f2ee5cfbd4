"""Metrics (util/metrics.py): streaming listener aggregates micro-batch
progress; batch timing reports rows/sec."""

from __future__ import annotations

import time

from flinkrunner_spark.util.metrics import StreamMetrics, time_query


def test_time_query(spark):
    t = time_query(spark.range(1000))
    assert t.rows == 1000
    assert t.seconds > 0
    assert t.rows_per_sec > 0


def test_stream_metrics_listener(spark):
    m = StreamMetrics().attach(spark)
    try:
        df = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "500")
            .load()
        )
        q = (
            df.writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("append")
            .start()
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            s = m.by_name("metrics_probe")
            if s and s.input_rows > 0:
                break
            time.sleep(0.5)
        q.stop()
        s = m.by_name("metrics_probe")
        assert s is not None
        assert s.num_batches >= 1
        assert s.input_rows > 0
        assert s.avg_batch_ms >= 0
    finally:
        m.detach(spark)


def test_file_source_path_filter(spark, tmp_path):
    from flinkrunner_spark.sources.factory import FileSourceConfig

    spark.range(5).toDF("a").write.mode("overwrite").json(str(tmp_path / "keep.json"))
    spark.range(7).toDF("a").write.mode("overwrite").json(str(tmp_path / "skip.txt"))
    # move files into one dir with distinct extensions
    import shutil

    data = tmp_path / "data"
    data.mkdir()
    i = 0
    for sub, ext in [("keep.json", "json"), ("skip.txt", "txt")]:
        for f in (tmp_path / sub).glob("part-*"):
            shutil.copy(f, data / f"f{i}.{ext}")
            i += 1
    src = FileSourceConfig(
        "docs",
        {
            "connector": "file",
            "format": "json",
            "path": str(data),
            "path.filter": "*.json",
        },
    )
    assert src.load(spark).count() == 5
