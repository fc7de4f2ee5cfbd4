"""Shared-storage-aware scratch paths.

On local[N] every scratch location can live in /tmp, but on a real
cluster any path a DRIVER-side batch query will read back (index
snapshots, frozen reports) must sit on storage all executors share —
the same discipline as streaming checkpoint locations. This helper
threads that through configuration instead of hardcoding /tmp:

  1. ``spark.flinkrunner.scratchDir`` session conf (set per job, e.g.
     ``--conf spark.flinkrunner.scratchDir=hdfs:///tmp/flinkrunner``),
  2. ``FLINKRUNNER_SCRATCH_DIR`` environment variable,
  3. ``/tmp`` (the local-mode default — unchanged behavior).

The returned path is ``<base>/<name>`` with no filesystem calls made:
``df.write`` handles any Hadoop-supported scheme, so the base may be
hdfs://, s3a://, or a plain local directory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

SCRATCH_CONF_KEY = "spark.flinkrunner.scratchDir"
SCRATCH_ENV_KEY = "FLINKRUNNER_SCRATCH_DIR"


def scratch_dir(spark: SparkSession, name: str) -> str:
    """Resolve the scratch directory for ``name`` (conf > env > /tmp)."""
    base = None
    try:
        base = spark.conf.get(SCRATCH_CONF_KEY, None)
    except Exception:
        base = None
    if not base:
        base = os.environ.get(SCRATCH_ENV_KEY)
    if not base:
        base = "/tmp"
    return f"{base.rstrip('/')}/{name}"
