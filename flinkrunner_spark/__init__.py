"""flinkrunner_spark — a PySpark-native analytics/stream engine with the
capabilities of epiphanous/flinkrunner (reference surveyed in SURVEY.md).

Everything here is expressed Spark-first: DataFrame/SQL logical plans that
Catalyst optimizes, Structured Streaming for unbounded inputs, and
Arrow-batched Pandas UDFs only where built-in operators cannot express the
semantics.
"""

from flinkrunner_spark.session import get_spark
from flinkrunner_spark.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]
__version__ = "0.1.0"
