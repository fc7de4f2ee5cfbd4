from flinkrunner_spark.sinks.factory import sink_from_config

__all__ = ["sink_from_config"]
