from flinkrunner_spark.sources.factory import source_from_config

__all__ = ["source_from_config"]
