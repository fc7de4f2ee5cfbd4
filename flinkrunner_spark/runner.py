"""SparkRunner — the Spark analog of the reference's FlinkRunner
(reference FlinkRunner.scala): a config-driven application that maps job
names to StreamJob subclasses, wires config-declared sources/sinks, and
supports mocked edges for testing (reference model/CheckResults.scala).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flinkrunner_spark.config import RunnerConfig
from flinkrunner_spark.sinks import sink_from_config
from flinkrunner_spark.sources import source_from_config


class CheckResults:
    """Mock-edge test harness (reference model/CheckResults.scala).

    ``input_rows[source_name]`` replaces the configured source with inline
    rows (use ``input_schemas`` for explicit DDL schemas); transformed
    output is collected and handed to ``check_output`` instead of the
    configured sinks.
    """

    name = "check-results"
    collect_limit = 100_000

    def __init__(
        self,
        input_rows: dict[str, list] | None = None,
        input_schemas: dict[str, str] | None = None,
        check_output=None,
    ):
        self.input_rows = input_rows or {}
        self.input_schemas = input_schemas or {}
        self._check_output = check_output

    def check_output(self, rows: list) -> None:
        if self._check_output:
            self._check_output(rows)


class SparkRunner:
    """Subclass and override ``invoke`` (or pass a ``jobs`` registry dict)
    to route job names to job instances."""

    def __init__(
        self,
        config: RunnerConfig | dict,
        spark: SparkSession | None = None,
        check_results: CheckResults | None = None,
        jobs: dict | None = None,
    ):
        self.config = (
            config if isinstance(config, RunnerConfig) else RunnerConfig(config)
        )
        if spark is None:
            from flinkrunner_spark.session import get_spark

            spark = get_spark(self.config.system_name)
        self.spark = spark
        self.check_results = check_results
        self._jobs = jobs or {}
        self._sink_configs: dict[str, dict] = {}

    @property
    def mock_edges(self) -> bool:
        return self.check_results is not None

    def invoke(self, job_name: str):
        """Instantiate and run the named job (override for custom routing)."""
        if job_name not in self._jobs:
            raise KeyError(
                f"unknown job '{job_name}'; known: {sorted(self._jobs)}"
            )
        self.show_config()
        job_cls = self._jobs[job_name]
        return job_cls(self, job_name).run()

    def show_config(self) -> str | None:
        """Reference `model/ShowConfigOption.scala` + FlinkRunner.scala:
        131-136 — print the resolved config at startup when
        ``show.config`` is ``concise`` (one JSON line) or ``formatted``
        (indented); ``none``/absent prints nothing. Returns what was
        printed (for tests)."""
        import json as _json

        mode = str(
            self.config._config.get("show.config")  # literal key
            or self.config.get("show.config")  # dotted/env form
            or "none"
        ).lower()
        if mode == "none":
            return None
        if mode == "concise":
            out = _json.dumps(self.config._config, sort_keys=True, default=str)
        elif mode == "formatted":
            out = _json.dumps(
                self.config._config, sort_keys=True, indent=2, default=str
            )
        else:
            raise ValueError(
                f"show.config must be none|concise|formatted, got {mode!r}"
            )
        print(out)
        return out

    # -- source/sink wiring -------------------------------------------------
    def source_configs(self, job_name: str) -> dict:
        return {
            name: source_from_config(name, conf)
            for name, conf in self.config.sources(job_name).items()
        }

    def sink_configs(self, job_name: str) -> dict:
        # memoized per job: stateful sinks (MemorySinkConfig collects rows
        # onto the config object) must be the SAME objects the job wrote to
        if job_name not in self._sink_configs:
            self._sink_configs[job_name] = {
                name: sink_from_config(name, conf)
                for name, conf in self.config.sinks(job_name).items()
            }
        return self._sink_configs[job_name]

    def load_source(self, job_name: str, name: str) -> DataFrame:
        if self.mock_edges and name in self.check_results.input_rows:
            return self.spark.createDataFrame(
                self.check_results.input_rows[name],
                self.check_results.input_schemas.get(name),
            )
        sources = self.source_configs(job_name)
        if name not in sources:
            raise KeyError(
                f"job '{job_name}' has no source '{name}'; configured: "
                f"{sorted(sources)}"
            )
        return sources[name].load(self.spark)
