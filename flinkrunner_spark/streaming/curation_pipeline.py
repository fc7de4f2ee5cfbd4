"""COMPOSED streaming curation pipeline — the deployment shape a
training-data team actually runs, wired end-to-end from pieces that are
each individually driver-verified:

    kafka-native streaming source  (sources/kafka_datasource.py)
      → curation screens           (Gopher §A1.1 rules + C4 badwords —
                                    the exact expressions of
                                    llm/filters.py, parity-pinned by
                                    tests/test_curation_pipeline.py)
      → exact-dedup keeper         (stateful dropDuplicates on
                                    (lang, md5(text)) across
                                    micro-batches)
      → PII redaction              (llm/curation.pii_redact)
      → Iceberg streaming sink     (foreachBatch append with BATCH-ID
                                    IDEMPOTENCE: the batch id is stamped
                                    into table properties in the SAME
                                    metadata commit as the rows, so a
                                    replayed batch after a crash/restart
                                    detects the prior commit and no-ops
                                    — the exactly-once pattern the
                                    Iceberg spark-runtime uses)

Reference parity: the reference composes exactly this class of job from
`KafkaSourceConfig` → operators → `IcebergSinkConfig`
(`model/FlinkConfig` job wiring); per-stage parity lives with each
stage's own driver key — this module proves the COMPOSITION (interface
drift between stages is what per-key oracles cannot catch).

Determinism note for the oracle: streaming dedup keeps the FIRST
arrival, which is racy across kafka partitions — so the dedup key is
(lang, md5(text)) and every downstream aggregate derives only from
(lang, text): any representative of a duplicate group yields the same
profile. Keeper IDENTITY (min doc_id) is the batch operator
`docs_dedup_exact`'s contract, not this stream's.

Scale notes (100 TB): every screen is a zero-shuffle JVM projection;
the dedup state is O(distinct (lang, hash)) — bound it with a watermark
on the kafka timestamp in a long-running deployment (`withWatermark` +
dropDuplicatesWithinWatermark); the iceberg append writes one snapshot
per micro-batch (compact() periodically, as any streaming-ingest table
needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flinkrunner_spark.llm.filters import (
    BADWORDS,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    _gopher_stats_sql,
)
from flinkrunner_spark.llm.text import tokens_col


def gopher_keep_col(text: str = "text") -> Column:
    """The Gopher §A1.1 conjunctive keep as a reusable Column — the
    SAME constants and token inventory as `llm/filters.docs_gopher_rules`
    (parity pinned by test_curation_pipeline's row-equality check, and
    by the composed driver oracle). One tokenize pass: the stats struct
    is let-bound (see _gopher_stats_sql) and every bound compares O(1)
    struct fields — same ints, same comparisons, same keep."""
    return F.expr(
        f"transform(array({_gopher_stats_sql(text)}), s -> "
        f"s.n >= {GOPHER_MIN_WORDS} AND s.n <= {GOPHER_MAX_WORDS} "
        f"AND (s.c / s.n) >= {GOPHER_MIN_MEAN_WORD_LEN}D "
        f"AND (s.c / s.n) <= {GOPHER_MAX_MEAN_WORD_LEN}D "
        f"AND s.sh >= {GOPHER_MIN_STOPWORDS})[0]"
    )


def badwords_keep_col(text: str = "text") -> Column:
    """C4 blocklist keep (any hit drops the document) as a Column."""
    bad = F.array(*[F.lit(b) for b in BADWORDS])
    return (
        F.size(F.filter(tokens_col(text), lambda x: F.array_contains(bad, x)))
        == 0
    )


def curate_stream(
    parsed: DataFrame,
    dedup_within: str | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """screens → stateful exact-dedup → PII redact, over a (streaming or
    batch) frame with at least (text, lang, n_chars) columns. Returns
    (lang, h, n_chars, redacted).

    ``dedup_within`` (e.g. "24 hours") is the BOUNDED-STATE mode for a
    long-running deployment: watermark on ``ts_col`` (the kafka record
    timestamp) + ``dropDuplicatesWithinWatermark`` — dedup state is
    evicted past the horizon instead of growing O(distinct keys)
    forever. Within the horizon the semantics equal exact dedup; a
    duplicate arriving later than the horizon re-admits (the documented
    trade every watermarked dedup makes). Streaming-only; the default
    (None) keeps exact unbounded-state dedup — the driver-oracled
    contract."""
    from flinkrunner_spark.llm.curation import pii_redact

    kept = parsed.filter(gopher_keep_col() & badwords_keep_col())
    hashed = kept.withColumn("h", F.md5("text"))
    if dedup_within is not None:
        deduped = hashed.withWatermark(
            ts_col, dedup_within
        ).dropDuplicatesWithinWatermark(["lang", "h"])
    else:
        deduped = hashed.dropDuplicates(["lang", "h"])
    return pii_redact(deduped).select("lang", "h", "n_chars", "redacted")


class IcebergForeachBatchSink:
    """foreachBatch target: append each micro-batch to an Iceberg
    filesystem table with EXACTLY-ONCE idempotence. Spark guarantees
    foreachBatch at-least-once — after a crash the last batch replays
    with the same batch_id — so the sink stamps
    ``streaming.last-batch-id.<scope>`` into table properties in the
    SAME atomic metadata commit as the snapshot, and a replayed id ≤
    the stamp no-ops.

    The stamp MUST be scoped: Spark batch ids restart at 0 for every
    new checkpoint, so an unscoped stamp would make a table that
    outlives its checkpoint (or is shared by two queries) silently drop
    the new query's first batches as "replays". ``scope`` identifies
    the batch-id sequence — the checkpoint location is the natural key
    (the iceberg-spark runtime scopes its equivalent stamp by query id
    for the same reason); ``start_curation_to_iceberg`` derives it from
    the checkpoint path automatically.

    Upgrade note: tables stamped by the pre-scoping sink carry the
    UNSCOPED key, which this sink deliberately does not read — honoring
    it would reintroduce the silent-drop bug for any new query on the
    table (a fresh checkpoint's batch 0..N would match the old stamp).
    The cost is bounded and on the safe side: only a query that crashed
    with a pending replay EXACTLY at the upgrade boundary appends that
    one batch twice (at-least-once for one batch, never data loss)."""

    PROP = "streaming.last-batch-id"

    def __init__(
        self,
        location: str,
        partition_by: list | None = None,
        scope: str | None = None,
    ):
        self.location = location
        self.partition_by = partition_by
        self.prop = self.PROP + (f".{scope}" if scope else "")

    @staticmethod
    def scope_for_checkpoint(checkpoint: str) -> str:
        import hashlib

        return hashlib.md5(checkpoint.encode()).hexdigest()[:12]

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from flinkrunner_spark.iceberg import IcebergFsTable

        t = IcebergFsTable(self.location)
        if t.exists():
            last = t.metadata().get("properties", {}).get(self.prop)
            if last is not None and int(last) >= batch_id:
                return  # replayed batch — its rows are already committed
        t.append(
            batch_df,
            partition_by=self.partition_by,
            extra_properties={self.prop: batch_id},
        )


def start_curation_to_iceberg(
    stream: DataFrame,
    table_location: str,
    checkpoint: str,
    value_schema: str = (
        "doc_id long, text string, lang string, n_chars int"
    ),
    dedup_within: str | None = None,
):
    """Wire the full pipeline over a kafka-native stream frame and start
    it. Returns the StreamingQuery; the caller owns its lifecycle
    (processAllAvailable / stop / restart-on-same-checkpoint).
    ``dedup_within`` opts into watermark-bounded dedup state (see
    ``curate_stream``) using the kafka record timestamp."""
    parsed = stream.select(
        "timestamp",
        F.from_json(F.col("value").cast("string"), value_schema).alias("r"),
    ).select("timestamp", "r.*")
    curated = curate_stream(parsed, dedup_within=dedup_within)
    return (
        curated.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            IcebergForeachBatchSink(
                table_location,
                scope=IcebergForeachBatchSink.scope_for_checkpoint(
                    checkpoint
                ),
            )
        )
        .start()
    )
