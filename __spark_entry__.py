"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
correctness gate. Implementations live in flinkrunner_spark/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flinkrunner_spark.llm import bpe as llm_bpe  # noqa: E402
from flinkrunner_spark.llm import chunking, dsir, lm, pq  # noqa: E402
from flinkrunner_spark.llm import curation  # noqa: E402
from flinkrunner_spark.llm import filters as llm_filters  # noqa: E402
from flinkrunner_spark.llm import dedup as llm_dedup  # noqa: E402
from flinkrunner_spark.llm import mm_transforms, multimodal, pipeline, sampling, similarity  # noqa: E402
from flinkrunner_spark.llm import spans as llm_spans  # noqa: E402
from flinkrunner_spark.llm import vocab as llm_vocab  # noqa: E402
from flinkrunner_spark.llm import text as llm_text  # noqa: E402
from flinkrunner_spark.plans import analytics, connectors, docstreams, events  # noqa: E402
from flinkrunner_spark.plans.oracle_sql import ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return analytics.q1_pricing(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver verifies the FIRST 50 entries
    # (insertion order) of this dict each round. Round-7 rotation:
    # the NINE new keys first — third wave kinesis_efo_roundtrip (the
    # jar-free HTTP/2 SubscribeToShard transport), second wave
    # docs_chunk/docs_chunk_dedup/docs_lm_score/emb_knn_sq8 (exact
    # oracles) + emb_knn_pq (rows-only, trained codebooks), then the
    # first wave (iceberg_transform_roundtrip +
    # iceberg_transform_pruned — the full partition-transform set with
    # manifest pruning on transformed values — and
    # stream_curation_to_iceberg, the composed kafka→curation→dedup→
    # iceberg flagship with an exactly-once foreachBatch sink), then
    # every key whose implementation files changed since their r6
    # rows — the r7 diff touches iceberg.py (+iceberg_transforms.py,
    # iceberg_rest.py: transforms, partition-scoped position deletes,
    # extra_properties, warehouse mapping) → the whole iceberg family;
    # serde/__init__.py + serde/avro_codec.py (column-wise encode,
    # pre-bound field encoders) → the avro/kafka-avro keys;
    # util/kafka.py + sources/{kafka,kinesis}_datasource.py +
    # sinks/sources factories + testing.py (restart-cap fix, metadata
    # retry, expanded-topic subjects, kinesis LATEST pin, jar-option
    # parity, wall-clock loopback arrivals) → every connector
    # roundtrip; operators/graph.py (pointer-doubling fallback) →
    # docs_dup_clusters + docs_pipeline; streaming/pipelines.py
    # (column-wise as-of state refresh) → ALL 18 stream_* mirrors,
    # which route through run_to_memory there. That stale set is 43
    # keys; r6-green filler (similarity + bpe, files unchanged) pads to
    # exactly 50. The tail holds only keys whose files have ZERO
    # changed lines since their last green row:
    # llm/{text,dedup,curation,multimodal,vocab,sampling,filters,
    # spans,mm_transforms}.py, plans/{analytics,events,docstreams}.py
    # are byte-identical to their verified state (r7 additions live in
    # new modules: iceberg_transforms.py,
    # streaming/curation_pipeline.py, sf1_fixture.py).
    # Fourth-wave r7 changes (review fixes: h2 flow control/drains, EFO
    # resubscribe, scoped batch stamps, LATEST skew allowance; features:
    # kafka gzip codec + CreateTime stamping, iceberg refs + sort
    # orders, bounded-state dedup) touch ONLY
    # util/{h2,kafka}.py, sources/{factory,kinesis_datasource}.py,
    # sinks/factory.py, streaming/curation_pipeline.py, iceberg.py and
    # testing.py — every key those files serve is already inside this
    # cap (the connector families at 0-28 and the stream_* mirrors);
    # no past-cap key's implementation changed.
    return {
        # —— NEW this round (r7, second wave): chunking + bigram-LM
        # scoring + quantized ANN (llm/chunking.py, llm/lm.py,
        # llm/pq.py — new modules; emb_knn_pq is rows-only by design:
        # trained codebooks, numpy-mirror-tested) ——
        "kinesis_efo_roundtrip": connectors.kinesis_efo_roundtrip,
        "docs_chunk": chunking.docs_chunk,
        "docs_chunk_dedup": chunking.docs_chunk_dedup,
        "docs_lm_score": lm.docs_lm_score,
        "emb_knn_sq8": pq.emb_knn_sq8,
        "emb_knn_pq": pq.emb_knn_pq,
        # —— NEW this round (r7) ——
        "iceberg_transform_roundtrip": connectors.iceberg_transform_roundtrip,
        "iceberg_transform_pruned": connectors.iceberg_transform_pruned,
        "iceberg_spec_evolution_roundtrip": connectors.iceberg_spec_evolution_roundtrip,
        "stream_curation_to_iceberg": connectors.stream_curation_to_iceberg,
        # —— r6 ——
        "kafka_roundtrip": connectors.kafka_roundtrip,
        "stream_kafka_roundtrip": connectors.stream_kafka_roundtrip,
        "kafka_avro_roundtrip": connectors.kafka_avro_roundtrip,
        "kafka_glue_avro_roundtrip": connectors.kafka_glue_avro_roundtrip,
        "iceberg_delete_roundtrip": connectors.iceberg_delete_roundtrip,
        "rabbitmq_roundtrip": connectors.rabbitmq_roundtrip,
        "stream_rabbitmq_roundtrip": connectors.stream_rabbitmq_roundtrip,
        "iceberg_catalog_roundtrip": connectors.iceberg_catalog_roundtrip,
        "iceberg_glue_roundtrip": connectors.iceberg_glue_roundtrip,
        "cassandra_roundtrip": connectors.cassandra_roundtrip,
        "kinesis_roundtrip": connectors.kinesis_roundtrip,
        "stream_kinesis_roundtrip": connectors.stream_kinesis_roundtrip,
        "elasticsearch_roundtrip": connectors.elasticsearch_roundtrip,
        # —— plans/connectors.py changed (BIGINT oracle casts — the r5
        # verdict's top item; all seven re-verify) ——
        "iceberg_roundtrip": connectors.iceberg_roundtrip,
        "avro_roundtrip": connectors.avro_roundtrip,
        "jdbc_roundtrip": connectors.jdbc_roundtrip,
        "iceberg_pruned_scan": connectors.iceberg_pruned_scan,
        "iceberg_upsert_roundtrip": connectors.iceberg_upsert_roundtrip,
        "iceberg_incremental_roundtrip": connectors.iceberg_incremental_roundtrip,
        "iceberg_stream_roundtrip": connectors.iceberg_stream_roundtrip,
        # —— operators/graph.py changed (pointer-doubling fallback): CC
        # consumers re-verify ——
        "docs_dup_clusters": llm_dedup.docs_dup_clusters,
        "docs_pipeline": pipeline.docs_pipeline,
        # —— streaming/pipelines.py changed (column-wise as-of state
        # refresh): EVERY stream mirror routes through run_to_memory in
        # that file, so the whole family re-verifies in-cap ——
        "stream_dedup_first": events.stream_dedup_first,
        "stream_agg_basic": events.stream_agg_basic,
        "stream_agg_basic_update": events.stream_agg_basic_update,
        "stream_dedup_sbf_check": events.stream_dedup_sbf_check,
        "stream_dedup_sbf": events.stream_dedup_sbf,
        "stream_win_tumbling": events.stream_win_tumbling,
        "stream_win_session": events.stream_win_session,
        "stream_win_sliding": events.stream_win_sliding,
        "stream_win_ema": events.stream_win_ema,
        "stream_enrich": events.stream_enrich,
        "stream_hll_users": events.stream_hll_users,
        "stream_interval_join": events.stream_interval_join,
        "stream_filter_by_control": events.stream_filter_by_control,
        "stream_asof_join": events.stream_asof_join,
        "stream_win_tumbling_append": events.stream_win_tumbling_append,
        "stream_win_sliding_append": events.stream_win_sliding_append,
        "stream_win_session_append": events.stream_win_session_append,
        "stream_topk_ngrams": docstreams.stream_topk_ngrams,
        # —— NEW (r7, fourth wave): DSIR importance resampling
        # (llm/dsir.py — new module; takes the one remaining slack slot,
        # which previously held r6-green filler emb_knn) ——
        "docs_dsir_sample": dsir.docs_dsir_sample,
        # —— beyond the 50-row cap: zero changed lines since last green ——
        "emb_knn": similarity.emb_knn,
        "emb_dup_pairs_rhlsh": similarity.emb_dup_pairs_rhlsh,
        "docs_cluster_assign": similarity.docs_cluster_assign,
        "docs_bpe_encode": llm_bpe.docs_bpe_encode,
        "emb_dup_pairs": similarity.emb_dup_pairs,
        "emb_knn_ivf": similarity.emb_knn_ivf,
        "rhlsh_bucket_stats": similarity.rhlsh_bucket_stats,
        "emb_dup_pairs_blas": similarity.emb_dup_pairs_blas,
        "emb_knn_ivf_kmeans": similarity.emb_knn_ivf_kmeans,
        "emb_knn_join": similarity.emb_knn_join,
        "emb_knn_join_label": similarity.emb_knn_join_label,
        "docs_dup_spans": llm_spans.docs_dup_spans,
        "emb_semantic_dedup": similarity.emb_semantic_dedup,
        "emb_semantic_dedup_kmeans": similarity.emb_semantic_dedup_kmeans,
        "docs_topk_ngrams": llm_vocab.docs_topk_ngrams,
        "docs_tfidf": llm_vocab.docs_tfidf,
        "docs_stratified_sample": sampling.docs_stratified_sample,
        "docs_pack_sequences": sampling.docs_pack_sequences,
        "docs_gopher_rules": llm_filters.docs_gopher_rules,
        "docs_badwords": llm_filters.docs_badwords,
        "docs_shuffle_shards": sampling.docs_shuffle_shards,
        "docs_mixture_weights": sampling.docs_mixture_weights,
        "emb_decontaminate": similarity.emb_decontaminate,
        "ann_recall_stats": similarity.ann_recall_stats,
        "mm_features": mm_transforms.mm_features,
        "mm_resize": mm_transforms.mm_resize,
        "docs_decontaminate": curation.docs_decontaminate,
        "docs_pii_redact": curation.docs_pii_redact,
        "docs_repetition": curation.docs_repetition,
        "mm_meta": multimodal.mm_meta,
        "mm_frames": multimodal.mm_frames,
        "distinct_users": events.distinct_users,
        "hll_users": events.hll_users,
        "docs_dedup_exact": llm_dedup.docs_dedup_exact,
        "docs_minhash_lsh": llm_dedup.docs_minhash_lsh,
        "docs_ngram_jaccard": llm_dedup.docs_ngram_jaccard,
        "docs_simhash": llm_dedup.docs_simhash,
        "docs_lsh_stats": llm_dedup.lsh_bucket_stats,
        "docs_tokens": llm_text.docs_tokens,
        "docs_langid": llm_text.docs_langid,
        "docs_quality": llm_text.docs_quality,
        "docs_fingerprint": llm_text.docs_fingerprint,
        "docs_split": pipeline.docs_split,
        "dedup_sbf_check": events.dedup_sbf_check,
        "q1_pricing": analytics.q1_pricing,
        "q2_mincost": analytics.q2_mincost,
        "q3_shipping": analytics.q3_shipping,
        "q4_priority": analytics.q4_priority,
        "q5_supplier": analytics.q5_supplier,
        "q6_forecast": analytics.q6_forecast,
        "q7_volume": analytics.q7_volume,
        "q8_market": analytics.q8_market,
        "q9_profit": analytics.q9_profit,
        "q10_returned": analytics.q10_returned,
        "q11_important": analytics.q11_important,
        "q12_modes": analytics.q12_modes,
        "q13_custdist": analytics.q13_custdist,
        "q14_promo": analytics.q14_promo,
        "q15_topsupplier": analytics.q15_topsupplier,
        "q16_suppcnt": analytics.q16_suppcnt,
        "q17_smallqty": analytics.q17_smallqty,
        "q18_bigorders": analytics.q18_bigorders,
        "q19_brand": analytics.q19_brand,
        "q20_excess": analytics.q20_excess,
        "q21_waiting": analytics.q21_waiting,
        "q22_opportunity": analytics.q22_opportunity,
        "salted_supplier_rev": analytics.salted_supplier_rev,
        "topk_orders": analytics.topk_orders,
        "pivot_events": analytics.pivot_events,
        "rollup_sales": analytics.rollup_sales,
        "cube_sales": analytics.cube_sales,
        # §2.1 aggregates
        "agg_basic": events.agg_basic,
        "agg_percentage": events.agg_percentage,
        "agg_histogram": events.agg_histogram,
        "agg_ema": events.agg_ema,
        "agg_emvar": events.agg_emvar,
        "win_ema": events.win_ema,
        "win_tumbling": events.win_tumbling,
        "win_sliding": events.win_sliding,
        "win_session": events.win_session,
        # §2.2 stream operators (batch expressions)
        "dedup_first": events.dedup_first_q,
        "dedup_sbf": events.dedup_sbf_q,
        "filter_by_control": events.filter_by_control_q,
        "asof_join": events.asof_join_q,
        "enrich_events": events.enrich_events,
        "connected_union": events.connected_union,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each queries() key; keys absent here (dedup_sbf
    and friends — probabilistic/stateful) get the driver's rows-only
    check. hll_users IS exactly oracled: the md5-based register pipeline
    is deterministic and its float sums are order-independent."""
    return dict(ORACLES)
