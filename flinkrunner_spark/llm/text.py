"""Text-analysis operators for LLM data pipelines over the ``documents``
table: tokenization, token counting, language-ID, quality scoring and
fingerprinting.

All expressions are built-in Column functions (JVM, whole-stage codegen) —
no Python in the hot path — and every formula avoids transcendental
functions in outputs so the DuckDB oracle sees bit-identical doubles
(+ * / over exact ints only).

At 100 TB these are embarrassingly parallel scans: no shuffle at all except
an optional final write partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Canonical tokenization: lowercase, split on non-alphanumeric runs.
TOKEN_SPLIT = "[^a-z0-9]+"
# BPE-ish pretokenizer: alphanumeric runs or single non-space symbols.
BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"

# Tiny deterministic stopword inventories per language (heuristic lang-ID).
LANG_STOPWORDS = {
    "de": ["der", "und", "die", "das", "ist"],
    "en": ["the", "and", "a", "of", "data"],
    "es": ["el", "la", "de", "los", "es"],
    "fr": ["le", "la", "et", "les", "un"],
    "zh": ["de", "le", "shi", "bu", "wo"],
}

ALL_STOPWORDS = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})


def tokens_col(text: str = "text") -> Column:
    toks = F.split(F.lower(F.col(text)), TOKEN_SPLIT)
    return F.filter(toks, lambda x: x != "")


def bpe_tokens_col(text: str = "text") -> Column:
    """BPE-ish pretoken count (shared by docs_tokens and the fused
    docs_pipeline projection)."""
    return F.size(F.regexp_extract_all(F.lower(F.col(text)), F.lit(BPE_RE), 0))


def docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish pretokens + chars."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        bpe_tokens_col().alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def _lang_scores(toks: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_pred_col(toks: Column | None = None) -> Column:
    """Language prediction expression: stopword votes, argmax with
    lexicographic tiebreak (deterministic). Shared by docs_langid and
    the fused docs_pipeline projection."""
    toks = tokens_col() if toks is None else toks
    scores = _lang_scores(toks)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return pred


def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: stopword votes per language, argmax with
    lexicographic tiebreak (deterministic)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_col()
    scores = _lang_scores(toks)
    pred = lang_pred_col(toks)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        *[scores[lang].alias(f"votes_{lang}") for lang in sorted(LANG_STOPWORDS)],
        pred.alias("lang_pred"),
    )


def quality_score_col(toks: Column | None = None) -> Column:
    """Composite quality score expression (rational arithmetic only —
    engine-exact). Shared by docs_quality and the fused docs_pipeline
    projection."""
    toks = tokens_col() if toks is None else toks
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    punct = F.length(F.regexp_replace(F.lower(F.col("text")), "[a-z0-9\\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*ALL_STOPWORDS)))
    return (
        (stop_hits / n_tok) * F.lit(2.0)
        + F.lit(1.0) / (F.lit(1.0) + (punct / F.length("text")) * F.lit(5.0))
        + (tok_chars / n_tok) / F.lit(10.0)
    )


def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword signals and a rational
    composite score (no transcendentals → engine-exact)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_col()
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    punct = F.length(F.regexp_replace(F.lower(F.col("text")), "[a-z0-9\\s]", ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*ALL_STOPWORDS)))
    avg_tok_len = tok_chars / n_tok
    punct_ratio = punct / F.length("text")
    stop_ratio = stop_hits / n_tok
    score = quality_score_col(toks)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        avg_tok_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the normalized token stream (the
    batch analog of a rolling-hash signature)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.md5(F.array_join(tokens_col(), " ")).alias("fingerprint"),
    )
