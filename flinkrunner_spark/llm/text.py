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


VOCAB_TOP_K = 100


def bigrams_col(toks: Column) -> Column:
    """Adjacent-token bigram array ('a b'); empty below two tokens."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def docs_topk_ngrams(
    spark: SparkSession, sf_dir: str, k: int = VOCAB_TOP_K
) -> DataFrame:
    """Corpus vocabulary: global top-k unigrams + bigrams by frequency —
    the term-inventory scan every tokenizer/vocab build starts from.

    Plan shape at 100 TB: explode → count is the canonical word-count —
    partial (map-side) aggregation combines within each task before the
    single shuffle on the term key, so shuffled bytes are O(distinct
    terms), not O(corpus tokens); the top-k is ``orderBy().limit(k)``,
    which Spark executes as TakeOrdered (per-partition heaps + a k-row
    driver merge — no global sort, no second shuffle). Ties are broken
    (n, ngram) so the cut is deterministic cross-engine."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(tokens_col().alias("toks"))
    uni = t.select(F.explode("toks").alias("ngram"), F.lit(1).alias("n"))
    bi = t.select(
        F.explode(bigrams_col(F.col("toks"))).alias("ngram"),
        F.lit(2).alias("n"),
    )
    return (
        uni.unionByName(bi)
        .groupBy("n", "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "n", "ngram")
        .limit(k)
    )


TFIDF_TOP = 3


def docs_tfidf(spark: SparkSession, sf_dir: str, top: int = TFIDF_TOP) -> DataFrame:
    """Top-``top`` characteristic terms per document by RATIONAL tf-idf:
    score = (tf / doc_tokens) · (n_docs / df) — the log-free form, so the
    score is a quotient of exact integers and bit-identical cross-engine
    (the repo-wide no-transcendentals rule; the log only compresses the
    range, it does not change per-document ranking order for fixed tf).

    Plan shape at 100 TB: one explode into ONE (doc, term) aggregation;
    per-doc token totals and per-term document frequencies are WINDOWS
    over that same tf frame (tf has one row per (doc, term), so
    ``count() over (partition by term)`` IS the document frequency) —
    no second aggregation, no joins: the whole query is one partial-agg
    shuffle plus three window exchanges (doc → term → doc), everything
    shuffled is (id, term, int) and the text column never survives the
    explode. n_docs arrives as a broadcast 1-row aggregate, not a driver
    ``.count()`` round-trip. Rank compares the ROUNDED score (then term)
    so the cut is deterministic at ulp level."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = docs.select(
        "doc_id", F.explode(tokens_col()).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    ndocs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w_doc = Window.partitionBy("doc_id")
    w_term = Window.partitionBy("term")
    score = F.round(
        (F.col("tf") / F.col("n_tok")) * (F.col("n_docs") / F.col("df")), 6
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        tf.withColumn("n_tok", F.sum("tf").over(w_doc))
        .withColumn("df", F.count(F.lit(1)).over(w_term))
        .crossJoin(F.broadcast(ndocs))
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top)
        .select("doc_id", "term", "tf", "df", "score", F.col("rk").cast("int").alias("rk"))
    )
