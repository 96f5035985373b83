"""§2.9 text-analysis operators for LLM-training-data pipelines
(SURVEY.md north star): tokenization, quality scoring, language-ID
heuristics, corpus stats, document fingerprinting.

Everything here is built-in-function Spark (JVM-side, codegen'd) — no
Python UDFs in these hot paths. At 100 TB these are embarrassingly
parallel scans + one aggregation each; the only shuffle is the final
group-by, with map-side partial aggregation shrinking it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register

# Constant upper bound for character-shingle generation: documents.text is
# 48..553 chars (FIXTURES.md). DuckDB can't lateral-join generate_series on
# a column expression, so both sides use a constant series + filter.
_MAX_LEN = 600


@register(
    "text_tokenize",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + corpus top-20 term counts
    (explode → count → top-k, tie-broken by token for determinism)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           CAST(list_max(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT)
             AS max_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting: whitespace tokens, regex (BPE-ish
    pre-tokenizer shape) tokens, distinct tokens, longest token."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("bigint").alias(
            "n_word_tokens"
        ),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.array_max(F.transform(toks, F.length)).cast("bigint").alias("max_token_len"),
    )


@register(
    "text_quality",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           n_chars * 1.0 / len(string_split(text, ' ')) AS chars_per_token
    FROM documents
    WHERE n_chars BETWEEN 100 AND 400
      AND lang IN ('en', 'fr', 'es')
      AND source <> 'src0'
      AND len(string_split(text, ' ')) >= 15
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter for training-data curation: length bounds, language
    whitelist, source blocklist, minimum token count, chars-per-token
    score. Pure predicate pushdown + projection — no shuffle at all."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    return (
        d.withColumn("n_tokens", n_tokens)
        .filter(
            F.col("n_chars").between(100, 400)
            & F.col("lang").isin("en", "fr", "es")
            & (F.col("source") != "src0")
            & (F.col("n_tokens") >= 15)
        )
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "n_tokens",
            (F.col("n_chars") * 1.0 / F.col("n_tokens")).alias("chars_per_token"),
        )
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language × per-source corpus statistics (integer sums are exact
    under any aggregation order)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_EN_MARKERS = ("the", "and", "of", "data", "query", "stream", "batch", "join")


@register(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang AS lang_labeled,
           CAST(len(list_filter(string_split(text, ' '),
                t -> t IN ({", ".join("'" + m + "'" for m in _EN_MARKERS)}))) AS BIGINT)
             AS marker_hits,
           CASE WHEN len(list_filter(string_split(text, ' '),
                t -> t IN ({", ".join("'" + m + "'" for m in _EN_MARKERS)}))) >= 3
                THEN 'en' ELSE 'und' END AS lang_pred
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (n-gram/stopword-list shape): count
    hits against an English marker lexicon, threshold to a prediction.
    A real deployment swaps the lexicon per language and takes argmax —
    same plan shape, still one scan, no shuffle."""
    d = load(spark, sf_dir, "documents")
    markers = list(_EN_MARKERS)
    hits = F.size(
        F.filter(F.split("text", " "), lambda t: t.isin(markers))
    ).cast("bigint")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        hits.alias("marker_hits"),
        F.when(hits >= 3, "en").otherwise("und").alias("lang_pred"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           min(md5(s)) AS fingerprint,
           count(DISTINCT s) AS n_shingles
    FROM (
      SELECT doc_id, substr(text, g.i, 8) AS s
      FROM documents, generate_series(1, {_MAX_LEN}) g(i)
      WHERE g.i <= length(text) - 7
    ) sh
    GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via rolling 8-char shingles: the min content
    hash per document (a 1-permutation MinHash — the winnowing/dedup
    primitive). md5 hex min is engine-portable; xxhash64 is the faster
    in-Spark choice at scale (fn_hash_native)."""
    d = load(spark, sf_dir, "documents")
    shingled = d.select(
        "doc_id",
        # Explicit empty-array branch for <8-char texts: Spark's sequence
        # auto-steps downward when stop < start (sequence(1,0) = [1,0]),
        # which would fabricate shingles the oracle's generate_series
        # never emits.
        F.explode(
            F.expr(
                "CASE WHEN length(text) >= 8 THEN"
                f" transform(sequence(1, least(length(text) - 7, {_MAX_LEN})),"
                " i -> substring(text, i, 8))"
                " ELSE array() END"
            )
        ).alias("s"),
    )
    return shingled.groupBy("doc_id").agg(
        F.min(F.md5("s")).alias("fingerprint"),
        F.countDistinct("s").alias("n_shingles"),
    )
