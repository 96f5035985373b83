"""End-to-end pipeline compositions — the engine's operators chained the
way a real deployment chains them. The reference is itself a pipeline
(consume → decode → validate → dedup → persist → account, SURVEY.md
§2.0 R1–R8); these are that shape as single declarative plans, which is
the point of the Spark-first rebuild: composition costs nothing, Catalyst
optimizes across stage boundaries (the quality filter pushes down into
the scan *through* the dedup and the rollup), and one plan scales from
60k fixture rows to a 100 TB corpus unchanged.

- pipeline_corpus_preprocess — the LLM-training-data curation path:
  quality gate → exact content dedup → per-document features → corpus
  rollup per (lang, source).
- pipeline_sensory_ingest — the reference's ingest path in batch form:
  validate/reject malformed → at-least-once dedup → category routing →
  dataset accounting manifest (counts + measure sums per category/day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import (
    fixed_point_sum,
    fixed_point_sum_sql,
    md5_prefix_int,
)


@register(
    "pipeline_corpus_preprocess",
    oracle="""
    WITH gated AS (
      SELECT doc_id, lang, source, n_chars, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE n_chars BETWEEN 80 AND 450 AND lang IN ('en', 'fr', 'es', 'de')
    ), deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM gated) t
      WHERE rn = 1
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens) AS chars_per_token,
           min(doc_id) AS first_doc_id
    FROM deduped
    GROUP BY lang, source
    """,
)
def pipeline_corpus_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation end-to-end: quality gate (length bounds + language
    whitelist — predicates push to the scan), exact dedup on content hash
    (deterministic keeper = min doc_id via WindowGroupLimit-eligible
    row_number), token features, and the per-(lang, source) corpus
    manifest. One plan, two shuffles total (dedup key, rollup key) —
    at 100 TB both are map-side-combined and AQE-coalesced."""
    d = load(spark, sf_dir, "documents")
    gated = d.filter(
        F.col("n_chars").between(80, 450) & F.col("lang").isin("en", "fr", "es", "de")
    ).withColumn("n_tokens", F.size(F.split("text", " ")).cast("bigint"))
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    return deduped.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_chars").cast("double") / F.sum("n_tokens")).alias("chars_per_token"),
        F.min("doc_id").alias("first_doc_id"),
    )


@register(
    "pipeline_sensory_ingest",
    oracle=f"""
    WITH validated AS (
      SELECT event_id, ts, user_id, event_type, value,
             TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL AND value >= 0
    ), deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
        FROM validated) t
      WHERE rn = 1
    )
    SELECT event_type AS category, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n_samples,
           {fixed_point_sum_sql("value", 6)} AS sum_value,
           count(prop_k) AS n_with_prop,
           count(DISTINCT user_id) AS n_users
    FROM deduped
    GROUP BY event_type, date_trunc('day', ts)
    """,
)
def pipeline_sensory_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ingest loop (R2 decode → R4 validate → R7 dedup →
    R5 category routing → R8 accounting) as one batch plan: JSON prop
    extraction with failure-safe cast, malformed-row rejection,
    at-least-once dedup on the message id, and the per-category/day
    training-dataset manifest. The streaming twin is
    streaming/streams.py; this is the backfill/repair form a production
    pipeline also needs (same semantics, same oracle)."""
    e = load(spark, sf_dir, "events")
    validated = (
        e.filter(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("value") >= 0)
        )
        # try_cast applies the same parse rule as the oracle's TRY_CAST
        # (signs, >9-digit overflow, non-integer forms all NULL on both
        # sides); try_to_number's format mask would diverge on those.
        .withColumn(
            "prop_k",
            F.get_json_object("props", "$.k").try_cast("int"),
        )
    )
    w = Window.partitionBy("event_id").orderBy("ts")
    deduped = (
        validated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    return deduped.groupBy(
        F.col("event_type").alias("category"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(
        F.count("*").alias("n_samples"),
        fixed_point_sum(F.col("value"), 6).alias("sum_value"),
        F.count("prop_k").alias("n_with_prop"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "pipeline_train_export",
    oracle="""
    WITH gated AS (
      SELECT doc_id, text, lang, source, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE n_chars BETWEEN 80 AND 500
    ), canon AS (
      SELECT *,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS canon_key
      FROM gated
    ), deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY canon_key ORDER BY doc_id) AS rn
        FROM canon) t
      WHERE rn = 1
    ), assigned AS (
      SELECT *,
             CASE
               WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 8
                 THEN 'train'
               WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 9
                 THEN 'val'
               ELSE 'test'
             END AS split
      FROM deduped
    )
    SELECT lang, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc_id,
           max(doc_id) AS last_doc_id
    FROM assigned
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def pipeline_train_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data export in ONE registered plan: quality gate
    (length bounds — pushed to the scan) → permutation-invariant
    canonical dedup (bag-of-words key, keep lowest doc_id) → deterministic
    content-keyed 80/10/10 split → per-(lang, split) manifest with token
    budgets. Three shuffles end-to-end (canon key, none for the split —
    it's a pure per-row expression — and the manifest rollup); every
    stage is the scale-shaped variant the standalone ops establish
    (md5-bucket split is partition-invariant, canon dedup costs one
    hash-agg like dedup_exact). This is the 'a reference user runs their
    entire preprocess here' capstone."""
    d = load(spark, sf_dir, "documents")
    gated = d.filter(F.col("n_chars").between(80, 500)).withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("bigint")
    )
    canon = gated.withColumn(
        "canon_key",
        F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")),
    )
    w = Window.partitionBy("canon_key").orderBy("doc_id")
    deduped = canon.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    bucket = F.pmod(
        md5_prefix_int(F.col("doc_id").cast("string"), salt="split"),
        F.lit(10),
    )
    assigned = deduped.withColumn(
        "split",
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test"),
    )
    return (
        assigned.groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )
