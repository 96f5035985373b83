"""Corpus-maintenance operators for a continuously-growing training-data
lake: incremental (batch-vs-corpus) dedup, temperature-weighted source
mixing, and int8 embedding quantization.

These are the day-2 operations of a 100 TB pipeline — the first-ingest
ops live in :mod:`.dedup` / :mod:`.pipelines`:

- ``dedup_incremental``: every real corpus grows by deltas. Re-running
  all-pairs dedup over corpus+batch each day is O((N+b)²); the scale
  pattern is to keep the corpus's *fingerprints* (content hash + simhash
  bands — tiny next to the text) and join only the new batch against
  them: O(b × collisions). Both probes here are single equi-joins against
  precomputable fingerprint tables.
- ``corpus_sample_temperature``: multilingual / multi-source training
  mixes are rebalanced as w_s^(1/T) (Conneau & Lample-style temperature
  sampling). Deterministic content-keyed acceptance (md5-bucket uniform,
  same trick as operators/sampling.py) makes the sample reproducible
  under repartition and exactly oracle-checkable — no RNG state.
- ``emb_quantize_int8``: symmetric per-vector int8 quantization — the
  standard storage/ANN-memory reduction (4 B float → 1 B) — done entirely
  in JVM higher-order functions, with the reconstruction-error bound
  (max |v - q·scale| ≤ scale/2) emitted as a checked boolean claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.llm.dedup import _simhash_oracle, dedup_simhash
from dicebox_sensorybatchprocessor_spark.registry import register

# Deterministic 0..4 split bucket on doc_id (md5-keyed like
# operators/sampling.py — partition-invariant). Buckets 0-3 = the standing
# "corpus", bucket 4 = the incoming "batch" (~20%).
# conv() returns STRING; cast to bigint explicitly (like sampling.py's
# _bucket) so bucket arithmetic can never fall into string->DOUBLE
# coercion, where 60-bit values lose precision vs the oracle's exact
# BIGINT % 5.
_SPLIT_SPARK = (
    "pmod(cast(conv(substring(md5(concat('split|', cast(doc_id as string))), 1, 15),"
    " 16, 10) as bigint), 5)"
)
_SPLIT_DUCK = "('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5"


@register(
    "dedup_incremental",
    oracle=f"""
    WITH fp AS ({_simhash_oracle()}),
    tagged AS (
      SELECT d.doc_id, md5(d.text) AS content_key,
             {_SPLIT_DUCK.replace('doc_id', 'd.doc_id')} AS bucket,
             fp.band0, fp.band1, fp.band2, fp.band3
      FROM documents d JOIN fp ON fp.doc_id = d.doc_id
    ),
    bands AS (
      SELECT doc_id, bucket, content_key, 0 AS b, band0 AS k FROM tagged
      UNION ALL SELECT doc_id, bucket, content_key, 1, band1 FROM tagged
      UNION ALL SELECT doc_id, bucket, content_key, 2, band2 FROM tagged
      UNION ALL SELECT doc_id, bucket, content_key, 3, band3 FROM tagged
    ),
    batch AS (SELECT * FROM tagged WHERE bucket = 4),
    corpus_keys AS (SELECT DISTINCT content_key FROM tagged WHERE bucket < 4),
    corpus_bands AS (SELECT b, k, doc_id FROM bands WHERE bucket < 4),
    near AS (
      SELECT nb.doc_id, count(DISTINCT cb.doc_id) AS n_near_corpus
      FROM (SELECT doc_id, b, k FROM bands WHERE bucket = 4) nb
      JOIN corpus_bands cb ON cb.b = nb.b AND cb.k = nb.k
      GROUP BY nb.doc_id
    )
    SELECT batch.doc_id,
           batch.content_key IN (SELECT content_key FROM corpus_keys) AS is_exact_dup,
           COALESCE(near.n_near_corpus, CAST(0 AS BIGINT)) AS n_near_corpus
    FROM batch LEFT JOIN near ON near.doc_id = batch.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: probe only the NEW batch (deterministic 20%
    doc_id bucket) against the standing corpus's fingerprints — an exact
    content-hash semi-probe plus a simhash band-collision count. Neither
    probe touches corpus text: at scale the corpus side is a persisted
    (content_key) table and a (band, key, doc_id) table, both tiny and
    bucketable by their join key, so daily ingest cost is O(batch) with
    two broadcast-or-bucketed joins — the corpus is never re-read."""
    fp = dedup_simhash(spark, sf_dir)  # doc_id, simhash, band0..band3
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("content_key")
    )
    tagged = d.join(fp, "doc_id").withColumn("bucket", F.expr(_SPLIT_SPARK))
    bands = tagged.select(
        "doc_id",
        "bucket",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("k"))
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bucket", "bk.b", "bk.k")
    batch = tagged.filter(F.col("bucket") == 4)
    corpus_keys = (
        tagged.filter(F.col("bucket") < 4).select("content_key").distinct()
    )
    corpus_bands = bands.filter(F.col("bucket") < 4).select(
        "b", "k", F.col("doc_id").alias("c_doc")
    )
    batch_bands = bands.filter(F.col("bucket") == 4).select("doc_id", "b", "k")
    near = (
        batch_bands.join(corpus_bands, ["b", "k"])
        .groupBy("doc_id")
        .agg(F.count_distinct("c_doc").alias("n_near_corpus"))
    )
    exact = (
        batch.join(
            corpus_keys.withColumn("_hit", F.lit(True)), "content_key", "left"
        )
        .select("doc_id", F.coalesce("_hit", F.lit(False)).alias("is_exact_dup"))
    )
    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            "is_exact_dup",
            F.coalesce("n_near_corpus", F.lit(0).cast("bigint")).alias("n_near_corpus"),
        )
    )


# Temperature for source rebalancing: p_s ∝ w_s^(1/T); T=2 ⇒ sqrt —
# upweights low-resource sources. The acceptance rate is C/sqrt(w_s)
# capped at 1, with C chosen so the highest-share source keeps ~35%.
_TEMP_C = 0.35
# Uniform [0,1) from a 60-bit md5 prefix of the doc content key — content-
# keyed, so resampling after repartition/shuffle keeps the same docs.
# (Engine side lives in api.temperature_mix since round 6.)
_U_DUCK = (
    "('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    " / 1152921504606846976.0"
)


@register(
    "corpus_sample_temperature",
    oracle=f"""
    WITH shares AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             count(*) * 1.0 / (SELECT count(*) FROM documents) AS w
      FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n_docs,
             CASE WHEN {_TEMP_C} / sqrt(w) > 1.0 THEN 1.0 ELSE {_TEMP_C} / sqrt(w) END AS rate
      FROM shares
    )
    SELECT d.source, r.n_docs, r.rate,
           CAST(SUM(CASE WHEN {_U_DUCK} < r.rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r ON r.source = d.source
    GROUP BY d.source, r.n_docs, r.rate
    ORDER BY d.source
    """,
)
def corpus_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source rebalancing (T=2): per-source acceptance
    rate C/sqrt(w_s) capped at 1, applied via a deterministic content-keyed
    uniform — so low-share sources keep (nearly) everything and high-share
    sources are downsampled toward sqrt-proportional mixing. The rates
    table is a tiny broadcast join; the accept predicate is a pure
    per-row expression that pushes into the scan, and the whole sample is
    reproducible bit-for-bit under any partitioning. Thin wrapper over
    api.temperature_mix (round 6), which returns the row-level keep flag
    this rollup counts."""
    from dicebox_sensorybatchprocessor_spark import api

    mixed = api.temperature_mix(
        load(spark, sf_dir, "documents"), temperature=2.0, accept_c=_TEMP_C
    )
    return (
        mixed.groupBy("source", "n_docs", "rate")
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept")
        )
        .select("source", "n_docs", "rate", "n_kept")
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH flat AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings
    ),
    scales AS (
      SELECT vec_id, max(abs(v)) / 127.0 AS scale FROM flat GROUP BY vec_id
    ),
    err AS (
      SELECT f.vec_id, s.scale,
             max(abs(f.v - s.scale *
                 greatest(-127.0, least(127.0, floor(f.v / s.scale + 0.5))))) AS max_abs_err
      FROM flat f JOIN scales s ON s.vec_id = f.vec_id
      WHERE s.scale > 0
      GROUP BY f.vec_id, s.scale
    )
    SELECT vec_id, scale, max_abs_err,
           max_abs_err <= scale * 0.5000001 AS within_half_step
    FROM err
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v|/127,
    q_i = clamp(floor(v_i/scale + 0.5), ±127), entirely in JVM
    higher-order functions (zero Python). Emits the reconstruction bound
    max|v - q·scale| ≤ scale/2 as a checked boolean claim — TRUE is part
    of the value hash, so the driver's oracle gate asserts the
    quantizer's accuracy guarantee, not just its output shape.
    floor(x + 0.5) is used instead of round() because the two engines'
    round() tie-break conventions differ; floor is IEEE-identical. Thin
    wrapper over api.quantize_int8 (round 7), which also returns the
    quantized vectors themselves; this claim view keeps the
    hash-checkable scalar columns."""
    from dicebox_sensorybatchprocessor_spark import api

    out = api.quantize_int8(
        load(spark, sf_dir, "embeddings"), id_col="vec_id", vec_col="embedding"
    )
    return out.select("vec_id", "scale", "max_abs_err").withColumn(
        "within_half_step", F.col("max_abs_err") <= F.col("scale") * 0.5000001
    )


@register(
    "corpus_token_budget",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS t
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (SELECT CAST(sum(t) // 2 AS BIGINT) AS budget FROM toks),
    totals AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(t) AS BIGINT) AS total_tokens
      FROM toks GROUP BY source
    ),
    weighted AS (
      SELECT source, n_docs, total_tokens,
             CAST(floor(sqrt(CAST(total_tokens AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS w
      FROM totals
    ),
    tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM weighted),
    alloc AS (
      -- HUGEINT product mirrors Spark's DECIMAL(38,0): the int64
      -- product budget*w wraps at ~7e8 corpus tokens (ADVICE r14 #1)
      SELECT source, n_docs, total_tokens,
             CAST((CAST(b.budget AS HUGEINT) * w) // tw.tw AS BIGINT)
               AS alloc_tokens
      FROM weighted, b, tw
    ),
    cum AS (
      SELECT doc_id, source, t,
             sum(t) OVER (PARTITION BY source
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c
      FROM toks
    )
    SELECT a.source, a.n_docs, a.total_tokens, a.alloc_tokens,
           CAST(sum(CASE WHEN c.c <= a.alloc_tokens THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_selected,
           CAST(coalesce(sum(CASE WHEN c.c <= a.alloc_tokens THEN c.t END), 0)
                AS BIGINT) AS tokens_selected
    FROM cum c JOIN alloc a ON a.source = c.source
    GROUP BY 1, 2, 3, 4
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture allocation (r14) — the budgeter a training
    mix actually runs: HALF the corpus's total tokens are distributed
    across sources sqrt-proportionally to their token mass
    (temperature-2 mixing on TOKENS, the unit a run spends — the
    row-count counterpart is corpus_sample_temperature), and each
    source's share fills greedily in deterministic md5(doc_id) order.
    Every number is BIGINT-exact cross-engine: the only floating point
    is one correctly-rounded sqrt + one multiply per source, fixed-
    pointed immediately, and the greedy cut is an integer cumulative
    window — so the oracle value-checks the full allocation AND the
    realized per-source doc/token selection. Thin wrapper over
    api.token_budget_allocation; the budget constant (Σtokens // 2) is
    derived with one count-style action first, exactly as the oracle's
    ``b`` CTE derives it."""
    from dicebox_sensorybatchprocessor_spark import api

    d = load(spark, sf_dir, "documents")
    toks = d.filter(F.col("text").isNotNull()).select(
        F.size(F.split("text", " ")).cast("bigint").alias("t")
    )
    budget = int(toks.agg(F.sum("t")).first()[0] or 0) // 2
    return api.token_budget_allocation(d, budget_tokens=budget)
