"""Deterministic sampling / splitting / packing for training-data
pipelines (round-2 §2.10 additions).

A 100 TB corpus pipeline needs reproducible dataset carving: train/val/
test splits that never move a document between splits across reruns,
stratified downsampling with per-stratum rates, and packing documents
into fixed-budget sequences. Spark's ``randomSplit``/``sample`` are
seed-dependent on partitioning (a repartition reshuffles the sample), so
every operator here derives its randomness from a **content-keyed
portable hash** — the first 15 hex digits of md5 (60 bits, same trick as
dedup_simhash's oracle) — which both engines compute identically, making
the ops exactly oracle-checkable AND partition-invariant at any scale.

Scale notes:
- All three are pure map + one aggregate/window — no joins, no driver
  collects; the split/sample predicates push to the scan.
- pack_sequences packs per-``lang`` partition (window partitionBy), the
  shape that shards: a global pack order would serialize the window on
  one task. At 100 TB the partition key is the shard/curriculum key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register

_PACK_CAPACITY = 4096  # chars per packed sequence bin


def _bucket_sql(expr: str, salt: str, n: int) -> str:
    """DuckDB mirror of api.hash_bucket (the engine side moved to api.py
    in round 6)."""
    return f"('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, 15))::BIGINT % {n}"


@register(
    "split_train_val_test",
    oracle=f"""
    WITH b AS (
      SELECT n_chars, lang, {_bucket_sql('doc_id', 'split', 100)} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           count(DISTINCT lang) AS n_langs
    FROM b GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split keyed on hash(doc_id): a document's
    split assignment is a pure function of its id — stable under
    repartitioning, appends, and reruns (unlike randomSplit, whose
    assignment shifts with partitioning). One scan, one aggregate. Thin
    wrapper over api.hash_split (round 6)."""
    from dicebox_sensorybatchprocessor_spark import api

    d = api.hash_split(load(spark, sf_dir, "documents"))
    return d.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_bucket_sql('doc_id', 'strat', 100)} <
          CASE WHEN lang = 'en' THEN 50 ELSE 20 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling: keep 50% of 'en', 20% of
    every other language — the language-rebalancing step of corpus
    curation. The keep-predicate is a scan-pushed filter (no shuffle at
    all), and membership is reproducible row-wise, so incremental reruns
    over appended data never resample old rows (the property sampleBy's
    seeded-RNG-per-partition approach loses). Thin wrapper over
    api.stratified_sample (round 6)."""
    from dicebox_sensorybatchprocessor_spark import api

    d = load(spark, sf_dir, "documents")
    return api.stratified_sample(
        d, rates={"en": 0.5}, default_rate=0.2
    ).select("doc_id", "lang")


@register(
    "pack_sequences",
    oracle=f"""
    WITH pos AS (
      SELECT lang, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id, n_chars
                                ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
      FROM documents
    )
    SELECT lang, CAST(FLOOR(start_off / {_PACK_CAPACITY}) AS BIGINT) AS bin_id,
           count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM pos GROUP BY 1, 2
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents per language in doc_id
    order and chunk the stream into fixed-size bins; each document is
    assigned to the bin where it starts. This is the streaming-packing
    formulation used to build fixed-budget training sequences: one window
    (cumulative length) + one aggregate, linear, partitioned by ``lang``
    so no single task owns a global order — at 100 TB the partition key
    is the shard key and each shard packs independently. Thin wrapper
    over api.pack_sequences (round 6), which returns the row-level bin
    assignment this manifest rolls up."""
    from dicebox_sensorybatchprocessor_spark import api

    pos = api.pack_sequences(
        load(spark, sf_dir, "documents"), capacity=_PACK_CAPACITY
    )
    return pos.groupBy("lang", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "sample_cap_per_group",
    oracle="""
    SELECT doc_id, source,
           row_number() OVER (
             PARTITION BY source
             ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
           ) <= 30 AS keep
    FROM documents
    """,
)
def sample_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document budget: no source contributes more than 30
    docs; survivors are picked by a content-keyed md5 rank, so the cap
    is bit-reproducible under any partitioning/rerun, and under corpus
    APPENDS the relative order of existing rows never changes — new
    rows can displace old survivors at the cut line, but old rows never
    reshuffle among themselves (the failure mode of a rand()-ranked
    cap, where every rerun re-deals the whole sample). One window = one
    shuffle on the group key. Thin wrapper over api.cap_per_group
    (round 7)."""
    from dicebox_sensorybatchprocessor_spark import api

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    return api.cap_per_group(d, group_col="source", id_col="doc_id", k=30)


@register(
    "sample_priority",
    oracle="""
    WITH pri AS (
      SELECT doc_id, lang, n_chars,
             (n_chars * 1152921504606846976.0)
               / (('0x' || substr(md5('pri|' || CAST(doc_id AS VARCHAR)),
                                  1, 15))::BIGINT + 1) AS priority
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars, priority,
             row_number() OVER (PARTITION BY lang
                                ORDER BY priority DESC, doc_id ASC) AS rn
      FROM pri
    ),
    tau AS (
      SELECT lang, max(CASE WHEN rn = 31 THEN priority END) AS tau
      FROM ranked GROUP BY lang
    )
    SELECT r.doc_id, r.lang, r.n_chars,
           r.rn <= 30 AS keep,
           CASE WHEN r.rn <= 30
                THEN greatest(CAST(r.n_chars AS DOUBLE), coalesce(t.tau, 0.0))
                ELSE 0.0 END AS est_weight
    FROM ranked r LEFT JOIN tau t ON t.lang IS NOT DISTINCT FROM r.lang
    """,
)
def sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (r12) — Duffield–Lund–Thorup weighted top-k per
    language with the unbiased subset-sum estimator attached: 30 docs
    per lang drawn proportional-to-n_chars via md5-uniform priorities
    q = w/u, survivors carry ``max(w, τ)`` (τ = 31st priority) so any
    subset's estimator sum is unbiased for its true weight. The whole
    sampler is one per-group window; the priority is one exact double
    division, no libm, so Spark and DuckDB rank identically. See
    :func:`api.priority_sample` for the determinism contract. The
    oracle joins τ with ``LEFT JOIN … IS NOT DISTINCT FROM`` so a NULL
    lang group (a real window partition on the Spark side) neither
    drops its rows nor loses its own τ — a plain inner equi-join
    silently evaluates NULL = NULL to NULL (ADVICE r13 #2)."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.priority_sample(
        load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars"),
        weight_col="n_chars",
        group_col="lang",
        k=30,
    )
