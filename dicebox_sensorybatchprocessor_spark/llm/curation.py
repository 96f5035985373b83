"""Corpus-curation operators (round-4 §2.10 additions): benchmark
decontamination, repetition-quality filtering, payload redaction,
deterministic random-projection dimensionality reduction, and
semantically-bucketed embedding dedup.

These complete the LLM-training-data story (SURVEY.md north star,
`BASELINE.json:6`) begun in :mod:`.dedup` / :mod:`.corpus`:

- ``decontaminate_ngram``: before training, documents overlapping the
  evaluation/benchmark suite must be removed (n-gram decontamination à
  la GPT-3 appendix C / PaLM). The benchmark side is tiny by definition
  (a test suite, not a corpus), so at 100 TB the n-gram set broadcasts
  and the probe is a map-side hash lookup — the corpus is scanned once,
  never self-joined.
- ``text_repetition_filter``: Gopher-style repetition signals
  (top-token fraction, duplicate-bigram fraction) — the standard
  heuristics for machine-generated/boilerplate text. Pure per-document
  map + one keyed aggregate.
- ``events_pii_scrub``: redaction of numeric identifiers from
  semi-structured payloads before payloads enter a training corpus —
  masked-shape cardinality shows what the payload space looks like
  after scrubbing. Single scan, one aggregate.
- ``emb_dim_reduce_rp``: signed random projection (Achlioptas-style
  ±1 matrix) from 64 to 16 dims. The sign matrix is derived from md5 on
  both engines (no RNG state, no literal matrix), and the fold is
  strictly left-to-right on both sides, so the projected doubles are
  BIT-IDENTICAL cross-engine — no rounding tolerance anywhere.
- ``dedup_semantic_buckets``: SemDeDup-shaped semantic dedup — coarse
  semantic buckets (the sign pattern of the first 3 random projections)
  gate an exact within-bucket cosine check, so the quadratic pair scan
  is confined to buckets (~N²/2^b pairs instead of N²/2). The bucketing
  is the same deterministic projection, so the whole op is exactly
  oracle-checkable, unlike centroid-private KMeans clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import fan_out_scan

# Deterministic benchmark membership: ~1/29 of documents (md5-keyed like
# operators/sampling.py — partition-invariant, append-stable).
_BENCH_SPARK = (
    "pmod(cast(conv(substring(md5(concat('bench|', cast(doc_id as string))), 1, 15),"
    " 16, 10) as bigint), 29) = 0"
)
_BENCH_DUCK = "('0x' || substr(md5('bench|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 29 = 0"

# Constant series bound for DuckDB n-gram generation (documents.text is
# 48..553 chars — ≤ 600 tokens; same trick as llm/text.py's _MAX_LEN).
_MAX_TOKS = 600


def _word_ngrams(toks, n: int):
    """Word n-grams as an array column — see api.word_ngrams (the public
    df-level form this module shares)."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.word_ngrams(toks, n)


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ng AS (
      SELECT DISTINCT doc_id, array_to_string(t[g.i:g.i+2], ' ') AS ngram
      FROM toks, generate_series(1, {_MAX_TOKS}) g(i)
      WHERE g.i <= len(t) - 2
    ),
    tag AS (SELECT doc_id, ngram, {_BENCH_DUCK} AS is_bench FROM ng),
    bench AS (SELECT DISTINCT ngram FROM tag WHERE is_bench),
    eval AS (SELECT doc_id, ngram FROM tag WHERE NOT is_bench),
    sizes AS (SELECT doc_id, count(*) AS n_ngrams FROM eval GROUP BY doc_id),
    hits AS (
      SELECT e.doc_id, count(*) AS n_hits
      FROM eval e JOIN bench USING (ngram) GROUP BY e.doc_id
    )
    SELECT h.doc_id, n_hits, n_ngrams,
           n_hits * 1.0 / n_ngrams AS contamination
    FROM hits h JOIN sizes s USING (doc_id)
    """,
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every corpus document sharing at
    least one word 3-gram with the benchmark set (a deterministic ~3.4%
    doc_id bucket standing in for the eval suite). Output: the
    contaminated docs with hit counts and the contaminated fraction of
    their distinct n-grams. Scale shape: the benchmark n-gram set is
    small by definition, so it is broadcast (asserted in
    tests/test_plans.py) and the corpus side is one scan + one
    map-side-combined aggregate — never a corpus self-join; at 100 TB
    the broadcast can be swapped for a bloom filter with the same plan
    shape."""
    from dicebox_sensorybatchprocessor_spark import api

    bench, eval_side = _bench_eval_ngrams(spark, sf_dir)
    return api.decontaminate(eval_side, bench, via="broadcast")


@register(
    "text_repetition_filter",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tc AS (
      SELECT doc_id, token, count(*) AS c
      FROM (SELECT doc_id, unnest(t) AS token FROM toks) GROUP BY 1, 2
    ),
    mx AS (
      SELECT doc_id, max(c) AS max_c, CAST(sum(c) AS BIGINT) AS n_tokens
      FROM tc GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id, t[g.i] || ' ' || t[g.i+1] AS b
      FROM toks, generate_series(1, {_MAX_TOKS}) g(i)
      WHERE g.i <= len(t) - 1
    ),
    bgs AS (
      SELECT doc_id, count(*) AS n_bigrams, count(DISTINCT b) AS n_distinct
      FROM bg GROUP BY doc_id
    )
    -- inner join on bgs == drop docs with <2 tokens (no bigrams), matching
    -- the engine's explicit n_bigrams >= 1 guard
    SELECT mx.doc_id, n_tokens,
           max_c * 1.0 / n_tokens AS top_token_frac,
           (n_bigrams - n_distinct) * 1.0 / n_bigrams AS dup_bigram_frac,
           (max_c * 1.0 / n_tokens <= 0.14
            AND (n_bigrams - n_distinct) * 1.0 / n_bigrams <= 0.065) AS keep
    FROM mx JOIN bgs ON bgs.doc_id = mx.doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per-document top-token fraction
    and duplicate-bigram fraction, plus the keep verdict (thresholds cut
    ~19% of the fixture corpus). Both fractions are exact-integer
    divisions, so the doubles are bit-identical cross-engine. Shape: the
    bigram stats are per-row JVM array ops (no shuffle); the top-token
    count is one explode + keyed aggregate with map-side combine — at
    100 TB this is the cheapest of the quality passes and composes into
    the pipeline_* quality gates."""
    d = fan_out_scan(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("t")
    )
    bg = _word_ngrams(F.col("t"), 2)
    per_row = d.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.size(bg).cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct(bg)).cast("bigint").alias("n_distinct"),
    ).filter(F.col("n_bigrams") >= 1)  # <2-token docs have no bigram signal;
    # dropping them keeps dup_bigram_frac NULL-free and matches the oracle's
    # inner join on bgs (ADVICE r4: 0/0 -> NULL divergence on short docs)
    top = (
        d.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"))
    )
    top_frac = F.col("max_c") * 1.0 / F.col("n_tokens")
    dup_frac = (F.col("n_bigrams") - F.col("n_distinct")) * 1.0 / F.col("n_bigrams")
    return per_row.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        top_frac.alias("top_token_frac"),
        dup_frac.alias("dup_bigram_frac"),
        ((top_frac <= 0.14) & (dup_frac <= 0.065)).alias("keep"),
    )


@register(
    "events_pii_scrub",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
             AS n_redactions,
           count(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g'))
             AS n_masked_shapes
    FROM events
    GROUP BY event_type
    """,
)
def events_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload redaction before corpus admission: numeric identifiers in
    the semi-structured ``props`` payload are masked to ``<NUM>``; the
    rollup reports redaction volume and the post-mask shape cardinality
    per event type (a collapsed shape space means the payload carried
    only identifiers). regexp_replace/extract_all are JVM codegen'd —
    one scan, one aggregate, no Python."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.size(F.expr("regexp_extract_all(props, '[0-9]+', 0)")))
        .cast("bigint")
        .alias("n_redactions"),
        F.countDistinct(F.regexp_replace("props", "[0-9]+", "<NUM>")).alias(
            "n_masked_shapes"
        ),
    )


# --- deterministic signed random projection ------------------------------
# sign(k, j) ∈ {+1, -1} from the first hex digit of md5("rp|k|j") — both
# engines compute md5 of the same string, so the matrix needs no literal
# table and no RNG state. The fold is strictly left-to-right with a 0.0
# init (IEEE 0+x = x), so Spark's aggregate() and DuckDB's list_reduce()
# produce bit-identical doubles (verified: 8000/8000 components exact).
_RP_DIMS = 16


def _rp_project_expr(dims: int = _RP_DIMS) -> str:
    sign = (
        "case when conv(substring(md5(concat('rp|', k, '|', j)), 1, 1), 16, 10) % 2 = 0"
        " then 1.0d else -1.0d end"
    )
    return f"""
    transform(sequence(0, {dims - 1}), k ->
      aggregate(zip_with(embedding, transform(sequence(0, 63), j -> {sign}),
                         (v, s) -> cast(v as double) * s),
                cast(0.0 as double), (acc, x) -> acc + x))
    """


def _rp_duck(k: str) -> str:
    """DuckDB projection of ``embedding`` onto RP row ``k`` (an SQL
    expression, 1-based lambda index j bridged to the 0-based salt)."""
    return f"""
    list_reduce(list_transform(embedding, (v, j) ->
      CAST(v AS DOUBLE) * (CASE WHEN ('0x' || substr(md5('rp|' || {k} || '|' || (j-1)), 1, 1))::BIGINT % 2 = 0
                           THEN 1.0 ELSE -1.0 END)),
      (a, b) -> a + b)
    """


@register(
    "emb_dim_reduce_rp",
    oracle=f"""
    SELECT vec_id, g.k AS k, {_rp_duck("g.k")} AS component
    FROM embeddings, generate_series(0, {_RP_DIMS - 1}) g(k)
    """,
)
def emb_dim_reduce_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction 64 → 16 (signed ±1
    Achlioptas matrix): the storage/ANN-recall trade every embedding
    store makes before indexing. The matrix is md5-derived — reproducible
    on any engine, no RNG, no shipped literals — and the output doubles
    are bit-identical to the oracle (no rounding tolerance).

    r15 plan (guide §4.2): the interpreted per-row HOF fold (16 dims ×
    64 sequential lambda steps per vector — never codegen'd) moves into
    an Arrow worker that runs the SAME IEEE operation sequence
    vectorized ACROSS rows: for each output dim, a Python-level loop
    over the 64 input dims accumulates acc = acc + v_j·s_kj on whole
    float64 columns, so every per-row add/multiply happens in the exact
    fold order and the output stays bit-identical (the no-tolerance
    oracle pins this at all SFs). Still a map-only pass, zero shuffle;
    measured 3.9 s → sub-second fresh-plan at sf0.1."""
    import hashlib

    import numpy as np
    import pandas as pd

    signs = np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"rp|{k}|{j}".encode()).hexdigest()[0], 16) % 2 == 0
                else -1.0
                for j in range(64)
            ]
            for k in range(_RP_DIMS)
        ]
    )

    def project(batches):
        for batch in batches:
            vids = batch["vec_id"].to_numpy()
            mat = np.stack(batch["embedding"].to_numpy()).astype("float64")
            n = len(vids)
            comps = np.empty((n, _RP_DIMS), dtype="float64")
            for k in range(_RP_DIMS):
                acc = np.zeros(n, dtype="float64")
                for j in range(64):
                    # acc + (v_j * s) — the HOF fold's exact IEEE sequence,
                    # vectorized across rows instead of across dims
                    acc = acc + mat[:, j] * signs[k, j]
                comps[:, k] = acc
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vids, _RP_DIMS),
                    "k": np.tile(np.arange(_RP_DIMS, dtype="int64"), n),
                    "component": comps.ravel(),
                }
            )

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sc = spark.sparkContext
    # widen the single-row-group fixture scan so the projection does not
    # serialize on one Arrow worker (the fan_out_scan rationale)
    if e.rdd.getNumPartitions() < sc.defaultParallelism:
        e = e.repartition(sc.defaultParallelism)
    return e.mapInPandas(project, "vec_id long, k long, component double")


@register(
    "dedup_semantic_buckets",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id, embedding,
             {_rp_duck("0")} AS p0, {_rp_duck("1")} AS p1, {_rp_duck("2")} AS p2
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, embedding,
             (CASE WHEN p0 > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN p1 > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN p2 > 0 THEN 4 ELSE 0 END) AS bucket
      FROM proj
    )
    SELECT CAST(a.bucket AS BIGINT) AS bucket, a.vec_id AS id_a, c.vec_id AS id_b,
           list_reduce(list_transform(a.embedding, (v, j) ->
             CAST(v AS DOUBLE) * CAST(c.embedding[j] AS DOUBLE)), (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(a.embedding, (v, j) ->
                CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
            * sqrt(list_reduce(list_transform(c.embedding, (v, j) ->
                CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))
             AS cosine
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE list_reduce(list_transform(a.embedding, (v, j) ->
            CAST(v AS DOUBLE) * CAST(c.embedding[j] AS DOUBLE)), (x, y) -> x + y)
          / (sqrt(list_reduce(list_transform(a.embedding, (v, j) ->
               CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
           * sqrt(list_reduce(list_transform(c.embedding, (v, j) ->
               CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))) >= 0.2
    """,
)
def dedup_semantic_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup: coarse semantic buckets (sign
    pattern of RP projections 0-2 → 8 buckets) gate the exact cosine
    check, confining the quadratic pair scan to same-bucket candidates
    (~1/8 of all pairs here; 2^b shrinks it geometrically as b grows).
    Random-hyperplane signs ARE the SimHash family for cosine, so
    same-bucket probability rises with similarity — the standard
    LSH-quality argument. Every quantity (projection, bucket, dot,
    norms) is a strictly-ordered fold identical on both engines, so the
    emitted cosines are bit-exact with no rounding tolerance. Scale
    shape: one map pass to bucket, then a bucket-keyed self-join — the
    shuffle is on (bucket), and within-bucket all-pairs is the unit the
    production path caps (more projections → smaller buckets)."""
    from dicebox_sensorybatchprocessor_spark.llm import similarity as _sim
    from dicebox_sensorybatchprocessor_spark.utils import embedding_shape

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # route probe from parquet footers — zero Spark jobs (r16)
    n_rows, dim = embedding_shape(sf_dir)
    if n_rows * dim * 8 > _sim._INDEX_BYTE_BUDGET:
        return _semantic_buckets_blocked(e, n_rows, dim)
    # r15 (guide §4.2): under the broadcast byte budget the within-bucket
    # pair scan runs as ONE partition-wise Arrow-worker pass against the
    # broadcast matrix — with every IEEE operation in the HOF fold's
    # exact sequence (a Python-level loop over the 64 dims accumulating
    # on whole float64 columns / m×n blocks), so the emitted cosines
    # stay BIT-IDENTICAL to the no-tolerance oracle. The interpreted
    # fold paid per joined pair (never codegen'd) was the entire cost:
    # measured 7.3 s → sub-second fresh-plan at sf0.1. Over budget the
    # same kernel runs blocked over cogrouped per-bucket row-block pairs
    # (r16). The probe side is chunked under the kernel byte cap.
    import numpy as np
    import pandas as pd

    signs = _rp_signs(dim)

    pdf = e.toPandas().sort_values("vec_id")
    b_ids = pdf["vec_id"].to_numpy()
    b_mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    b_bucket = _fold_buckets(b_mat, signs)
    b_norm = np.sqrt(_sim._fold_sqnorm(b_mat))
    bc = spark.sparkContext.broadcast((b_ids, b_mat, b_bucket, b_norm))
    chunk_cap = _sim._KERNEL_CHUNK_BYTES

    def bucket_pairs(batches):
        ids, mat, buckets, norms = bc.value
        step = _sim._chunk_rows(len(ids), chunk_cap)
        for batch in batches:
            bids = batch["vec_id"].to_numpy()
            bq = np.stack(batch["embedding"].to_numpy()).astype("float64")
            bb = _fold_buckets(bq, signs)
            bn = np.sqrt(_sim._fold_sqnorm(bq))
            for s in range(0, len(bids), step):
                vids, q_bucket = bids[s : s + step], bb[s : s + step]
                # dot in the zip_with fold's exact order: acc + (a_j * c_j)
                cos = _sim._fold_dot(bq[s : s + step], mat) / (
                    bn[s : s + step][:, None] * norms[None, :]
                )
                mask = (
                    (q_bucket[:, None] == buckets[None, :])
                    & (vids[:, None] < ids[None, :])
                    & (cos >= 0.2)
                )
                r, c = np.nonzero(mask)
                yield pd.DataFrame(
                    {
                        "bucket": q_bucket[r],
                        "id_a": vids[r],
                        "id_b": ids[c],
                        "cosine": cos[r, c],
                    }
                )

    sc = spark.sparkContext
    target = min(sc.defaultParallelism, max(1, n_rows // 128))
    probe = e.repartition(target) if e.rdd.getNumPartitions() < target else e
    return probe.mapInPandas(
        bucket_pairs, "bucket long, id_a long, id_b long, cosine double"
    )


def _rp_signs(dim: int):
    """The md5-derived ±1 sign matrix for bucketing projections 0-2 —
    identical to _rp_project_expr's JVM-side derivation."""
    import hashlib

    import numpy as np

    return np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"rp|{k}|{j}".encode()).hexdigest()[0], 16) % 2 == 0
                else -1.0
                for j in range(dim)
            ]
            for k in range(3)
        ]
    )


def _fold_buckets(mat, signs):
    """Sign-pattern bucket ids in the HOF fold's exact IEEE order
    (acc = acc + v_j·s_kj over ascending dims, per projection)."""
    import numpy as np

    def fold_proj(k: int):
        acc = np.zeros(mat.shape[0], dtype="float64")
        for j in range(mat.shape[1]):
            acc = acc + mat[:, j] * signs[k, j]
        return acc

    return (
        (fold_proj(0) > 0).astype("int64")
        + 2 * (fold_proj(1) > 0).astype("int64")
        + 4 * (fold_proj(2) > 0).astype("int64")
    )


def _semantic_buckets_blocked(e: DataFrame, n_rows: int, dim: int) -> DataFrame:
    """Distributed route for :func:`dedup_semantic_buckets` past the
    broadcast byte budget (r16, VERDICT r15 #1): the semantic bucket is
    computed JVM-side with the exact HOF fold (identical IEEE sequence
    to the kernel's numpy fold) and becomes part of the cogroup key, so
    the quadratic scan stays confined to same-bucket candidates — the
    SemDeDup gating the op demonstrates — while every unordered
    row-block pair within a bucket meets once in an Arrow task running
    the identical bit-exact cosine fold kernel. Replaces the
    interpreted-HOF bucket self-join (whose per-pair fold was the whole
    7.3 s sf0.1 cost). Never collects the relation."""
    import numpy as np
    import pandas as pd

    from dicebox_sensorybatchprocessor_spark.llm import similarity as _sim

    # blocks sized per bucket (2³ sign buckets split the corpus ~8 ways)
    L = max(1, -(-(max(1, n_rows) * dim * 8 // 8) // _sim._BLOCK_TARGET_BYTES))
    base = (
        e.select(
            "vec_id",
            "embedding",
            # only the 3 bucketing projections are computed (ADVICE r4: the
            # full 16-dim fold was 13 wasted per-row reductions)
            F.expr(_rp_project_expr(dims=3)).alias("p"),
        )
        .select(
            "vec_id",
            "embedding",
            (
                F.when(F.element_at("p", 1) > 0, 1).otherwise(0)
                + F.when(F.element_at("p", 2) > 0, 2).otherwise(0)
                + F.when(F.element_at("p", 3) > 0, 4).otherwise(0)
            )
            .cast("bigint")
            .alias("bucket"),
        )
        .withColumn(
            "__blk", F.pmod(F.xxhash64("vec_id"), F.lit(L)).cast("int")
        )
    )
    chunk_cap = _sim._KERNEL_CHUNK_BYTES

    def kern(key, pdf):
        empty = pd.DataFrame(
            {
                "bucket": pd.Series([], dtype="int64"),
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        bucket, diag = key[0], key[-2] == key[-1]
        lmask = pdf["__side"].to_numpy() == 0
        left = pdf[lmask]
        right = left if diag else pdf[~lmask]
        if left.empty or right.empty:
            return empty
        l_ids = left["vec_id"].to_numpy()
        r_ids = right["vec_id"].to_numpy()
        lm = np.stack(left["embedding"].to_numpy()).astype("float64")
        rm = np.stack(right["embedding"].to_numpy()).astype("float64")
        ln = np.sqrt(_sim._fold_sqnorm(lm))
        rn = np.sqrt(_sim._fold_sqnorm(rm))
        outs = []
        step = _sim._chunk_rows(len(r_ids), chunk_cap)
        for s in range(0, len(l_ids), step):
            vids = l_ids[s : s + step]
            cos = _sim._fold_dot(lm[s : s + step], rm) / (
                ln[s : s + step][:, None] * rn[None, :]
            )
            ok = cos >= 0.2
            if diag:
                ok &= vids[:, None] < r_ids[None, :]
            r, c = np.nonzero(ok)
            ia, ib = vids[r], r_ids[c]
            outs.append(
                pd.DataFrame(
                    {
                        "bucket": np.full(len(r), bucket, dtype="int64"),
                        "id_a": np.minimum(ia, ib),
                        "id_b": np.maximum(ia, ib),
                        "cosine": cos[r, c],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return _sim._block_pair_grouped(base, L, extra_keys=("bucket",)).applyInPandas(
        kern, "bucket long, id_a long, id_b long, cosine double"
    )


@register(
    "decontaminate_bloom",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ng AS (
      SELECT DISTINCT doc_id, array_to_string(t[g.i:g.i+2], ' ') AS ngram
      FROM toks, generate_series(1, {_MAX_TOKS}) g(i)
      WHERE g.i <= len(t) - 2
    ),
    tag AS (SELECT doc_id, ngram, {_BENCH_DUCK} AS is_bench FROM ng),
    bench AS (SELECT DISTINCT ngram FROM tag WHERE is_bench),
    eval AS (SELECT doc_id, ngram FROM tag WHERE NOT is_bench),
    sizes AS (SELECT doc_id, count(*) AS n_ngrams FROM eval GROUP BY doc_id),
    hits AS (
      SELECT e.doc_id, count(*) AS n_hits
      FROM eval e JOIN bench USING (ngram) GROUP BY e.doc_id
    )
    SELECT h.doc_id, n_hits, n_ngrams,
           n_hits * 1.0 / n_ngrams AS contamination
    FROM hits h JOIN sizes s USING (doc_id)
    """,
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented scale seam of decontaminate_ngram, actually built:
    when the benchmark n-gram set outgrows a raw-string broadcast
    (~100M+ n-grams), replace it with a Bloom bitset — a relation of set
    bit positions (m bits ≈ 9.6 · |bench|, integers, not strings) that
    broadcasts long after the strings cannot. Probe: each corpus n-gram
    explodes into its k hash bits (seeded xxhash64 family, the
    operators/sketches.py construction); an n-gram is a CANDIDATE iff
    all k exploded rows hit the broadcast bitset (count == k — correct
    even when two hash functions collide on one bit, because the bitset
    is distinct so each exploded row matches at most once). Candidates
    are then EXACTLY verified against the true bench set, which kills
    bloom false positives — so the oracle is the SAME SQL as
    decontaminate_ngram, and equality proves end-to-end that the bloom
    pass loses no true hit (no false negatives) and the verify pass
    admits no false hit. At 100 TB the exact-verify join sees only the
    ~fpp-sized surviving fraction of corpus n-grams instead of all of
    them — the candidates-gate-the-expensive-step shape shared with
    dedup_near_verified."""
    from dicebox_sensorybatchprocessor_spark import api

    bench, eval_side = _bench_eval_ngrams(spark, sf_dir)
    return api.decontaminate(eval_side, bench, via="bloom", fpp=0.01)


def _bench_eval_ngrams(spark: SparkSession, sf_dir: str):
    """Fixture-side derivation shared by the decontaminate twins: distinct
    word-3-gram relation split into the deterministic bench doc bucket's
    n-gram set and the eval side (everything else). Scan fanned out
    (r15, guide §2.5): the 3-gram explode is per-position transform +
    concat expression work on a one-split fixture scan."""
    d = fan_out_scan(load(spark, sf_dir, "documents"))
    ng = (
        d.select(
            "doc_id", F.explode(_word_ngrams(F.split("text", " "), 3)).alias("ngram")
        )
        .distinct()
        .withColumn("is_bench", F.expr(_BENCH_SPARK))
    )
    bench = ng.filter("is_bench").select("ngram").distinct()
    eval_side = ng.filter(~F.col("is_bench")).select("doc_id", "ngram")
    return bench, eval_side


@register(
    "events_bot_rate",
    oracle="""
    WITH per_day AS (
      SELECT user_id, date_trunc('day', ts) AS day_start,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS total_events,
           CAST(count(*) AS BIGINT) AS n_active_days,
           CAST(max(n) AS BIGINT) AS peak_per_day,
           floor((sum(n) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0
             AS avg_per_day,
           max(n) >= 7 AS is_bot
    FROM per_day
    GROUP BY user_id
    """,
)
def events_bot_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Machine-traffic scrub for interaction training logs: per-user
    request-rate profile (peak and average events per active day, day
    grain chosen so the fixture's event density exercises both flag
    branches) with a burst-rate bot flag — the curation gate that keeps
    scripted/bot sessions out of a behavioral training corpus,
    complementing events_pii_scrub (content) with a traffic-shape
    signal. All integer aggregation to the final division, so the flag
    is engine-exact by construction. Scale shape: two stacked hash-aggs
    with map-side combine — (user, day) then user — the same profile as
    any per-entity rollup; no join, no window, and the time grain bounds
    first-agg group size so no single reducer sees more than one
    user-day of rows even for a hot bot (at production rates you'd run
    the same plan at minute grain)."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.bot_rate(load(spark, sf_dir, "events"), grain="day", peak_threshold=7)


@register(
    "pipeline_curation_capstone",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    vocab AS (SELECT token, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY token),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab),
    per_doc AS (
      SELECT tf.doc_id,
             CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
             CAST(max(tf.tf) AS BIGINT) AS max_tf,
             CAST(SUM(CAST(round((tf.tf * log2(tf.tf * 1.0)) * 1000000.0, 0)
                  AS HUGEINT)) AS DOUBLE) / 1000000.0 AS s,
             CAST(SUM(CAST(round((tf.tf * ln(vocab.c * 1.0 / n.total)) * 1000000.0, 0)
                  AS HUGEINT)) AS DOUBLE) / 1000000.0 AS ll
      FROM tf JOIN vocab ON tf.token = vocab.token, n
      GROUP BY tf.doc_id
    ),
    gate AS (
      SELECT doc_id, n_tokens FROM per_doc
      WHERE (ll / n_tokens) >= -7.0
        AND (log2(n_tokens * 1.0) - s / n_tokens) >= 4.0
        AND (max_tf * 1.0 / n_tokens) <= 0.12
    ),
    keyed AS (
      SELECT d.doc_id, d.lang, d.source, g.n_tokens,
             md5(regexp_replace(lower(substr(d.text, 1, 64)), '\\s+', ' ', 'g')) AS k
      FROM documents d JOIN gate g ON g.doc_id = d.doc_id
    ),
    keepers AS (SELECT k, min(doc_id) AS keeper FROM keyed GROUP BY k)
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM keyed JOIN keepers ON keyed.k = keepers.k AND keyed.doc_id = keepers.keeper
    GROUP BY lang, source
    """,
)
def pipeline_curation_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df-level API composing end-to-end — the capstone written the
    way a USER of the engine would write it: quality_signals gates the
    corpus (LM + entropy + top-share in one scan), prefix_dedup keeps
    one survivor per boilerplate-prefix group, and the result rolls up
    into the per-(lang, source) token manifest a sampler consumes. Every
    stage is an api.py function; no stage re-derives a statistic another
    stage already computed (n_tokens flows from the quality pass to the
    manifest). Shuffle ledger: TF agg + vocab rollup (reused exchange) +
    final doc agg from the quality pass, one key-sized agg + join for
    the dedup, one manifest agg — nothing corpus-quadratic anywhere.
    The whole composition is api.curation_pipeline (round 6), whose
    ``materialize=True`` option is the checkpoint-the-gated-subset seam
    a 100 TB run would enable (see the api docstring)."""
    from dicebox_sensorybatchprocessor_spark import api

    return api.curation_pipeline(load(spark, sf_dir, "documents"))


@register(
    "decontaminate_semantic",
    oracle="""
    WITH bench AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % 50 = 0
        AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    corp AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % 50 <> 0
        AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
    ),
    scored AS (
      SELECT c.vec_id, b.vec_id AS bid,
             CAST(floor(list_cosine_similarity(c.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[])
                        * 1000000.0 + 0.5) AS BIGINT) AS cos_u
      FROM corp c, bench b
    ),
    best AS (
      SELECT vec_id, max(cos_u) AS mx FROM scored GROUP BY vec_id
    ),
    pick AS (
      SELECT s.vec_id, min(s.bid) AS nearest_ref_id, b.mx
      FROM scored s JOIN best b
        ON b.vec_id = s.vec_id AND s.cos_u = b.mx
      GROUP BY s.vec_id, b.mx
    )
    SELECT vec_id, nearest_ref_id,
           CAST(mx AS DOUBLE) / 1000000.0 AS max_cosine,
           mx >= 300000 AS contaminated
    FROM pick
    """,
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination (r15) — the semantic
    second line next to decontaminate_ngram / decontaminate_bloom:
    paraphrased eval leakage shares no 8-gram with the benchmark, so
    modern pipelines ALSO flag training rows whose embedding sits too
    close to any benchmark embedding (the Phi/LLaMA eval-dedup
    practice). The deterministic bench set is vec_id % 50 == 0 (~2% of
    the embeddings table — benchmark-sized by construction); every
    other vector reports its nearest bench vector, the exact max
    cosine, and the contaminated gate at integer microcosine 300000
    (cosine 0.30 — p90 of the fixture's max-cosine distribution, so
    both flag outcomes occur at every SF).

    Thin wrapper over api.semantic_decontaminate: the bench matrix
    broadcasts, ONE BLAS pass per corpus partition selects each row's
    argmax candidates (ties + a 2-microcosine margin kept — the
    knn_join rounding discipline), the proven JVM fold re-scores only
    those, and the per-row max resolves as one map-side-combinable
    packed-BIGINT hash aggregate. One corpus scan, no corpus self-join, no window — the
    100 TB decontamination shape. Every output value is hash-checked:
    nearest id, 6-dp cosine, and the integer-exact gate."""
    from dicebox_sensorybatchprocessor_spark import api

    e = load(spark, sf_dir, "embeddings")
    return api.semantic_decontaminate(
        e.filter(F.col("vec_id") % 50 != 0),
        e.filter(F.col("vec_id") % 50 == 0),
        threshold_microcos=300_000,
    )
