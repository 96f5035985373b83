"""§2.7 scalar function families (SURVEY.md) — one composite projection per
family so the oracle hash covers every function at once.

Cross-engine discipline (encoded in the oracle SQL, not the engine):
- integer-returning Spark functions are cast to BIGINT where DuckDB
  returns BIGINT (length, year, datediff, …);
- DuckDB's regexp_replace needs the 'g' flag to match Spark's
  replace-all; dayofweek is 0-based in DuckDB, 1-based in Spark;
- transcendental results (exp/ln/log10) round on both sides — libm vs JVM
  may differ in the last ulp;
- float32 array elements are cast to double before any arithmetic so both
  engines compute in f64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import md5_prefix_int


@register(
    "fn_string",
    oracle="""
    SELECT doc_id,
           concat(lang, ':', substr(text, 1, 20)) AS tagged,
           upper(lang) AS lang_up,
           CAST(length(text) AS BIGINT) AS n_chars_fn,
           lpad(lang, 5, '_') AS lang_pad,
           split_part(text, ' ', 1) AS first_word,
           regexp_extract(text, '(\\w+) (\\w+)', 2) AS second_word,
           regexp_replace(text, 'data', 'DATA', 'g') AS replaced,
           translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
           reverse(lang) AS lang_rev,
           trim(concat(' ', lang, ' ')) AS lang_trim,
           upper(substr(source, 1, 1)) || substr(source, 2) AS source_cap,
           left(text, 5) AS head5,
           right(text, 5) AS tail5,
           repeat(lang, 2) AS lang2
    FROM documents
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/substr/case/pad/split/regexp/translate/…"""
    d = load(spark, sf_dir, "documents")
    text = F.col("text")
    lang = F.col("lang")
    return d.select(
        "doc_id",
        F.concat(lang, F.lit(":"), F.substring(text, 1, 20)).alias("tagged"),
        F.upper(lang).alias("lang_up"),
        F.length(text).cast("bigint").alias("n_chars_fn"),
        F.lpad(lang, 5, "_").alias("lang_pad"),
        F.element_at(F.split(text, " "), 1).alias("first_word"),
        F.regexp_extract(text, r"(\w+) (\w+)", 2).alias("second_word"),
        F.regexp_replace(text, "data", "DATA").alias("replaced"),
        F.translate(lang, "aeiou", "AEIOU").alias("lang_tr"),
        F.reverse(lang).alias("lang_rev"),
        F.trim(F.concat(F.lit(" "), lang, F.lit(" "))).alias("lang_trim"),
        F.initcap(F.col("source")).alias("source_cap"),
        F.substring(text, 1, 5).alias("head5"),
        # greatest(..., 1) keeps the start positive for <5-char strings —
        # a negative start would count from the end (diverging from the
        # oracle's right(text, 5), which just returns the whole string).
        text.substr(F.greatest(F.length(text) - 4, F.lit(1)), F.lit(5)).alias("tail5"),
        F.repeat(lang, 2).alias("lang2"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           dayofmonth(o_orderdate) AS dom,
           dayofweek(o_orderdate) + 1 AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           epoch_us(o_orderdate) // 1000000 AS unix_sec,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. dayofweek: Spark is 1-based (Sun=1), DuckDB 0-based
    — the +1 lives in the oracle SQL."""
    o = load(spark, sf_dir, "orders")
    dt = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(dt).cast("bigint").alias("yr"),
        F.month(dt).cast("bigint").alias("mo"),
        F.dayofmonth(dt).cast("bigint").alias("dom"),
        F.dayofweek(dt).cast("bigint").alias("dow"),
        F.date_trunc("month", dt).alias("month_start"),
        (dt + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(dt, F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since_epoch_start"
        ),
        # DATE results are cast back to TIMESTAMP_NTZ for output: the
        # driver hash-compares values, and a datetime.date stringifies
        # differently from DuckDB's midnight timestamp.
        F.last_day(dt).cast("timestamp_ntz").alias("month_end"),
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").alias("unix_sec"),
        dt.cast("date").cast("timestamp_ntz").alias("order_date"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           abs(l_discount - 0.05) AS disc_dev,
           pow(l_quantity, 2) AS qty_sq,
           round(exp(l_discount), 6) AS exp_disc,
           round(ln(l_quantity + 1), 6) AS ln_qty,
           round(log10(l_extendedprice), 6) AS log_price,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
           greatest(l_quantity, l_discount * 100) AS g,
           least(l_quantity, l_discount * 100) AS l,
           mod(l_linenumber, 3) AS ln_mod
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. floor/ceil/sign return different widths per engine
    (Spark BIGINT/double, DuckDB DOUBLE/TINYINT) — both sides cast to
    BIGINT; transcendentals round to 6 (libm-vs-JVM last-ulp)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt(qty), 6).alias("sqrt_qty"),
        F.floor(price / 1000).cast("bigint").alias("price_k_floor"),
        F.ceil(price / 1000).cast("bigint").alias("price_k_ceil"),
        F.abs(disc - 0.05).alias("disc_dev"),
        F.pow(qty, 2).alias("qty_sq"),
        F.round(F.exp(disc), 6).alias("exp_disc"),
        F.round(F.log(qty + 1), 6).alias("ln_qty"),
        F.round(F.log10(price), 6).alias("log_price"),
        F.signum(disc - 0.05).cast("bigint").alias("disc_sign"),
        F.greatest(qty, disc * 100).alias("g"),
        F.least(qty, disc * 100).alias("l"),
        F.pmod(F.col("l_linenumber"), F.lit(3)).alias("ln_mod"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           round(list_aggregate(embedding::DOUBLE[], 'sum'), 4) AS sum_all,
           CAST(list_max(embedding) AS DOUBLE) AS max_elem,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_aggregate((embedding[1:3])::DOUBLE[], 'sum'), 6) AS first3_sum,
           round(list_dot_product(embedding::DOUBLE[], list_reverse(embedding)::DOUBLE[]), 6)
             AS dot_rev
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order family: size, aggregate (fold), filter, slice,
    zip_with, reverse — over the 64-dim embedding column. Elements are cast
    f32→f64 before arithmetic so both engines fold in double."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    embd = F.transform(emb, lambda x: x.cast("double"))
    dot_rev = F.aggregate(
        F.zip_with(embd, F.reverse(embd), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("n_dims"),
        F.round(F.aggregate(embd, F.lit(0.0), lambda acc, x: acc + x), 4).alias("sum_all"),
        F.array_max(emb).cast("double").alias("max_elem"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.round(F.aggregate(F.slice(embd, 1, 3), F.lit(0.0), lambda a, x: a + x), 6).alias(
            "first3_sum"
        ),
        F.round(dot_rev, 6).alias("dot_rev"),
    )


@register(
    "fn_array_explode",
    oracle="""
    SELECT vec_id, g.i AS pos, embedding[g.i]::DOUBLE AS elem
    FROM embeddings, generate_series(1, 64) g(i)
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding array (1-based positions to match the
    oracle's generate_series; dim is fixed at 64 per FIXTURES.md)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.posexplode("embedding").alias("pos0", "elem_f")).select(
        "vec_id",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("elem_f").cast("double").alias("elem"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           (map {'type': event_type, 'user': CAST(user_id AS VARCHAR)})['type'][1] AS m_type,
           array_to_string(map_keys(map {'type': event_type, 'user': CAST(user_id AS VARCHAR)}), ',')
             AS m_keys,
           CAST(cardinality(map {'type': event_type, 'user': CAST(user_id AS VARCHAR)}) AS BIGINT)
             AS m_size
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family over a constructed column (no stored MapType in fixtures
    [V]): create_map, element access, map_keys, size. DuckDB map extraction
    returns a single-element list — unwrapped with [1] in the oracle."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("user"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.size(m).cast("bigint").alias("m_size"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing') IS NULL AS missing_is_null
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family on the stored JSON-in-string props column:
    get_json_object / path extraction / null on missing path."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256,
           ('0x' || substr(md5(text), 1, 15))::BIGINT AS md5_prefix_int
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (the reference's content-addressed idempotent-write key,
    R7): md5 + sha256 hex (identical across engines) and a 60-bit integer
    key parsed from the md5 prefix — the portable 'hash to int64' pattern
    used by the dedup/simhash operators."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        md5_prefix_int(F.col("text")).alias("md5_prefix_int"),
    )


@register(
    "fn_hash_native",
    oracle="""
    SELECT count(*) AS n_docs,
           count(DISTINCT text) AS n_distinct_texts,
           TRUE AS xxh64_deterministic,
           TRUE AS xxh64_injective_here,
           TRUE AS crc32_injective_here,
           TRUE AS murmur3_injective_here
    FROM documents
    """,
    cache_plan=False,
)
def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes (xxhash64 — the fast shuffle/dedup key at
    scale — crc32, murmur3) with their *guarantees* as the checked values:
    the hash values themselves have no DuckDB equivalent, but determinism
    (two independently-planned evaluations agree on every row) and
    fixture-injectivity (distinct hashes == distinct texts; a property of
    the fixed corpus, not a per-run random variable — verified to hold at
    sf0.01 and sf0.1 even for the 32-bit families) are oracle-assertable
    as literal TRUE next to exact-side counts DuckDB recomputes."""
    # fan_out_scan deliberately NOT applied (r15): the op is dominated
    # by its determinism self-join and distinct-count aggregates, not by
    # per-row hash expressions — measured 1.05 s -> 1.56 s WITH the
    # fan-out (the round-robin exchange feeds a join), so it stays off.
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    hashed = d.select(
        "doc_id",
        "text",
        F.xxhash64("text").alias("h64"),
        F.crc32("text").alias("h32"),
        F.hash("text").cast("bigint").alias("hm3"),
    )
    again = d.select("doc_id", F.xxhash64("text").alias("h64_again"))
    stable = (
        hashed.join(again, "doc_id")
        .filter(F.col("h64") != F.col("h64_again"))
        .count()
    )
    agg = hashed.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.countDistinct("h64").alias("d64"),
        F.countDistinct("h32").alias("d32"),
        F.countDistinct("hm3").alias("dm3"),
    ).first()
    return spark.createDataFrame(
        [
            (
                agg["n_docs"],
                agg["n_distinct_texts"],
                stable == 0,
                agg["d64"] == agg["n_distinct_texts"],
                agg["d32"] == agg["n_distinct_texts"],
                agg["dm3"] == agg["n_distinct_texts"],
            )
        ],
        "n_docs long, n_distinct_texts long, xxh64_deterministic boolean,"
        " xxh64_injective_here boolean, crc32_injective_here boolean,"
        " murmur3_injective_here boolean",
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(key := o_orderkey, price := o_totalprice).key AS s_key,
           struct_pack(key := o_orderkey, price := o_totalprice).price AS s_price,
           struct_pack(a := struct_pack(b := o_orderstatus)).a.b AS nested_status
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family over constructed columns: named_struct construction,
    field access, nesting (output flattened to scalars — struct wire
    encodings differ between engines)."""
    o = load(spark, sf_dir, "orders")
    s = F.struct(F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price"))
    nested = F.struct(F.struct(F.col("o_orderstatus").alias("b")).alias("a"))
    return o.select(
        "o_orderkey",
        s.getField("key").alias("s_key"),
        s.getField("price").alias("s_price"),
        nested.getField("a").getField("b").alias("nested_status"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 15 AS bor,
           xor(o_orderkey, 21845) AS bxor,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, popcount — the primitives
    simhash banding and bucket assignment build on (llm/dedup.py)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(15)).alias("bor"),
        k.bitwiseXOR(F.lit(21845)).alias("bxor"),
        F.shiftleft(k.cast("int"), 2).cast("bigint").alias("shl"),
        F.shiftright(k.cast("int"), 3).cast("bigint").alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 1 MONTH AS next_month,
           last_day(o_orderdate) AS month_end,
           date_trunc('week', o_orderdate) AS week_start,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sunday1,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           o_orderdate + INTERVAL 90 DAY AS due_date
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic family: month addition (with end-of-month
    clamping — both engines clamp Jan 31 + 1 month to Feb end), last_day,
    ISO week truncation/numbering, quarter, day-of-week, fixed-day
    offsets. Convention bridges verified by probe: Spark dayofweek is
    1=Sunday while DuckDB's is 0=Sunday (offset in the oracle); both
    date_trunc('week') land on Monday; DATE-typed outputs are cast to
    TIMESTAMP_NTZ at the boundary (the fn_date stringification lesson).
    All JVM-side, codegen'd, no shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    ntz = lambda c: c.cast("timestamp_ntz")  # noqa: E731
    return o.select(
        "o_orderkey",
        ntz(F.expr("add_months(o_orderdate, 1)")).alias("next_month"),
        ntz(F.expr("last_day(o_orderdate)")).alias("month_end"),
        F.expr("date_trunc('week', o_orderdate)").alias("week_start"),
        F.expr("dayofweek(o_orderdate)").cast("int").alias("dow_sunday1"),
        F.expr("weekofyear(o_orderdate)").cast("int").alias("iso_week"),
        F.expr("quarter(o_orderdate)").cast("int").alias("qtr"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
    )


@register(
    "fn_url",
    oracle="""
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
             || '?lang=' || lang || '&n=' || CAST(n_chars AS VARCHAR) AS url,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang || '&n=' || CAST(n_chars AS VARCHAR) AS query,
           lang AS lang_param,
           CAST(n_chars AS VARCHAR) AS n_param,
           'https' AS protocol
    FROM documents
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family (r12) — the web-corpus curation verbs
    (domain extraction for per-site dedup/mixing caps, parameter
    plucking for crawl filtering): a deterministic URL is synthesized
    from fixture columns JVM-side, then decomposed with Spark's
    ``parse_url`` (HOST / PATH / QUERY / per-key QUERY / PROTOCOL).
    The oracle reconstructs every component by string arithmetic from
    the same columns, so the parser's output is value-checked against
    the known wire format rather than trusted. All codegen'd
    expressions, no shuffle, no Python."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("n")).alias("n_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )
