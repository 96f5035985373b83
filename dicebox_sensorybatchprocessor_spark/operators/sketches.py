"""Sketch operators (round-2 §2.10 additions): approximate quantiles,
Bloom filter, count-min sketch.

At 100 TB, exact order statistics and exact membership/frequency tables
are unaffordable or undeployable; the production answers are mergeable
sketches. Sketch *estimates* are construction-specific bit patterns, so —
like agg_approx_distinct — each operator emits its **accuracy claim as
the checked value**: Spark computes estimate AND exact side by side and
outputs a boolean tolerance verdict per group; the DuckDB oracle emits
literal TRUE, so the driver's value-hash is a real accuracy gate rather
than a rows-only count.

PySpark exposes no bloomFilter/countMinSketch on DataFrameStatFunctions,
so both are built **as DataFrames**: the sketch state (Bloom bitset /
CMS counter grid) is itself a distributed relation produced by one
hash-explode + aggregate, never a driver-side object — which is also the
form that scales (the bitset/grid shuffles as ordinary rows, merges
map-side, and the membership/estimate probes are joins). All operators
here are join/agg-only: zero Python, zero driver sketch state.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register


@register(
    "sketch_quantiles",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok, TRUE AS p99_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) with its rank-error bound as
    the claim.

    GK guarantees the returned value's true rank is within eps·n of the
    target rank (eps = 1/accuracy). Checked exactly, per group and per
    percentile: pass 1 computes the sketch per group; pass 2
    broadcast-joins the (3-row) percentile table back and counts
    values <= v — the exact rank — entirely JVM-side. Two linear scans,
    no collected arrays, the same shape at any scale."""
    acc = 1000
    eps = 1.0 / acc
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    apx = li.groupBy("l_returnflag").agg(
        F.expr(
            f"approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), {acc})"
        ).alias("apx")
    )
    joined = li.join(F.broadcast(apx), "l_returnflag")
    price = F.col("l_extendedprice")
    grouped = joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        *[
            F.count(F.when(price <= F.element_at("apx", i), 1)).alias(f"rank{i}")
            for i in (1, 2, 3)
        ],
    )

    def ok(i: int, q: float):
        n = F.col("n_rows").cast("double")
        rank = F.col(f"rank{i}").cast("double")
        return (rank >= (q - eps) * n - 1) & (rank <= (q + eps) * n + 1)

    return grouped.select(
        "l_returnflag",
        "n_rows",
        ok(1, 0.5).alias("p50_rank_ok"),
        ok(2, 0.9).alias("p90_rank_ok"),
        ok(3, 0.99).alias("p99_rank_ok"),
    )


def _bloom_bits(df: DataFrame, key: str, k: int, m: int) -> DataFrame:
    """The k bit positions of each key: hash_j(x) = xxhash64(j ‖ x) mod m."""
    return df.select(
        F.col(key).alias("key"),
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(j), F.col(key)), F.lit(m)).alias("b")
                    for j in range(k)
                ]
            )
        ).alias("bit"),
    )


@register(
    "sketch_bloom",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_keys,
           TRUE AS no_false_negatives,
           TRUE AS fpp_within_3x
    FROM orders
    """,
)
def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a DataFrame, with both guarantees as the claim.

    The bitset is a distributed relation: explode each key into its k
    hash bits, distinct — one shuffle, map-side combined. Claims:
    (1) no false negatives, probed with an INDEPENDENTLY DERIVED copy of
    the key set — customer.c_custkey semi-joined to orders (different
    table, different scan, different column) rather than the same
    o_custkey rows the bitset was distinct'ed from, so the check exercises
    the hash/bit pipeline end-to-end instead of anti-joining a relation
    against itself (ADVICE r2); (2) the observed false-positive rate over
    keys guaranteed absent — customers with no orders (real negatives)
    plus a synthetic out-of-span range (volume) — is within 3× the
    configured fpp. The 3× margin makes the probabilistic bound robust to
    fixture evolution: with 20k+ probes at fpp=0.01 the observed rate
    exceeding 3× has probability < 1e-30 (Chernoff), and the seeded
    xxhash64 family makes any given fixture deterministic anyway.
    At 100 TB this is the semi-join pre-filter that skips shuffling
    probe-side rows that cannot match — and because the bitset is rows,
    it broadcasts or shuffles like any dimension."""
    fpp = 0.01
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    keys = orders.distinct()
    n_keys = keys.count()
    m = max(64, int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / max(n_keys, 1) * math.log(2)))
    bitset = _bloom_bits(keys, "o_custkey", k, m).select("bit").distinct()

    # (1) membership of every inserted key, re-derived via the customer
    # table (c_custkey with orders == the inserted key set, built from a
    # different scan) — zero anti-join survivors ⟺ every required bit set.
    # The re-derivation only covers the inserted set if every o_custkey
    # exists in customer, so the claim also requires |members| == n_keys:
    # a referential-integrity gap would otherwise silently shrink the
    # probe set and let a false negative hide.
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    members = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    )
    n_members = members.count()
    misses = (
        _bloom_bits(members, "c_custkey", k, m)
        .join(bitset, "bit", "left_anti")
        .count()
    )
    # (2) fp rate over keys guaranteed absent: customers with no orders
    # (real-world negative probes) plus an out-of-span synthetic range
    span = keys.agg(F.max("o_custkey")).first()[0] or 0
    n_range = 20000
    absent = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select(F.col("c_custkey").alias("k"))
        .union(spark.range(span + 1, span + 1 + n_range).select(F.col("id").alias("k")))
    )
    n_probe = absent.count()
    fps = (
        _bloom_bits(absent, "k", k, m)
        .join(bitset, "bit", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("n_set"))
        .filter(F.col("n_set") == k)
        .count()
    )
    return spark.createDataFrame(
        [(n_keys, misses == 0 and n_members == n_keys, fps <= 3 * fpp * n_probe)],
        "n_keys long, no_false_negatives boolean, fpp_within_3x boolean",
    )


@register(
    "sketch_count_min",
    oracle="""
    SELECT event_type, count(*) AS n_true,
           TRUE AS cms_overestimates, TRUE AS cms_within_eps
    FROM events GROUP BY event_type
    """,
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as a DataFrame, with the CMS guarantee as the
    claim: estimate ≥ true always (min over per-row hash counters can
    only overcount), and estimate ≤ true + eps·N.

    The counter grid (depth d × width w) is one explode + aggregate over
    the stream — distributed, map-side mergeable, never on the driver.
    Estimates come from broadcast-joining the probe keys' (row, slot)
    coordinates against the grid and taking min(counter) per key. The
    100 TB use is heavy-hitter frequency estimation where the exact
    group-by of a high-cardinality key would itself be a giant table."""
    eps, depth = 0.001, 5
    width = int(math.ceil(math.e / eps))
    ev = load(spark, sf_dir, "events").select("event_type")
    coords = ev.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.pmod(F.xxhash64(F.lit(j), F.col("event_type")), F.lit(width)).alias(
                            "slot"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select("event_type", "c.row", "c.slot")
    grid = coords.groupBy("row", "slot").agg(F.count("*").alias("counter"))

    truth = ev.groupBy("event_type").agg(F.count("*").alias("n_true"))
    total = ev.count()
    probe_coords = truth.select(
        "event_type",
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.pmod(F.xxhash64(F.lit(j), F.col("event_type")), F.lit(width)).alias(
                            "slot"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select("event_type", "n_true", "c.row", "c.slot")
    est = (
        probe_coords.join(F.broadcast(grid), ["row", "slot"])
        .groupBy("event_type", "n_true")
        .agg(F.min("counter").alias("estimate"))
    )
    return est.select(
        "event_type",
        "n_true",
        (F.col("estimate") >= F.col("n_true")).alias("cms_overestimates"),
        (F.col("estimate") <= F.col("n_true") + eps * total).alias("cms_within_eps"),
    )


@register(
    "sketch_hll_merge",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS merged_within_5pct,
           TRUE AS direct_within_5pct
    FROM events
    """,
)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's hll_sketch_agg family) — the pattern behind every incremental
    rollup at 100 TB: sketch each day partition once, store the binary
    sketch, answer any date-range distinct query by unioning sketches
    instead of rescanning raw data. Both the union-of-daily-sketches
    estimate and the direct whole-table estimate are claimed within 5% of
    the exact distinct count DuckDB recomputes (default lgK=12 rsd is
    ~1.6%, so the bound has wide margin at any fixture scale). The two
    estimates are NOT claimed identical: they agree bit-for-bit only in
    the sparse coupon regime (true at sf0.01's 150 users); at sf0.1's
    1500 users the sketches promote to dense HLL mode, where
    union-then-estimate and direct-estimate legitimately differ inside
    the error bound — measured here so the claim is the guarantee HLL
    actually provides, not one a scale change falsifies."""
    from pyspark.sql.functions import (
        hll_sketch_agg,
        hll_sketch_estimate,
        hll_union_agg,
    )

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        hll_sketch_agg("user_id").alias("sk")
    )
    merged_est = daily.agg(
        hll_sketch_estimate(hll_union_agg("sk")).alias("est")
    ).first()["est"]
    direct_est = ev.agg(
        hll_sketch_estimate(hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    exact = ev.agg(F.count_distinct("user_id").alias("n")).first()["n"]
    return spark.createDataFrame(
        [
            (
                int(exact),
                bool(abs(merged_est - exact) <= 0.05 * exact),
                bool(abs(direct_est - exact) <= 0.05 * exact),
            )
        ],
        "exact_distinct BIGINT, merged_within_5pct BOOLEAN, direct_within_5pct BOOLEAN",
    )
