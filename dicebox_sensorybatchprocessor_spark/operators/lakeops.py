"""Registered lake-protocol operators (round 9): CDC apply and the
incremental materialized view, end-to-end over fixture tables.

Both run a full multi-commit lifecycle against a scratch
:class:`lake.ManifestTable` inside one registered query, so the driver's
DuckDB oracle verifies the *final table state* the protocol produced —
the same trick stream_upsert_merge uses. The deterministic change feeds
are DERIVED from the fixture tables (no randomness, no wall clock), so
the oracle can re-derive them in SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark import lake
from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.lake import ManifestTable, merge_upsert
from dicebox_sensorybatchprocessor_spark.registry import register
from dicebox_sensorybatchprocessor_spark.utils import (
    fixed_point_sum,
    fixed_point_sum_sql,
    scratch_dir,
)


@register(
    cache_plan=False,
    name="lake_cdc_apply",
    oracle=f"""
    WITH feed AS (
      SELECT o_orderkey AS k, o_custkey,
             'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
             1 AS seq, 'update' AS op
      FROM orders WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
             CAST(NULL AS DOUBLE), 1, 'delete'
      FROM orders WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N', 0.5 * o_totalprice,
             1, 'insert'
      FROM orders WHERE o_orderkey % 100 = 1
      UNION ALL
      SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
             CAST(NULL AS DOUBLE), 2, 'delete'
      FROM orders WHERE o_orderkey % 10 = 3 AND o_orderkey % 3 = 0
    ),
    net AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC, op DESC) AS rn
        FROM feed) t
      WHERE rn = 1
    ),
    final AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey NOT IN (SELECT k FROM feed)
      UNION ALL
      SELECT k, o_custkey, o_orderstatus, o_totalprice FROM net
      WHERE op <> 'delete'
    )
    SELECT o_orderstatus, o_orderkey % 10 AS k_mod,
           count(*) AS n,
           {fixed_point_sum_sql("o_totalprice", 2)} AS sum_price
    FROM final GROUP BY o_orderstatus, k_mod
    """,
)
def lake_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (lake.merge_apply / api.apply_changes): a derived
    insert/update/delete feed — including a key whose history is
    update@1 then delete@2, so net-effect collapse must drop it — lands
    on a bucketed ManifestTable in ONE atomic commit; deletes route to
    buckets exactly like upserts, so only touched buckets rewrite. The
    oracle recomputes the net feed and final state in SQL; the result
    is the final state rolled up by (status, key mod 10), which
    separates inserted ('N'), updated ('U'), deleted, and untouched
    keys into distinct groups."""
    from dicebox_sensorybatchprocessor_spark import api

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    table = ManifestTable(scratch_dir(prefix="sbp_cdc_apply_"))
    merge_upsert(table, orders, ("o_orderkey",), n_buckets=8)

    nul_b, nul_s, nul_d = (
        F.lit(None).cast("long"),
        F.lit(None).cast("string"),
        F.lit(None).cast("double"),
    )
    upd = orders.filter(F.col("o_orderkey") % 10 == 3).select(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit(1).alias("seq"),
        F.lit("update").alias("op"),
    )
    dele = orders.filter(F.col("o_orderkey") % 10 == 7).select(
        F.col("o_orderkey"), nul_b.alias("o_custkey"),
        nul_s.alias("o_orderstatus"), nul_d.alias("o_totalprice"),
        F.lit(1).alias("seq"), F.lit("delete").alias("op"),
    )
    ins = orders.filter(F.col("o_orderkey") % 100 == 1).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.col("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.5).alias("o_totalprice"),
        F.lit(1).alias("seq"),
        F.lit("insert").alias("op"),
    )
    dele2 = orders.filter(
        (F.col("o_orderkey") % 10 == 3) & (F.col("o_orderkey") % 3 == 0)
    ).select(
        F.col("o_orderkey"), nul_b.alias("o_custkey"),
        nul_s.alias("o_orderstatus"), nul_d.alias("o_totalprice"),
        F.lit(2).alias("seq"), F.lit("delete").alias("op"),
    )
    feed = upd.unionByName(dele).unionByName(ins).unionByName(dele2)
    api.apply_changes(table, feed, ("o_orderkey",), op_col="op", seq_col="seq")
    return (
        table.read(spark)
        .groupBy(
            "o_orderstatus", (F.col("o_orderkey") % 10).alias("k_mod")
        )
        .agg(
            F.count("*").alias("n"),
            fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    cache_plan=False,
    name="lake_zorder_skip",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n,
           {fixed_point_sum_sql("o_totalprice", 2)} AS sum_price,
           TRUE AS prunes_kmod, TRUE AS prunes_price
    FROM (SELECT o_orderkey % 1000 AS k_mod, o_totalprice, o_orderpriority
          FROM orders) t
    WHERE k_mod BETWEEN 100 AND 300
      AND o_totalprice BETWEEN 100000.0 AND 200000.0
    GROUP BY o_orderpriority
    """,
)
def lake_zorder_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering + zone-map data skipping: the
    orders table is clustered on TWO independent dimensions
    (o_orderkey % 1000, o_totalprice) so every file owns a small
    rectangle of the value space, and a 2-D box query opens only files
    whose manifest [min, max] stats intersect BOTH ranges. The
    prunes_kmod / prunes_price claim columns assert — as values the
    oracle checks — that each SINGLE-dimension predicate already skips
    files, which linear clustering can only deliver for its leading
    column; the aggregates of the box query itself must equal the plain
    filtered GROUP BY the oracle runs (skipping never drops a row)."""
    orders = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 1000).alias("k_mod"),
        "o_totalprice",
        "o_orderpriority",
    )
    table = ManifestTable(scratch_dir(prefix="sbp_zorder_"))
    table.overwrite(
        orders,
        cluster_by=("k_mod", "o_totalprice"),
        cluster_method="zorder",
        n_files=16,
        # 64 cells/dim: plenty of rectangle resolution for 16 files, and
        # the per-row quantize fold costs 4x less than the 256-cell default
        zorder_bits=6,
    )
    n_total = len(table.snapshot()["files"])
    prunes_kmod = len(table.prune_files("k_mod", 100, 300)) < n_total
    prunes_price = (
        len(table.prune_files("o_totalprice", 100000.0, 200000.0)) < n_total
    )
    box = table.read_box(
        spark, {"k_mod": (100, 300), "o_totalprice": (100000.0, 200000.0)}
    )
    return box.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        F.lit(prunes_kmod).alias("prunes_kmod"),
        F.lit(prunes_price).alias("prunes_price"),
    )


@register(
    cache_plan=False,
    name="lake_merge_into",
    oracle=f"""
    WITH tgt AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
    ),
    src AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
             CASE WHEN o_orderkey % 20 = 0 THEN 'D' ELSE 'U' END AS op,
             o_totalprice * 0.1 AS delta
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', o_totalprice * 2.0,
             o_orderpriority, 'I', 0.0
      FROM orders WHERE o_orderkey % 100 = 1
    ),
    merged AS (
      SELECT t.o_orderkey,
             CASE WHEN s.o_orderkey IS NOT NULL AND s.op <> 'D'
                       AND t.o_totalprice >= 100000.0
                  THEN 'U' ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN s.o_orderkey IS NOT NULL AND s.op <> 'D'
                       AND t.o_totalprice >= 100000.0
                  THEN t.o_totalprice + s.delta
                  ELSE t.o_totalprice END AS o_totalprice
      FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      WHERE s.o_orderkey IS NULL OR s.op <> 'D'
      UNION ALL
      SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
      FROM src s LEFT JOIN tgt t ON t.o_orderkey = s.o_orderkey
      WHERE t.o_orderkey IS NULL AND s.o_totalprice > 50000.0
    )
    SELECT o_orderstatus, count(*) AS n,
           {fixed_point_sum_sql("o_totalprice", 2)} AS sum_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def lake_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional MERGE INTO (lake.merge_into / api.merge_into): one
    derived source feed drives every leg of the SQL:2003 / Delta MERGE
    statement against a bucketed orders table in ONE atomic commit —
    WHEN MATCHED AND op='D' THEN DELETE; WHEN MATCHED AND the TARGET
    row clears a price threshold THEN UPDATE with an expression mixing
    both sides (t.o_totalprice + s.delta) — matched rows failing both
    conditions stay byte-for-byte; WHEN NOT MATCHED AND the source
    price clears a threshold THEN INSERT (the below-threshold inserts
    must NOT land). Executes as one full-outer join + one CASE per
    column over only the buckets holding source keys. The oracle
    replays the same statement as a CTE and the final state is rolled
    up by status, which separates deleted / updated / inserted /
    untouched keys into distinct groups."""
    from dicebox_sensorybatchprocessor_spark import api

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    table = ManifestTable(scratch_dir(prefix="sbp_merge_into_"))
    merge_upsert(table, orders, ("o_orderkey",), n_buckets=8)

    matched = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 20 == 0, "D").otherwise("U").alias("op"),
        (F.col("o_totalprice") * 0.1).alias("delta"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 100 == 1).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2.0).alias("o_totalprice"),
        "o_orderpriority",
        F.lit("I").alias("op"),
        F.lit(0.0).alias("delta"),
    )
    api.merge_into(
        table,
        matched.unionByName(inserts),
        ("o_orderkey",),
        matched_update={
            "o_totalprice": "t.o_totalprice + s.delta",
            "o_orderstatus": "'U'",
        },
        matched_update_condition="t.o_totalprice >= 100000.0",
        matched_delete_condition="s.op = 'D'",
        insert_condition="s.o_totalprice > 50000.0",
    )
    return table.read(spark).groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    cache_plan=False,
    name="lake_compact_small",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n,
           {fixed_point_sum_sql("o_totalprice", 2)} AS sum_price,
           TRUE AS big_file_carried, TRUE AS packed_tail,
           TRUE AS replay_skipped
    FROM orders GROUP BY o_orderpriority
    """,
)
def lake_compact_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest lifecycle closed by O(small-files) maintenance:
    a big overwrite plus eight blind ``table.append`` micro-batches (the
    O(batch) ingest verb — no read of existing data) leave the
    fragmented tail every streaming sink leaves, then
    ``compact_small`` bin-packs ONLY the files under the size threshold
    and carries the right-sized file into the new snapshot
    byte-identical (claimed by path AND size — ``compact()`` would
    rewrite it too, which at lake scale turns a nightly OPTIMIZE into a
    full-table job). One append replays under its txn id and must be
    skipped without committing a version — a replayed blind append
    DUPLICATES rows, so exactly-once matters most on this verb. The
    aggregate columns assert the compacted table still equals the plain
    orders GROUP BY the oracle runs."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = ManifestTable(scratch_dir(prefix="sbp_compact_small_"))
    big = orders.filter(F.col("o_orderkey") % 10 < 7)
    tail = orders.filter(F.col("o_orderkey") % 10 >= 7)
    table.overwrite(big, n_files=1)
    big_rel = table.snapshot()["files"][0]
    big_size = os.path.getsize(os.path.join(table.root, big_rel))
    for i in range(8):
        table.append(
            tail.filter((F.col("o_orderkey") / 10).cast("long") % 8 == i),
            n_files=1,
            txn=("ingest", i),
        )
    v_before_replay = table.latest_version()
    table.append(tail.limit(5), n_files=1, txn=("ingest", 7))  # replay
    replay_skipped = table.latest_version() == v_before_replay

    ledger = table.compact_small(
        spark,
        target_file_bytes=1 << 30,
        small_file_bytes=big_size,
    )
    files_after = table.snapshot()["files"]
    big_file_carried = (
        big_rel in files_after
        and os.path.getsize(os.path.join(table.root, big_rel)) == big_size
        and ledger["n_files_carried"] == 1
    )
    packed_tail = (
        ledger["n_files_rewritten"] == 8
        and ledger["n_files_before"] == 9
        and len(files_after) == 2
    )
    return table.read(spark).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        F.lit(big_file_carried).alias("big_file_carried"),
        F.lit(packed_tail).alias("packed_tail"),
        F.lit(replay_skipped).alias("replay_skipped"),
    )


@register(
    cache_plan=False,
    name="lake_update_delete",
    oracle=f"""
    WITH updated AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CASE WHEN o_orderkey BETWEEN 2000 AND 2999
                       AND o_orderpriority = '1-URGENT'
                  THEN o_totalprice * 1.1 ELSE o_totalprice END
               AS o_totalprice
      FROM orders
    ),
    final AS (
      SELECT * FROM updated
      WHERE NOT (o_orderkey BETWEEN 8000 AND 8499 AND o_orderstatus = 'F')
    )
    SELECT o_orderpriority, count(*) AS n,
           {fixed_point_sum_sql("o_totalprice", 2)} AS sum_price,
           TRUE AS update_pruned, TRUE AS delete_pruned,
           TRUE AS carried_by_path
    FROM final GROUP BY o_orderpriority
    """,
)
def lake_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE and DELETE with touched-file pruning
    (lake.update_where / delete_where, api twins): orders is clustered
    on o_orderkey into 16 files, an UPDATE bumps urgent orders in one
    key band and a DELETE drops finished orders in another — each
    statement identifies the files containing matching rows with ONE
    pushdown scan, rewrites only those, and carries the rest
    byte-identical (the *_pruned / carried_by_path claims assert all
    three as oracle-checked values). This is the O(matching-files)
    mutation a 100 TB table needs: the alternative — rewriting the
    table per UPDATE — never finishes. The final state must equal the
    oracle's CASE/filter replay of both statements."""
    from dicebox_sensorybatchprocessor_spark import api

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    table = ManifestTable(scratch_dir(prefix="sbp_upd_del_"))
    table.overwrite(orders, cluster_by=("o_orderkey",), n_files=16)
    n_total = len(table.snapshot()["files"])
    before = set(table.snapshot()["files"])

    led_u = api.update_where(
        table,
        spark,
        {"o_totalprice": "o_totalprice * 1.1"},
        "o_orderkey BETWEEN 2000 AND 2999 AND o_orderpriority = '1-URGENT'",
    )
    led_d = api.delete_where(
        table,
        spark,
        "o_orderkey BETWEEN 8000 AND 8499 AND o_orderstatus = 'F'",
    )
    after = set(table.snapshot()["files"])
    update_pruned = 0 < led_u["n_files_touched"] < n_total
    delete_pruned = 0 < led_d["n_files_touched"] < n_total
    carried_by_path = len(before & after) >= n_total - (
        led_u["n_files_touched"] + led_d["n_files_touched"]
    )
    return table.read(spark).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        fixed_point_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        F.lit(update_pruned).alias("update_pruned"),
        F.lit(delete_pruned).alias("delete_pruned"),
        F.lit(carried_by_path).alias("carried_by_path"),
    )


@register(
    cache_plan=False,
    name="lake_constraints_restore",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n,
           {fixed_point_sum_sql("c_acctbal", 2)} AS sum_bal,
           TRUE AS bad_write_rejected, TRUE AS no_version_burned,
           TRUE AS restored_state_clean, TRUE AS history_intact
    FROM customer GROUP BY c_mktsegment
    """,
)
def lake_constraints_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-boundary CHECK constraints + RESTORE: the table declares
    c_acctbal >= -1000 (validated against existing data FIRST — a
    constraint the table already violates is never recorded), a
    violating merge is rejected WITHOUT burning a version (readers
    never see a bad row — enforcement is at the writer, where the error
    names the constraint and the first bad row), a valid merge then
    corrupts state legally, and RESTORE rolls back to the pre-merge
    version as a NEW commit — history is untouched, so the bad version
    stays inspectable for forensics. The final state must equal the
    original customer rollup, which the oracle computes directly."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table = ManifestTable(scratch_dir(prefix="sbp_constraints_"))
    merge_upsert(table, cust, ("c_custkey",), n_buckets=8)
    table.set_constraint("bal_floor", "c_acctbal >= -1000.0", spark)
    v_clean = table.latest_version()

    bad = cust.limit(1).select(
        "c_custkey", "c_mktsegment", F.lit(-999999.0).alias("c_acctbal")
    )
    bad_write_rejected = False
    try:
        merge_upsert(table, bad, ("c_custkey",))
    except ValueError as exc:
        bad_write_rejected = "bal_floor" in str(exc)
    no_version_burned = table.latest_version() == v_clean

    legal = cust.orderBy("c_custkey").limit(10).select(
        "c_custkey", F.lit("DRIFTED").alias("c_mktsegment"), "c_acctbal"
    )
    merge_upsert(table, legal, ("c_custkey",))
    v_bad = table.latest_version()
    table.restore(v_clean)
    restored_state_clean = (
        table.read(spark).filter(F.col("c_mktsegment") == "DRIFTED").count()
        == 0
    )
    history_intact = (
        table.read(spark, v_bad)
        .filter(F.col("c_mktsegment") == "DRIFTED")
        .count()
        == 10
        and table.latest_version() == v_bad + 1
    )
    return table.read(spark).groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        fixed_point_sum(F.col("c_acctbal"), 2).alias("sum_bal"),
        F.lit(bad_write_rejected).alias("bad_write_rejected"),
        F.lit(no_version_burned).alias("no_version_burned"),
        F.lit(restored_state_clean).alias("restored_state_clean"),
        F.lit(history_intact).alias("history_intact"),
    )


_MV_AVG = (
    f"({fixed_point_sum_sql('l_quantity', 6)}) / CAST(count(*) AS DOUBLE)"
)


@register(
    cache_plan=False,
    name="lake_incremental_mv",
    oracle=f"""
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
    ),
    b2 AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 25 = 0 THEN 'Z' ELSE l_returnflag END
               AS l_returnflag,
             l_quantity + 10 AS l_quantity
      FROM base WHERE l_orderkey % 5 = 0
    ),
    after2 AS (
      SELECT * FROM base WHERE l_orderkey % 5 <> 0
      UNION ALL SELECT * FROM b2
    ),
    after3 AS (SELECT * FROM after2 WHERE l_orderkey % 7 <> 0),
    b4key AS (
      SELECT l_orderkey, l_linenumber FROM base
      WHERE l_orderkey % 5 <> 0 AND l_orderkey % 7 <> 0
      ORDER BY l_orderkey, l_linenumber LIMIT 1
    ),
    final AS (
      SELECT a.l_orderkey, a.l_linenumber, a.l_returnflag,
             a.l_quantity + CASE WHEN b.l_orderkey IS NOT NULL THEN 5 ELSE 0 END
               AS l_quantity
      FROM after3 a LEFT JOIN b4key b
        ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    )
    SELECT l_returnflag, count(*) AS n,
           {fixed_point_sum_sql("l_quantity", 6)} AS sum_qty,
           {_MV_AVG} AS avg_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           TRUE AS incremental
    FROM final GROUP BY l_returnflag
    """,
)
def lake_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view (mv.MaterializedAgg): a GROUP BY
    over a bucketed lake table is refreshed after (1) the initial load,
    (2) an update batch that moves rows between groups, (3) a CDC
    delete feed — and every refresh computes its delta from the
    commit's added/removed files ONLY (never a full rescan; min/max
    repair reads just the delta's groups via a broadcast semi-join).
    The ``incremental`` claim column asserts, as a value the oracle
    checks, that the post-update refreshes scanned fewer files than the
    table holds; the remaining columns must equal a from-scratch GROUP
    BY of the final state, which the oracle computes directly."""
    from dicebox_sensorybatchprocessor_spark.mv import MaterializedAgg

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    table = ManifestTable(scratch_dir(prefix="sbp_mv_base_"))
    merge_upsert(table, li, ("l_orderkey", "l_linenumber"), n_buckets=8)
    view = MaterializedAgg(
        table,
        scratch_dir(prefix="sbp_mv_state_"),
        ("l_returnflag",),
        {
            "n": ("count", "*"),
            "sum_qty": ("sum", "l_quantity"),
            "avg_qty": ("avg", "l_quantity"),
            "min_qty": ("min", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
        },
    )
    # small_table_bytes=0: this query's CLAIM is the incremental
    # machinery itself (delta-file-proportional refresh), so it pins the
    # byte-ratio routing regime — the fixture tables sit under the 64 MB
    # floor where default auto now recomputes (r12, mv._route_refresh)
    view.refresh(spark, small_table_bytes=0)

    batch2 = li.filter(F.col("l_orderkey") % 5 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 25 == 0, "Z")
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
        (F.col("l_quantity") + 10).alias("l_quantity"),
    )
    merge_upsert(table, batch2, ("l_orderkey", "l_linenumber"))
    ledger2 = view.refresh(spark, small_table_bytes=0)

    feed = li.filter(F.col("l_orderkey") % 7 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("double").alias("l_quantity"),
        F.lit(1).alias("seq"),
        F.lit("delete").alias("op"),
    )
    lake.merge_apply(
        table, feed, ("l_orderkey", "l_linenumber"), op_col="op", seq_col="seq"
    )
    ledger3 = view.refresh(spark, small_table_bytes=0)

    # single-key commit: the delta-proportional refresh claim — one
    # bucket rewrites, so the refresh reads 2 files however big the table
    batch4 = (
        li.filter((F.col("l_orderkey") % 5 != 0) & (F.col("l_orderkey") % 7 != 0))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            (F.col("l_quantity") + 5).alias("l_quantity"),
        )
    )
    merge_upsert(table, batch4, ("l_orderkey", "l_linenumber"))
    ledger4 = view.refresh(spark, small_table_bytes=0)

    n_files = len(table.snapshot()["files"])
    incremental = (
        not any(led["noop"] for led in (ledger2, ledger3, ledger4))
        and ledger4["plus_files"] + ledger4["minus_files"] < n_files
        and ledger4["plus_files"] <= 1
    )
    return view.read(spark).withColumn("incremental", F.lit(incremental))
