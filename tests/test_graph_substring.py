"""Unit/property tests for the round-12 session additions:
api.duplicate_spans (substring-level dedup) and
operators.graph.pagerank_fixed (integer fixed-point PageRank).

The parametrized oracle sweep (test_correctness.py) already value-checks
the registered queries against DuckDB; these tests pin the SEMANTIC
invariants the oracle can't see — span-merge correctness on constructed
corpora, rank-mass conservation, and partitioning-invariance of the
integer trajectory."""

from __future__ import annotations

from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark import api
from dicebox_sensorybatchprocessor_spark.operators.graph import (
    _SCALE,
    pagerank_fixed,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- spans


def test_duplicate_spans_short_docs_report_zero(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])  # < k=8 tokens
    out = {r["doc_id"]: r for r in api.duplicate_spans(df, k=8).collect()}
    assert out[1]["dup_tokens"] == 0 and out[1]["keep"]
    assert out[1]["n_tokens"] == 3


def test_duplicate_spans_full_copy_flags_everything(spark):
    text = " ".join(f"w{i}" for i in range(20))
    df = _docs(spark, [(1, text), (2, text), (3, "x " * 19 + "x")])
    out = {r["doc_id"]: r for r in api.duplicate_spans(df, k=8).collect()}
    # docs 1/2 are full copies: one maximal span covering all 20 tokens
    for d in (1, 2):
        assert out[d]["dup_spans"] == 1
        assert out[d]["dup_tokens"] == 20
        assert out[d]["dup_ratio"] == 1.0
        assert not out[d]["keep"]
    # doc 3 repeats ONE token 20 times -> every 8-shingle inside it is
    # identical (self-recurring), so it's also fully flagged: the
    # min_count=2 gate counts total occurrences, within-doc included
    assert out[3]["dup_tokens"] == 20 and not out[3]["keep"]


def test_duplicate_spans_merges_overlapping_islands(spark):
    # shared 10-token block at offsets 5..14 of doc 1 and 0..9 of doc 2;
    # the three recurring 8-shingles (starts 5,6,7 in doc 1) must merge
    # into ONE island of 10 tokens, not three spans
    shared = [f"s{i}" for i in range(10)]
    d1 = [f"a{i}" for i in range(5)] + shared + [f"b{i}" for i in range(5)]
    d2 = shared + [f"c{i}" for i in range(10)]
    df = _docs(spark, [(1, " ".join(d1)), (2, " ".join(d2))])
    out = {r["doc_id"]: r for r in api.duplicate_spans(df, k=8).collect()}
    assert out[1]["dup_spans"] == 1 and out[1]["dup_tokens"] == 10
    assert out[2]["dup_spans"] == 1 and out[2]["dup_tokens"] == 10
    assert out[1]["keep"]  # 10/20 == the 0.5 default gate boundary (<=)
    assert out[2]["keep"]


def test_duplicate_spans_partitioning_invariant(spark):
    text = " ".join(f"w{i % 13}" for i in range(40))
    rows = [(i, text if i % 3 == 0 else f"u{i} " * 30 + f"u{i}") for i in range(30)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, api.duplicate_spans(df, k=8).collect()))
    b = sorted(map(tuple, api.duplicate_spans(df.repartition(7), k=8).collect()))
    assert a == b


# ------------------------------------------------------------- pagerank


def _ring(spark, n):
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    return edges, nodes


def test_pagerank_ring_is_uniform(spark):
    # on a symmetric ring every node must hold identical mass at every
    # iteration — any asymmetry would be an ordering artifact
    edges, nodes = _ring(spark, 16)
    out = pagerank_fixed(edges, nodes, iterations=5).collect()
    vals = {r["rank_fp"] for r in out}
    assert len(vals) == 1
    assert abs(next(iter(vals)) - _SCALE // 16) <= 2  # div flooring slack


def test_pagerank_mass_conserved_within_flooring(spark):
    # total mass stays SCALE minus bounded integer-floor leakage:
    # each of the 5 rounds floors at most 1e-9 per edge contribution,
    # per-node damping div, and per-node teleport div
    edges, nodes = _ring(spark, 10)
    star = spark.createDataFrame(
        [(i, 0) for i in range(1, 10)], "src bigint, dst bigint"
    )
    for e in (edges, star.unionAll(edges)):
        out = pagerank_fixed(e, nodes, iterations=5).agg(
            F.sum("rank_fp")
        ).collect()[0][0]
        assert out <= _SCALE
        assert out >= _SCALE - 5 * (e.count() + 2 * 10)


def test_pagerank_sink_heavy_node_ranks_highest(spark):
    # star graph: everyone links to node 0, node 0 links to node 1
    n = 12
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n)] + [(0, 1)], "src bigint, dst bigint"
    )
    out = {r["node"]: r["rank_fp"] for r in pagerank_fixed(edges, nodes).collect()}
    assert out[0] == max(out.values())
    assert out[1] > out[2]  # node 1 inherits node 0's mass
    assert len({out[i] for i in range(2, n)}) == 1  # leaves identical


def test_pagerank_partitioning_invariant(spark):
    edges, nodes = _ring(spark, 32)
    extra = spark.createDataFrame(
        [(i, (7 * i + 3) % 32) for i in range(32)], "src bigint, dst bigint"
    )
    e = edges.unionAll(extra).distinct()
    a = sorted(map(tuple, pagerank_fixed(e, nodes).collect()))
    b = sorted(map(tuple, pagerank_fixed(e.repartition(11), nodes).collect()))
    assert a == b


def test_pagerank_dangling_mass_redistributed(spark):
    # node 0 is a true sink (no out-edge): its damped share must be
    # redistributed, not vanish — mass stays within flooring leakage
    n = 8
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n)], "src bigint, dst bigint"
    )
    out = {r["node"]: r["rank_fp"] for r in pagerank_fixed(edges, nodes).collect()}
    total = sum(out.values())
    # without redistribution the sink absorbs+drops ~7/8 of the mass per
    # round: after 5 rounds total collapses toward teleport-only ~0.15.
    # with redistribution total stays within integer-floor leakage.
    assert total >= _SCALE - 5 * (len(out) * 3 + n)
    assert out[0] == max(out.values())  # the sink still ranks highest
    assert len({out[i] for i in range(1, n)}) == 1


def test_pagerank_explicit_n_matches_counted(spark):
    edges, nodes = _ring(spark, 16)
    a = sorted(map(tuple, pagerank_fixed(edges, nodes).collect()))
    b = sorted(map(tuple, pagerank_fixed(edges, nodes, n=16).collect()))
    assert a == b


# ------------------------------------------------- property: brute force


def _spans_reference(docs: dict[int, list[str]], k: int, min_count: int):
    """O(everything) Python reference for duplicate_spans semantics."""
    from collections import Counter

    shingle_counts: Counter = Counter()
    positions: dict[int, list[int]] = {}
    for did, toks in docs.items():
        ps = list(range(0, max(len(toks) - k + 1, 0)))
        positions[did] = ps
        for p in ps:
            shingle_counts[" ".join(toks[p : p + k])] += 1
    out = {}
    for did, toks in docs.items():
        dup_ps = [
            p
            for p in positions[did]
            if shingle_counts[" ".join(toks[p : p + k])] >= min_count
        ]
        spans = []
        for p in dup_ps:
            if spans and p <= spans[-1][1] - (k - 1) + k:  # gap ≤ k merges
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k - 1))
            else:
                spans.append((p, p + k - 1))
        dup_tokens = sum(e - s + 1 for s, e in spans)
        out[did] = (len(toks), len(spans), dup_tokens)
    return out


def test_duplicate_spans_matches_bruteforce_on_random_corpora(spark):
    """Randomized differential test against the brute-force reference:
    tiny vocabulary + short docs force heavy shingle collisions, the
    regime where island merging and within-doc counting can go wrong."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    k = 3
    token = st.integers(min_value=0, max_value=4).map(lambda i: f"t{i}")
    doc = st.lists(token, min_size=1, max_size=14)
    corpus = st.lists(doc, min_size=1, max_size=7)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus=corpus)
    def run(corpus):
        docs = {i: toks for i, toks in enumerate(corpus)}
        df = _docs(spark, [(i, " ".join(t)) for i, t in docs.items()])
        got = {
            r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"])
            for r in api.duplicate_spans(df, k=k).collect()
        }
        assert got == _spans_reference(docs, k, 2)

    run()


# -------------------------------------------- personalized pagerank (r13)


def test_ppr_mass_starts_and_restarts_at_seeds(spark):
    from dicebox_sensorybatchprocessor_spark.operators.graph import (
        personalized_pagerank,
    )

    # chain 0→1→2→3→4 with a sink at 4; seed = {0}
    nodes = spark.range(5).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(0,)], "node bigint")
    out = {
        r["node"]: r["rank_fp"]
        for r in personalized_pagerank(edges, nodes, seeds).collect()
    }
    # proximity decay from the seed: strictly decreasing along the chain
    # until the sink (which accumulates what is not yet restarted)
    assert out[0] > out[1] > out[2] > out[3]
    # total mass conserved within flooring leakage
    assert sum(out.values()) <= _SCALE
    assert sum(out.values()) >= _SCALE - 5 * (5 * 3 + 4)


def test_ppr_unreachable_component_gets_zero(spark):
    from dicebox_sensorybatchprocessor_spark.operators.graph import (
        personalized_pagerank,
    )

    # two disjoint rings; seeds only in the first — the second must
    # hold exactly zero mass every round (no uniform teleport in PPR)
    nodes = spark.range(8).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)]
        + [(4 + i, 4 + (i + 1) % 4) for i in range(4)],
        "src bigint, dst bigint",
    )
    seeds = spark.createDataFrame([(0,), (1,)], "node bigint")
    out = {
        r["node"]: r["rank_fp"]
        for r in personalized_pagerank(edges, nodes, seeds).collect()
    }
    assert all(out[i] == 0 for i in range(4, 8))
    assert all(out[i] > 0 for i in range(4))


def test_ppr_partitioning_invariant(spark):
    from dicebox_sensorybatchprocessor_spark.operators.graph import (
        personalized_pagerank,
    )

    nodes = spark.range(20).select(F.col("id").alias("node"))
    edges = spark.createDataFrame(
        [(i, (3 * i + 1) % 20) for i in range(20)]
        + [(i, (7 * i + 5) % 20) for i in range(20)],
        "src bigint, dst bigint",
    ).distinct()
    seeds = spark.createDataFrame([(0,), (5,), (10,)], "node bigint")
    a = sorted(map(tuple, personalized_pagerank(edges, nodes, seeds).collect()))
    b = sorted(
        map(
            tuple,
            personalized_pagerank(
                edges.repartition(9), nodes, seeds
            ).collect(),
        )
    )
    assert a == b


# ------------------------------------- incremental substring dedup (r13)


def test_incremental_spans_match_oneshot_restricted_to_arrivals(spark):
    """The banked incremental contract: after any batch, its flagged
    output equals the ONE-SHOT duplicate_spans over everything seen so
    far, RESTRICTED to that batch's ids — proven over three batches
    with cross-batch, within-batch, and retroactive-only duplication."""
    shared = " ".join(f"s{i}" for i in range(12))
    b1 = _docs(spark, [(1, shared), (2, "a " * 11 + "a")])
    b2 = _docs(spark, [(3, shared), (4, " ".join(f"u{i}" for i in range(12)))])
    b3 = _docs(spark, [(5, " ".join(f"u{i}" for i in range(12)))])
    batches = [b1, b2, b3]
    state = None
    seen = None
    for b in batches:
        flagged, state = api.duplicate_spans_incremental(b, state)
        seen = b if seen is None else seen.unionAll(b)
        ids = {r["doc_id"] for r in b.select("doc_id").collect()}
        oneshot = {
            r["doc_id"]: tuple(r)
            for r in api.duplicate_spans(seen).collect()
            if r["doc_id"] in ids
        }
        got = {r["doc_id"]: tuple(r) for r in flagged.collect()}
        assert got == oneshot
    # the final state's counts equal the one-shot shingle multiset
    from dicebox_sensorybatchprocessor_spark.api import _shingle_relation

    _, sh = _shingle_relation(seen, "text", "doc_id", 8)
    truth = {
        r["__sbp_h"]: r["c"]
        for r in sh.groupBy("__sbp_h").agg(F.count("*").alias("c")).collect()
    }
    got_state = {r["__sbp_h"]: r["__sbp_c"] for r in state.collect()}
    assert got_state == truth


def test_incremental_first_batch_equals_batch_path(spark):
    text = " ".join(f"w{i % 5}" for i in range(30))
    b = _docs(spark, [(i, text if i % 2 == 0 else f"z{i} " * 20 + "end") for i in range(8)])
    flagged, _ = api.duplicate_spans_incremental(b, None)
    direct = sorted(map(tuple, api.duplicate_spans(b).collect()))
    assert sorted(map(tuple, flagged.collect())) == direct


def test_ppr_oracle_generator_matches_spark(spark):
    """The banked r13 registration pair: personalized_pagerank over the
    derived doc link graph (seeds = doc_id % 50 == 0) must equal the
    unrolled-CTE DuckDB oracle _ppr_oracle emits — verified here so the
    r13 registration is a two-line change with the hard part already
    red/green."""
    from dicebox_sensorybatchprocessor_spark import load
    from dicebox_sensorybatchprocessor_spark.operators.graph import (
        _ppr_oracle,
        personalized_pagerank,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle import run_oracle

    d = load(spark, SF_ORACLE, "documents").select("doc_id")
    n = d.count()
    srcs = [
        d.select(
            F.col("doc_id").alias("src"),
            ((F.lit(a) * F.col("doc_id") + F.lit(c)) % F.lit(n)).alias("dst"),
        )
        for a, c in ((2, 1), (3, 2), (5, 3))
    ]
    edges = srcs[0].unionAll(srcs[1]).unionAll(srcs[2]).distinct()
    seeds = d.filter("doc_id % 50 = 0").select(F.col("doc_id").alias("node"))
    got = sorted(
        tuple(r)
        for r in personalized_pagerank(
            edges, d.select(F.col("doc_id").alias("node")), seeds
        ).collect()
    )
    want_df = run_oracle(_ppr_oracle(5, 50), SF_ORACLE)
    want = sorted(
        tuple(r)
        for r in want_df[["doc_id", "rank_fp", "rank"]].itertuples(index=False)
    )
    assert got == want


def test_rewrite_matches_bruteforce_on_random_corpora(spark):
    """Same randomized differential as the detection test, for the SCRUB
    leg: clean_text must equal the reference's token-level removal."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    k = 3
    token = st.integers(min_value=0, max_value=4).map(lambda i: f"t{i}")
    doc = st.lists(token, min_size=1, max_size=14)
    corpus = st.lists(doc, min_size=1, max_size=6)

    def reference_clean(docs, k, min_count):
        from collections import Counter

        counts: Counter = Counter()
        for toks in docs.values():
            for p in range(len(toks) - k + 1):
                counts[" ".join(toks[p : p + k])] += 1
        out = {}
        for did, toks in docs.items():
            covered = set()
            for p in range(len(toks) - k + 1):
                if counts[" ".join(toks[p : p + k])] >= min_count:
                    covered.update(range(p, p + k))
            out[did] = " ".join(
                t for i, t in enumerate(toks) if i not in covered
            )
        return out

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus=corpus)
    def run(corpus):
        docs = {i: toks for i, toks in enumerate(corpus)}
        df = _docs(spark, [(i, " ".join(t)) for i, t in docs.items()])
        got = {
            r["doc_id"]: r["clean_text"]
            for r in api.remove_duplicate_spans(df, k=k).collect()
        }
        assert got == reference_clean(docs, k, 2)

    run()


def test_substring_dedup_stream_end_to_end(spark):
    """The banked streaming wiring (r13 backlog #3a): three file-source
    micro-batches flow through api.substring_dedup_stream; the RESULTS
    table must equal the concatenation of per-batch one-shot
    restrictions (the incremental exactness contract, now across a real
    stream + manifest commits), the STATE table must equal the full
    corpus's shingle-count multiset, and both tables carry the
    exactly-once txn markers for the last batch."""
    from dicebox_sensorybatchprocessor_spark import api, lake
    from dicebox_sensorybatchprocessor_spark.api import _shingle_relation
    from dicebox_sensorybatchprocessor_spark.streaming.streams import (
        _stage_files,
        _streaming_session,
    )
    from dicebox_sensorybatchprocessor_spark.utils import scratch_dir

    s = _streaming_session(spark)
    shared = " ".join(f"s{i}" for i in range(12))
    batches = [
        spark.createDataFrame(
            rows, "doc_id bigint, text string"
        )
        for rows in (
            [(1, shared), (2, "a " * 11 + "a")],
            [(3, shared), (4, " ".join(f"u{i}" for i in range(12)))],
            [(5, " ".join(f"u{i}" for i in range(12)))],
        )
    ]
    staged = _stage_files(s, batches, "substr")
    stream = s.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(staged)
    res_t = lake.ManifestTable(scratch_dir(prefix="sbp_substr_res_"))
    state_t = lake.ManifestTable(scratch_dir(prefix="sbp_substr_state_"))
    q = api.substring_dedup_stream(
        stream, res_t, state_t,
        checkpoint_dir=scratch_dir(prefix="sbp_ck_substr_t_"),
        txn_app_id="substr_test",
    )
    q.awaitTermination()

    # expected: per-batch incremental == one-shot restricted to arrivals
    expected = {}
    seen = None
    for b in batches:
        seen = b if seen is None else seen.unionAll(b)
        ids = {r["doc_id"] for r in b.select("doc_id").collect()}
        for r in api.duplicate_spans(seen).collect():
            if r["doc_id"] in ids:
                expected[r["doc_id"]] = tuple(r)
    got = {r["doc_id"]: tuple(r) for r in res_t.read(s).collect()}
    assert got == expected

    _, sh = _shingle_relation(seen, "text", "doc_id", 8)
    truth = {
        r["__sbp_h"]: r["c"]
        for r in sh.groupBy("__sbp_h").agg(F.count("*").alias("c")).collect()
    }
    state = {r["__sbp_h"]: r["__sbp_c"] for r in state_t.read(s).collect()}
    assert state == truth
    assert res_t.txn_version("substr_test:res") == 2  # batches 0..2
    assert state_t.txn_version("substr_test:state") == 2


def test_substring_stream_replay_after_partial_batch(spark):
    """The write-order claim under a simulated crash: batch N's RESULTS
    append lands but its STATE merge does not (crash between the two
    commits). The replay must (a) skip the results append via its txn,
    (b) still compute flagging against the PRE-batch state (the exact
    hazard of the inverse order), and (c) complete the state merge —
    ending bit-identical to a never-crashed run."""
    from dicebox_sensorybatchprocessor_spark import api, lake
    from dicebox_sensorybatchprocessor_spark.utils import scratch_dir

    text_a = " ".join(f"p{i}" for i in range(12))
    b0 = spark.createDataFrame([(1, text_a)], "doc_id bigint, text string")
    b1 = spark.createDataFrame(
        [(2, text_a), (3, "q " * 11 + "q")], "doc_id bigint, text string"
    )

    def run(crash_between: bool):
        res_t = lake.ManifestTable(scratch_dir(prefix="sbp_replay_res_"))
        state_t = lake.ManifestTable(scratch_dir(prefix="sbp_replay_state_"))

        def process(batch_df, batch_id, skip_state=False):
            state_df = state_t.read(spark) if state_t.data_files() else None
            flagged, new_state = api.duplicate_spans_incremental(
                batch_df, state_df
            )
            res_t.append(flagged, txn=("app:res", batch_id))
            if not skip_state:
                lake.merge_upsert(
                    state_t, new_state, ("__sbp_h",), txn=("app:state", batch_id)
                )

        process(b0, 0)
        if crash_between:
            process(b1, 1, skip_state=True)  # crash after results commit
            process(b1, 1)  # checkpoint replay re-runs the whole batch
        else:
            process(b1, 1)
        res = sorted(map(tuple, res_t.read(spark).collect()))
        st = sorted(map(tuple, state_t.read(spark).collect()))
        return res, st

    clean = run(crash_between=False)
    replayed = run(crash_between=True)
    assert replayed == clean
    # and the flagging itself is right: doc 2 (a copy of doc 1) is fully
    # flagged, doc 3's self-repeats are flagged, doc 1 was clean at its time
    res = {r[0]: r for r in clean[0]}
    assert res[1][3] == 0 and res[2][3] == 12 and res[3][3] == 12


def test_sq8_banked_pair_matches_oracle(spark):
    """The banked SQ8 registration pair: the query-shape function must
    hash-match its oracle SQL today, so the r13 registration is one
    decorator."""
    from dicebox_sensorybatchprocessor_spark.llm.similarity import (
        _SQ8_ORACLE,
        sim_ann_sq8_banked,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle import assert_query_matches

    assert_query_matches(
        sim_ann_sq8_banked(spark, SF_ORACLE), _SQ8_ORACLE, SF_ORACLE
    )


def test_stream_substring_banked_pair_matches_oracle(spark):
    """The banked streaming registration pair must hash-match its fully
    value-checked oracle (cumulative per-batch shingle counts in SQL)
    today — r13 registration is one decorator."""
    from dicebox_sensorybatchprocessor_spark.streaming.streams import (
        _SUBSTR_STREAM_ORACLE,
        stream_substring_dedup_banked,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle import assert_query_matches

    assert_query_matches(
        stream_substring_dedup_banked(spark, SF_ORACLE),
        _SUBSTR_STREAM_ORACLE,
        SF_ORACLE,
    )


def test_incremental_state_delta_only_touched_keys_upsert_equivalent(spark):
    """ADVICE r13 #1: ``state_delta=True`` must (a) leave the flagged
    output bit-identical to the full-state mode, (b) return ONLY the
    batch's distinct shingle keys (the O(batch) width the docstring
    claims), and (c) produce the identical final state when each
    batch's delta is upserted through merge_upsert — the production
    sink path that motivated the mode (full-state upserts rewrote the
    whole table every micro-batch)."""
    from dicebox_sensorybatchprocessor_spark import lake
    from dicebox_sensorybatchprocessor_spark.api import _shingle_relation
    from dicebox_sensorybatchprocessor_spark.utils import scratch_dir

    shared = " ".join(f"s{i}" for i in range(12))
    batches = [
        _docs(spark, [(1, shared), (2, "a " * 11 + "a")]),
        _docs(spark, [(3, shared), (4, " ".join(f"u{i}" for i in range(12)))]),
        _docs(spark, [(5, " ".join(f"u{i}" for i in range(12)))]),
    ]
    full_state, delta_state = None, None
    t_full = lake.ManifestTable(scratch_dir(prefix="sbp_delta_full_"))
    t_delta = lake.ManifestTable(scratch_dir(prefix="sbp_delta_delta_"))
    for b in batches:
        f_full, full_state = api.duplicate_spans_incremental(b, full_state)
        f_delta, delta = api.duplicate_spans_incremental(
            b,
            t_delta.read(spark) if t_delta.data_files() else None,
            state_delta=True,
        )
        # (a) flagging identical in both modes
        assert sorted(map(tuple, f_full.collect())) == sorted(
            map(tuple, f_delta.collect())
        )
        # (b) delta keys == the batch's distinct shingle hashes, exactly
        _, sh = _shingle_relation(b, "text", "doc_id", 8)
        batch_keys = {r["__sbp_h"] for r in sh.select("__sbp_h").distinct().collect()}
        assert {r["__sbp_h"] for r in delta.collect()} == batch_keys
        # (c) both upsert routes advance the persisted state
        lake.merge_upsert(t_full, full_state, ("__sbp_h",))
        lake.merge_upsert(t_delta, delta, ("__sbp_h",))
    final_full = sorted(map(tuple, t_full.read(spark).collect()))
    final_delta = sorted(map(tuple, t_delta.read(spark).collect()))
    assert final_full == final_delta
    # and the final state is the one-shot truth over everything seen
    seen = batches[0]
    for b in batches[1:]:
        seen = seen.unionAll(b)
    _, sh = _shingle_relation(seen, "text", "doc_id", 8)
    truth = sorted(
        (r["__sbp_h"], r["c"])
        for r in sh.groupBy("__sbp_h").agg(F.count("*").alias("c")).collect()
    )
    assert final_delta == truth


def test_substring_delta_rewrites_only_touched_buckets(spark):
    """The 100 TB cost claim behind ADVICE r13 #1, proven at the file
    level: with a BUCKETED state table, upserting the ``state_delta``
    form rewrites only the buckets the batch's shingles land in —
    untouched buckets' files carry into the new manifest byte-identical
    (same path) — while upserting the full merged state touches every
    non-empty bucket and carries nothing."""
    from dicebox_sensorybatchprocessor_spark import lake
    from dicebox_sensorybatchprocessor_spark.utils import scratch_dir

    wide = [
        (i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(40)
    ]
    b1 = _docs(spark, wide)
    b2 = _docs(spark, [(99, " ".join(f"z{j}" for j in range(12)))])

    def run(delta_mode: bool):
        t = lake.ManifestTable(
            scratch_dir(prefix=f"sbp_bucket_{'d' if delta_mode else 'f'}_")
        )
        _, s1 = api.duplicate_spans_incremental(b1, None, state_delta=delta_mode)
        lake.merge_upsert(t, s1, ("__sbp_h",), n_buckets=8)
        v1 = set(t.data_files())
        _, s2 = api.duplicate_spans_incremental(
            b2, t.read(spark), state_delta=delta_mode
        )
        lake.merge_upsert(t, s2, ("__sbp_h",))
        return v1, set(t.data_files())

    v1d, v2d = run(delta_mode=True)
    # the 1-doc batch has ≤5 distinct shingles → ≤5 of 8 buckets touched:
    # at least 3 of b1's bucket files must be carried verbatim
    assert len(v1d & v2d) >= 3
    v1f, v2f = run(delta_mode=False)
    # the full merged state carries EVERY standing key → every non-empty
    # bucket is rewritten and no data file survives by path
    assert not (v1f & v2f)
    # and both routes agree on the final state content
    d = sorted(map(tuple, spark.read.parquet(*v2d).collect()))
    f = sorted(map(tuple, spark.read.parquet(*v2f).collect()))
    assert d == f


def test_label_propagation_two_triangles(spark):
    """Two disjoint triangles must converge to two communities labeled by
    each triangle's smallest node id — and the min-label tie-break makes
    round 1 already assign every node its triangle's minimum over the
    symmetrized neighborhood."""
    from dicebox_sensorybatchprocessor_spark.operators.graph import (
        label_propagation_fixed,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)],
        "src bigint, dst bigint",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 10, 11, 12)], "node bigint"
    )
    out = {
        r["node"]: r["community"]
        for r in label_propagation_fixed(
            edges, nodes, iterations=3, materialize=False
        ).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_label_propagation_isolated_node_keeps_own_label(spark):
    """A node with no edges never appears on the symmetrized dst side —
    it must keep its own label through every round, not vanish or null."""
    from dicebox_sensorybatchprocessor_spark.operators.graph import (
        label_propagation_fixed,
    )

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "node bigint")
    out = {
        r["node"]: r["community"]
        for r in label_propagation_fixed(
            edges, nodes, iterations=2, materialize=False
        ).collect()
    }
    assert out[99] == 99
    # synchronous LPA's documented two-node oscillation: the pair swaps
    # labels each round (even rounds restore 1, odd rounds hold 2's slot
    # at the swapped value) — deterministic, mirrored exactly by the
    # oracle's unrolled CTEs; larger structures converge (see the
    # two-triangles test)
    assert out[1] == 1 and out[2] == 2


# ------------------------------------------------- checkpoint_every


def _explain_len(df):
    """Formatted physical-plan string length — a lineage-depth proxy:
    an O(iterations) unchecked loop plan grows linearly in it, a
    mid-loop localCheckpoint resets it to the post-checkpoint suffix."""
    qe = df._jdf.queryExecution()
    return len(
        df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")
    )


def test_pagerank_checkpoint_every_matches_and_bounds_lineage(spark):
    """VERDICT r14 Next #5: the docstring's promised mid-loop checkpoint
    cadence is now a real parameter — identical rank trajectory at
    iterations=12, and the returned plan covers only the post-checkpoint
    suffix (lineage bounded instead of O(iterations))."""
    edges, nodes = _ring(spark, 12)
    # redistribute_dangling=False: a ring has no dangling nodes so the
    # results are identical, and the per-round d_sum crossJoin otherwise
    # DOUBLES the unchecked plan tree every iteration — the 12-deep
    # default-path base plan is exactly the lineage bomb this parameter
    # exists to defuse, too hot to build even once in a test
    base = pagerank_fixed(
        edges, nodes, iterations=12, materialize=False,
        redistribute_dangling=False,
    )
    ck = pagerank_fixed(
        edges, nodes, iterations=12, materialize=False,
        redistribute_dangling=False, checkpoint_every=5,
    )
    assert sorted(map(tuple, ck.collect())) == sorted(
        map(tuple, base.collect())
    )
    # checkpoints fire after rounds 5 and 10; the final plan holds only
    # rounds 11-12, so it must be a small fraction of the 12-deep chain
    assert _explain_len(ck) < _explain_len(base) / 2


def test_label_propagation_checkpoint_every_matches_and_bounds_lineage(spark):
    from dicebox_sensorybatchprocessor_spark.operators.graph import (
        label_propagation_fixed,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)],
        "src bigint, dst bigint",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 10, 11, 12)], "node bigint"
    )
    # LPA references the label relation TWICE per round (count join +
    # coalesce fallback), so the unchecked tree DOUBLES per iteration —
    # depth 8 (2^8 subtree copies) is the deepest base Catalyst can
    # still analyze in test time; the checkpointed twin stays shallow
    # at any depth, which is the point
    base = label_propagation_fixed(
        edges, nodes, iterations=8, materialize=False
    )
    ck = label_propagation_fixed(
        edges, nodes, iterations=8, materialize=False, checkpoint_every=3
    )
    assert sorted(map(tuple, ck.collect())) == sorted(
        map(tuple, base.collect())
    )
    # checkpoints fired after rounds 3 and 6: the ck plan holds only
    # rounds 7-8 (4 subtree copies) vs the base's 2^8
    assert _explain_len(ck) < _explain_len(base) / 2
