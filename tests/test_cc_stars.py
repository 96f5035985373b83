"""Property tests for the large-star/small-star connected-components
helper behind dedup_clusters: logarithmic round count on the worst-case
(high-diameter) path graph, and label equality against an exact
union-find oracle on randomized graphs."""

from __future__ import annotations

import math
import random

from dicebox_sensorybatchprocessor_spark.llm.dedup import _connected_components


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node id of the component
    comp_min: dict[int, int] = {}
    for node in list(parent):
        root = find(node)
        comp_min[root] = min(comp_min.get(root, node), node)
    return {node: comp_min[find(node)] for node in parent}


def _spark_labels(spark, edges: list[tuple[int, int]]):
    # driver_budget_edges=0 forces the distributed star loop — these
    # property tests exist to exercise the SCALE path, not the
    # small-graph driver union-find route (which is itself tested for
    # route equivalence below).
    df = spark.createDataFrame(edges, "u long, v long")
    labels, rounds = _connected_components(df, driver_budget_edges=0)
    return {r["u"]: r["label"] for r in labels.collect()}, rounds


def test_path_graph_converges_in_log_rounds(spark):
    """A 128-node path is the worst case for plain min-label propagation
    (needs ~diameter = 127 rounds); the star alternation must finish in
    O(log n) — the bound that makes CC viable on 100 TB dup graphs."""
    n = 128
    edges = [(i, i + 1) for i in range(n - 1)]
    got, rounds = _spark_labels(spark, edges)
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for _ in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        got, _rounds = _spark_labels(spark, edges)
        assert got == _union_find_labels(edges)


def test_shapes_ring_star_disjoint(spark):
    ring = [(i, (i + 1) % 10) for i in range(10)]
    star = [(100, 100 + i) for i in range(1, 8)]
    pair = [(1000, 2000)]
    got, _rounds = _spark_labels(spark, ring + star + pair)
    expect = {i: 0 for i in range(10)}
    expect.update({100 + i: 100 for i in range(8)})
    expect.update({1000: 1000, 2000: 1000})
    assert got == expect


def test_keep_one_per_cluster_matches_union_find(spark):
    """api.keep_one_per_cluster over a random pair graph and a SUPERSET
    node relation must agree with the exact union-find oracle:
    cluster_id = component min (self for singletons), exactly one
    keeper per cluster (the min id), sizes consistent."""
    import collections

    from dicebox_sensorybatchprocessor_spark import api

    rng = random.Random(7)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
    edges = [e for e in edges if e[0] != e[1]]
    want = _union_find_labels(edges)
    df = spark.createDataFrame([(i,) for i in range(n)], "item long")
    pairs = spark.createDataFrame(edges, "a long, b long")
    out = api.keep_one_per_cluster(df, pairs, id_col="item", pair_cols=("a", "b"))
    rows = {r.item: r for r in out.collect()}
    assert len(rows) == n  # singleton completion covers every node
    for i in range(n):
        expect = want.get(i, i)
        assert rows[i].cluster_id == expect
        assert rows[i].keep == (i == expect)
    sizes = collections.Counter(r.cluster_id for r in rows.values())
    for i in range(n):
        assert rows[i].cluster_size == sizes[rows[i].cluster_id]


def test_driver_and_distributed_routes_agree(spark):
    """The size-gated driver union-find route (default budget) and the
    distributed star loop (budget forced to 0) must produce identical
    label relations — the invariant that makes the routing a pure
    performance decision."""
    rng = random.Random(99)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    df = spark.createDataFrame(edges, "u long, v long")
    driver_labels, driver_rounds = _connected_components(df)
    dist_labels, _ = _connected_components(df, driver_budget_edges=0)
    assert driver_rounds == 0  # small graph takes the driver route
    assert sorted(map(tuple, driver_labels.collect())) == sorted(
        map(tuple, dist_labels.collect())
    )


def test_dedup_communities_invariants(spark):
    """LPA-over-band-candidates invariants that hold regardless of the
    fixture's family sizes (2-cliques legitimately oscillate): community
    labels are real doc ids, docs with NO candidate pair are singletons
    labeled by their own id, and size-≥3 band CLIQUES converge to one
    community within 3 rounds (round-2 fixed point of synchronous LPA
    on a clique)."""
    from pyspark.sql import functions as F

    from dicebox_sensorybatchprocessor_spark import all_queries, api, load
    from dicebox_sensorybatchprocessor_spark.llm.dedup import (
        _MH_BANDS,
        _MH_ROWS,
        _shingles,
    )
    from tests.conftest import SF_ORACLE

    out = all_queries()["dedup_communities"].fn(spark, SF_ORACLE).collect()
    by_doc = {r["doc_id"]: (r["community"], r["community_size"]) for r in out}
    doc_ids = set(by_doc)
    assert {c for c, _ in by_doc.values()} <= doc_ids  # labels are doc ids

    cand = api.minhash_banded_candidates(
        _shingles(spark, SF_ORACLE), rows=_MH_ROWS, bands=_MH_BANDS
    ).collect()
    import collections

    adj = collections.defaultdict(set)
    for r in cand:
        adj[r["doc_a"]].add(r["doc_b"])
        adj[r["doc_b"]].add(r["doc_a"])
    for doc, (comm, size) in by_doc.items():
        if doc not in adj:
            assert (comm, size) == (doc, 1), f"isolated doc {doc} not singleton"
    # size->=3 cliques (every pair collides, no external edges) converge
    for doc, nbrs in adj.items():
        group = nbrs | {doc}
        if len(group) >= 3 and all(
            adj[m] == group - {m} for m in group
        ):
            comms = {by_doc[m][0] for m in group}
            assert comms == {min(group)}, f"clique {sorted(group)} -> {comms}"
