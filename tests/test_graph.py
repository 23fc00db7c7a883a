"""Oracle-diffed and semantic tests for the PageRank operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators.graph import SCALE, pagerank
from tests.oracle import assert_matches_oracle


def test_pagerank_matches_oracle_small(spark, sf_dir):
    q = registry.queries()["pagerank_trade_graph"]
    sql = registry.oracle_sql()["pagerank_trade_graph"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


def test_pagerank_matches_oracle_sf001(spark, oracle_sf_dir):
    q = registry.queries()["pagerank_trade_graph"]
    sql = registry.oracle_sql()["pagerank_trade_graph"]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_pagerank_mass_conserved_on_cycle(spark):
    """On a directed cycle every node keeps exactly the uniform rank (up to
    integer-floor loss), independent of partitioning."""
    n = 6
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)], ["src", "dst"]
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert len(ranks) == n
    assert len(set(ranks.values())) == 1  # symmetry: all equal
    # uniform rank survives: base + d*(SCALE/n) ≈ SCALE/n
    assert abs(next(iter(ranks.values())) - SCALE // n) <= 2


def test_pagerank_sink_attracts_rank(spark):
    """A node every other node points to must out-rank the pointers."""
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        ["src", "dst"],
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iters=2).collect()}
    assert ranks["hub"] > ranks["b"] and ranks["hub"] > ranks["c"]


def test_star_components_equals_label_propagation(spark, sf_dir):
    """Large-star/small-star contraction must reach the identical
    fixpoint (component = min reachable id) as min-label propagation —
    on a diameter-9 chain, a triangle, an isolated node, and the real
    MinHash near-dup graph."""
    from mapreducemovieanalysis_cloud_spark.operators import dedup
    from mapreducemovieanalysis_cloud_spark.operators.clustering import (
        label_propagation_components,
        star_components,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    nodes = spark.createDataFrame([(i,) for i in range(14)], "doc_id long")
    chain = [(i, i + 1) for i in range(9)]
    tri = [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(chain + tri, "src long, dst long")
    a = {
        r.doc_id: r.component
        for r in label_propagation_components(nodes, edges).collect()
    }
    b = {
        r.doc_id: r.component
        for r in star_components(nodes, edges).collect()
    }
    assert a == b and b[9] == 0 and b[12] == 10 and b[13] == 13

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(
        docs, n=3, num_hashes=16, bands=4, threshold=0.5
    )
    g_edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    want = {
        r.doc_id: r.component
        for r in label_propagation_components(docs, g_edges).collect()
    }
    got = {
        r.doc_id: r.component
        for r in star_components(docs, g_edges).collect()
    }
    assert got == want


def test_star_components_raises_without_confirmed_fixpoint(spark):
    """Exhausting max_iters before the exact fixpoint confirm must raise —
    silently returning half-contracted stars would be wrong components."""
    import pytest

    from mapreducemovieanalysis_cloud_spark.operators.clustering import (
        star_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="confirmed fixpoint"):
        star_components(nodes, chain, max_iters=1)
    # and one round more than needed is fine (confirm costs a round)
    out = {
        r.doc_id: r.component
        for r in star_components(nodes, chain, max_iters=8).collect()
    }
    assert set(out.values()) == {0}


def test_k_core_matches_serial_peel(spark, sf_dir):
    """Distributed peel equals the serial reference k-core on the
    supplier co-supply graph, for several k."""
    from mapreducemovieanalysis_cloud_spark.operators import graph
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(
        lineitem, "l_orderkey", "l_suppkey", min_shared=2
    ).localCheckpoint()
    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        adj.setdefault(r["u"], set()).add(r["v"])
        adj.setdefault(r["v"], set()).add(r["u"])

    def serial_k_core(k: int) -> set[int]:
        alive = {n for n in adj}
        changed = True
        while changed:
            changed = False
            for n in list(alive):
                if len(adj[n] & alive) < k:
                    alive.discard(n)
                    changed = True
        return alive

    for k in (2, 3, 5):
        got = {
            r["node"] for r in graph.k_core(edges, k=k).collect()
        }
        assert got == serial_k_core(k), k


def test_k_core_invariants(spark):
    """Every member keeps >= k neighbours INSIDE the core; a node just
    outside (chain tail) is excluded; empty result when k exceeds the
    graph's degeneracy."""
    from mapreducemovieanalysis_cloud_spark.operators import graph

    # triangle (1,2,3) with a pendant chain 3-4-5
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "u LONG, v LONG"
    )
    core2 = {r["node"] for r in graph.k_core(edges, k=2).collect()}
    assert core2 == {1, 2, 3}
    assert graph.k_core(edges, k=3).count() == 0


def test_two_hop_reach_serial_reference(spark):
    """2-hop reach on a crafted graph equals BFS depth-2 set sizes:
    path a-b-c-d (a reaches b,c; b reaches a,c,d), plus an isolated
    edge x-y."""
    from mapreducemovieanalysis_cloud_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "u LONG, v LONG"
    )
    got = {
        r["node"]: r["n_reachable"]
        for r in graph.two_hop_reach(edges).collect()
    }
    assert got == {1: 2, 2: 3, 3: 3, 4: 2, 10: 1, 11: 1}


def test_two_hop_reach_registry_oracle(spark, sf_dir, oracle_sf_dir):
    from mapreducemovieanalysis_cloud_spark import registry
    from tests.oracle import assert_matches_oracle

    sql = registry.oracle_sql()["two_hop_reach_suppliers"]
    q = registry.queries()["two_hop_reach_suppliers"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_ppr_matches_oracle_small(spark, sf_dir):
    q = registry.queries()["ppr_nation_customers"]
    sql = registry.oracle_sql()["ppr_nation_customers"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


def test_ppr_matches_oracle_sf001(spark, oracle_sf_dir):
    q = registry.queries()["ppr_nation_customers"]
    sql = registry.oracle_sql()["ppr_nation_customers"]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_ppr_restart_mass_stays_near_seeds(spark):
    """Two disconnected components; seeds in one. All rank lives in the
    seeded component; non-seed nodes there earn rank only through edges
    (propagated), and the other component is all-zero."""
    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    ranks = {
        r.node: r.rank
        for r in personalized_pagerank(edges, seeds, iters=3).collect()
    }
    assert ranks["x"] == 0 and ranks["y"] == 0
    assert ranks["a"] > 0 and ranks["b"] > 0
    # the restart share re-lands on the seed every iteration
    assert ranks["a"] >= (100 - 85) * SCALE // 100
