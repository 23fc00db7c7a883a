"""Second wave of randomized graph-kernel replays (hypothesis) — the
two kernels the round-10/11 property layer left without an independent
python brute force:

* star_components == union-find over random edge sets (the existing
  pins are the label-propagation equivalence and the recursive-CTE
  oracle; this adds a third, structurally independent derivation of
  the same fixpoint — component = min reachable id);
* personalized_pagerank == the exact integer seeded-restart replay
  (pagerank and pagerank_weighted have theirs; PPR's seed-gated
  restart term was the uncovered arm).

Each example costs Spark jobs, so example counts are deliberately
small (the test_properties.py convention)."""

from __future__ import annotations

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EDGES = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=20,
).map(
    lambda ps: sorted({(min(u, v), max(u, v)) for u, v in ps if u != v})
)

_DEDGES = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=18,
).map(lambda ps: sorted({(u, v) for u, v in ps if u != v}))


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


@given(edges=_EDGES)
@settings(**_SETTINGS)
def test_star_components_matches_union_find(spark, edges):
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators.clustering import (
        star_components,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = (
        df.select(F.col("src").alias("node"))
        .union(df.select(F.col("dst").alias("node")))
        .distinct()
    )
    got = {
        r.node: r.component
        for r in star_components(nodes, df, id_col="node").collect()
    }
    assert got == _union_find_components(edges)


def _ppr_replay(edges, seeds, iters=2, damping_pct=85, scale=10**9):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seeds = sorted(set(seeds) & set(nodes))
    n_seed = len(seeds)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {
        v: (scale // n_seed if v in seeds else 0) for v in nodes
    }
    base = (100 - damping_pct) * scale
    for _ in range(iters):
        contrib = {}
        for u, v in edges:
            contrib[v] = contrib.get(v, 0) + rank[u] // deg[u]
        rank = {
            v: (base // (100 * n_seed) if v in seeds else 0)
            + (damping_pct * contrib.get(v, 0)) // 100
            for v in nodes
        }
    return rank


@given(dedges=_DEDGES, seed_mod=st.integers(2, 4))
@settings(**_SETTINGS)
def test_personalized_pagerank_matches_integer_replay(
    spark, dedges, seed_mod
):
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators import graph

    nodes = sorted({u for u, _ in dedges} | {v for _, v in dedges})
    seeds = [n for n in nodes if n % seed_mod == 0]
    assume(seeds)
    df = spark.createDataFrame(dedges, "src long, dst long")
    seed_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r.node: r.rank
        for r in graph.personalized_pagerank(df, seed_df).collect()
    }
    assert got == _ppr_replay(dedges, seeds)
