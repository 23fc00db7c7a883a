"""Property-based tests (hypothesis) for the graph kernels and the
round-13 training-data operators, against exhaustive python replays on
random small graphs/corpora — randomized structure where the fixed
fixtures pin single shapes:

* triangle_counts == per-node triangle membership counted by brute
  force over all node triples, for ANY edge set (the degree-ordered
  orientation must neither lose nor double-count a triangle);
* _edge_support == per-edge common-neighbor counts (the k-truss
  support kernel rewritten onto the oriented triangle list this round
  — the property that rewrite must preserve);
* ktruss_edges == the fixed-round python pruning replay;
* hits_scores == the exact integer 2-iteration HITS replay;
* preference_pairs == the two-mirror-sort python replay (pins the
  rw = n + 1 - rb arithmetic-mirror derivation);
* skipgram_pair_counts == the windowed 1/d-weight pair replay.

Each example costs Spark jobs, so example counts are deliberately
small (the test_properties.py convention)."""

from __future__ import annotations

from itertools import combinations

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


def _adj(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _triangles(edges):
    es, adj = set(edges), _adj(edges)
    return [
        (a, b, c)
        for a, b, c in combinations(sorted(adj), 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    ]


def _support(edges):
    adj = _adj(edges)
    out = {}
    for u, v in edges:
        s = len(adj[u] & adj[v])
        if s:
            out[(u, v)] = s
    return out


@given(edges=_EDGES)
@settings(**_SETTINGS)
def test_triangle_counts_matches_bruteforce(spark, edges):
    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        triangle_counts,
    )

    assume(edges)
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(df, topk=100).collect()
    }
    want = {}
    for t in _triangles(edges):
        for n in t:
            want[n] = want.get(n, 0) + 1
    assert got == want


@given(edges=_EDGES)
@settings(**_SETTINGS)
def test_edge_support_matches_bruteforce(spark, edges):
    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        _edge_support,
    )

    assume(edges)
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {(r.u, r.v): r.support for r in _edge_support(df).collect()}
    assert got == _support(edges)


@given(edges=_EDGES, k=st.integers(3, 5))
@settings(**_SETTINGS)
def test_ktruss_fixed_rounds_matches_python(spark, edges, k):
    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        ktruss_edges,
    )

    assume(edges)
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        (r.u, r.v): r.support
        for r in ktruss_edges(df, k=k, rounds=2).collect()
    }
    cur = list(edges)
    sup = _support(cur)
    cur = [e for e in cur if sup.get(e, 0) >= k - 2]
    sup = _support(cur)
    want = {e: s for e, s in sup.items() if s >= k - 2}
    assert got == want


@given(
    dedges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_hits_matches_python_replay(spark, dedges):
    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        hits_scores,
    )

    es = sorted({(f"s{u}", f"t{v}") for u, v in dedges})
    df = spark.createDataFrame(es, ["src", "dst"])
    got = sorted(
        (r.node, r.kind, r.score) for r in hits_scores(df, topk=50).collect()
    )
    a1 = {}
    for _, d in es:
        a1[d] = a1.get(d, 0) + 1
    h1 = {}
    for s, d in es:
        h1[s] = h1.get(s, 0) + a1[d]
    a2 = {}
    for s, d in es:
        a2[d] = a2.get(d, 0) + h1[s]
    h2 = {}
    for s, d in es:
        h2[s] = h2.get(s, 0) + a2[d]
    want = sorted(
        [(n, "hub", c) for n, c in h2.items()]
        + [(n, "authority", c) for n, c in a2.items()]
    )
    assert got == want


def test_hits_degree_domain_guard(spark, monkeypatch):
    """r12 verdict item 5 (the pagerank_weighted pattern): unnormalized
    HITS scores are bounded by degree^4, so a max degree above the
    int64 fourth root must FAIL FAST instead of wrapping silently.  The
    bound is patched down so the test doesn't build a 55k-degree star."""
    import pytest

    from mapreducemovieanalysis_cloud_spark.operators import graph

    monkeypatch.setattr(graph, "_HITS_DEG_INT64_BOUND", 3)
    star = spark.createDataFrame(
        [("hub", f"t{i}") for i in range(5)], ["src", "dst"]
    )
    with pytest.raises(ValueError, match="degree"):
        graph.hits_scores(star)
    ok = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    assert graph.hits_scores(ok).count() > 0


@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(list("abcd")), min_size=1, max_size=6
            ),
            st.sampled_from(["s0", "s1"]),
        ),
        min_size=1,
        max_size=10,
    ),
    per_source=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_preference_pairs_matches_mirror_sort_replay(
    spark, docs, per_source
):
    from mapreducemovieanalysis_cloud_spark.operators.curation import (
        preference_pairs,
    )

    rows = [
        (i, " ".join(words), src) for i, (words, src) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = sorted(
        (r.source, r.pair_idx, r.chosen_doc, r.rejected_doc, r.margin_micro)
        for r in preference_pairs(df, per_source=per_source).collect()
    )
    by_src = {}
    for i, (words, src) in enumerate(docs):
        s = len(set(words)) * 1_000_000 // len(words)
        by_src.setdefault(src, []).append((i, s))
    want = []
    for src, items in by_src.items():
        best = sorted(items, key=lambda t: (-t[1], t[0]))
        worst = sorted(items, key=lambda t: (t[1], -t[0]))
        n = len(items)
        for i in range(1, min(per_source, n // 2) + 1):
            want.append(
                (
                    src,
                    i,
                    best[i - 1][0],
                    worst[i - 1][0],
                    best[i - 1][1] - worst[i - 1][1],
                )
            )
    assert got == sorted(want)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abc")), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_skipgram_pairs_match_python_replay(spark, docs):
    from mapreducemovieanalysis_cloud_spark.operators.curation import (
        skipgram_pair_counts,
    )

    window = 2
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.t1, r.t2, r.weight_micro, r.n_pairs)
        for r in skipgram_pair_counts(df, window=window, topk=1000).collect()
    )
    agg = {}
    for words in docs:
        for d in range(1, window + 1):
            for i in range(len(words) - d):
                a, b = sorted((words[i], words[i + d]))
                w, n = agg.get((a, b), (0, 0))
                agg[(a, b)] = (w + 1_000_000 // d, n + 1)
    want = sorted((a, b, w, n) for (a, b), (w, n) in agg.items())
    assert got == want


@given(edges=_EDGES, deg_cap=st.integers(2, 6))
@settings(**_SETTINGS)
def test_adamic_adar_matches_bruteforce(spark, edges, deg_cap):
    import math

    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        adamic_adar_scores,
    )

    assume(edges)
    df = spark.createDataFrame(edges, ["u", "v"])
    got = sorted(
        (r.u, r.v, r.score_micro, r.n_common)
        for r in adamic_adar_scores(df, deg_cap=deg_cap, topk=1000).collect()
    )
    es, adj = set(edges), _adj(edges)
    acc = {}
    for apex, nbrs in adj.items():
        deg = len(nbrs)
        if not (2 <= deg <= deg_cap):
            continue
        w = math.floor(1_000_000 / math.log(deg) + 0.5)  # ROUND half-up
        for x, y in combinations(sorted(nbrs), 2):
            s, n = acc.get((x, y), (0, 0))
            acc[(x, y)] = (s + w, n + 1)
    want = sorted(
        (x, y, s, n)
        for (x, y), (s, n) in acc.items()
        if (x, y) not in es
    )
    assert got == want


@given(
    members=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 6)),
        min_size=1,
        max_size=30,
    ),
    assign=st.lists(st.integers(0, 1), min_size=5, max_size=5),
)
@settings(**_SETTINGS)
def test_cooc_store_merged_equals_rebuild_under_group_splits(
    spark, members, assign
):
    """Random (group, node) memberships split into two batches by
    GROUP (the store's complete-group contract, with batch assignment
    itself randomized): the merged store must equal the python pair
    counts over the full membership set."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        incremental_cooccurrence_append,
        incremental_cooccurrence_edges,
    )

    df = spark.createDataFrame(members, ["g", "node"])
    batch_of = {g: assign[g] for g in range(5)}
    store = tempfile.mkdtemp(prefix="cooc_prop_")
    try:
        for b in range(2):
            gs = [g for g, v in batch_of.items() if v == b]
            incremental_cooccurrence_append(
                df.where(F.col("g").isin(gs)), store, f"b{b}", "g", "node"
            )
        got = sorted(
            (r.u, r.v, r.shared)
            for r in incremental_cooccurrence_edges(
                spark, store, min_shared=1
            ).collect()
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)

    by_g = {}
    for g, n in set(members):
        by_g.setdefault(g, set()).add(n)
    acc = {}
    for nodes in by_g.values():
        for u, v in combinations(sorted(nodes), 2):
            acc[(u, v)] = acc.get((u, v), 0) + 1
    want = sorted((u, v, c) for (u, v), c in acc.items())
    assert got == want


@given(
    dedges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=20,
    ).map(lambda ps: sorted({(f"n{u}", f"n{v}") for u, v in ps if u != v}))
)
@settings(**_SETTINGS)
def test_pagerank_matches_integer_replay(spark, dedges):
    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        SCALE,
        pagerank,
    )

    assume(dedges)
    df = spark.createDataFrame(dedges, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(df, iters=2).collect()}

    nodes = sorted({n for e in dedges for n in e})
    n_total = len(nodes)
    deg = {}
    for s, _ in dedges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: SCALE // n_total for n in nodes}
    for _ in range(2):
        contrib = {}
        for s, d in dedges:
            contrib[d] = contrib.get(d, 0) + rank[s] // deg[s]
        rank = {
            n: (15 * SCALE) // (100 * n_total)
            + (85 * contrib.get(n, 0)) // 100
            for n in nodes
        }
    assert got == rank


@given(edges=_EDGES, hops=st.integers(1, 3))
@settings(**_SETTINGS)
def test_anf_reach_matches_fm_replay(spark, edges, hops):
    """Random graphs: the hop-h FM mask must be the OR of the md5 seed
    masks of EXACTLY the nodes within BFS distance h (self included) —
    b_sum asserted exactly per (node, hop); the milli estimate within
    1 (JVM Math.pow vs libm may differ in the last ulp)."""
    import hashlib

    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        anf_reach,
    )
    from mapreducemovieanalysis_cloud_spark.operators.sketches import (
        FM_BIT_CAP,
        FM_PHI,
    )

    assume(edges)
    named = [(f"n{u}", f"n{v}") for u, v in edges]
    df = spark.createDataFrame(named, ["u", "v"])
    registers = 16
    got = {
        (r.node, r.hop): (r.b_sum, r.est_reach_milli)
        for r in anf_reach(df, hops=hops, registers=registers).collect()
    }

    adj = {}
    for u, v in named:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def seed(node, r):
        h = int(
            hashlib.md5(f"anf:{r}:{node}".encode()).hexdigest()[:8], 16
        )
        if h == 0:
            bit = FM_BIT_CAP
        else:
            bit = min((h & -h).bit_length() - 1, FM_BIT_CAP)
        return 1 << bit

    def reach(node, h):
        seen, frontier = {node}, {node}
        for _ in range(h):
            frontier = {
                x for f in frontier for x in adj[f]
            } - seen
            seen |= frontier
        return seen

    for node in adj:
        for hop in range(1, hops + 1):
            b_sum = 0
            for r in range(registers):
                m = 0
                for x in reach(node, hop):
                    m |= seed(x, r)
                lowest_unset = 0
                while m & (1 << lowest_unset):
                    lowest_unset += 1
                b_sum += lowest_unset
            gb, ge = got[(node, hop)]
            assert gb == b_sum, (node, hop)
            want_est = round(
                2.0 ** (b_sum / registers) / FM_PHI * 1000
            )
            assert abs(ge - want_est) <= 1, (node, hop, ge, want_est)
