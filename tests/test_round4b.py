"""Round-4b tests: oracle diffs for the four new queries plus the
invariants SQL can't state — the BPE merge LOOP against a pure-Python
reference, the distributed PCA against a serial numpy build of the same
quantized statistics, and symmetric-delete blocking completeness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import bpe, linkage, pca
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from tests.oracle import assert_matches_oracle

ROUND4B = (
    "bpe_pair_counts",
    "pca_gram",
    "fuzzy_name_pairs",
    "copurchase_brand_pairs",
)


@pytest.mark.parametrize("name", ROUND4B)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", ROUND4B)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


# ---- BPE ---------------------------------------------------------------------


def _python_bpe(word_freqs: dict[str, int], n_merges: int, min_count: int):
    """Serial reference trainer with the engine's exact conventions:
    argmax by (count DESC, a ASC, b ASC), leftmost-greedy merge."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            f = word_freqs[w]
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        eligible = {p: c for p, c in counts.items() if c >= min_count}
        if not eligible:
            break
        (a, b), cnt = min(
            eligible.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """The distributed trainer's merge SEQUENCE (pairs and weighted
    counts, in order) is identical to the serial reference on the same
    corpus — the loop semantics no single SQL oracle can express."""
    words = bpe.word_freq(load_table(spark, sf_dir, "documents"))
    word_freqs = {r["word"]: r["freq"] for r in words.collect()}
    expected = _python_bpe(word_freqs, n_merges=12, min_count=2)
    actual = bpe.bpe_train(words, n_merges=12, min_count=2)
    assert actual == expected


def test_apply_merge_is_leftmost_greedy(spark):
    """Overlapping occurrences resolve leftmost-first: 'aaa' under (a,a)
    is [aa, a], never [a, aa]; merged symbols participate in later pairs
    only on later iterations."""
    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (1, ["a", "b", "a", "a", "b"])],
        "freq LONG, sym ARRAY<STRING>",
    )
    out = sorted(
        r["sym"] for r in bpe.apply_merge(df, "a", "a").collect()
    )
    assert out == [["a", "b", "aa", "b"], ["aa", "a"]]


def test_bpe_encode_word_applies_merge_order():
    merges = [("a", "b", 9), ("ab", "c", 5)]
    assert bpe.bpe_encode_word(list("abcabd"), merges) == [
        "abc",
        "ab",
        "d",
    ]


# ---- PCA ---------------------------------------------------------------------


def test_pca_fit_matches_serial_build(spark, sf_dir):
    """pca_fit's covariance path (distributed int64 Gram + column sums)
    feeds eigh the BIT-IDENTICAL matrix a serial numpy build of the same
    quantized statistics produces, so components and mean agree to fp
    round-off."""
    df = load_table(spark, sf_dir, "embeddings")
    comp, mu = pca.pca_fit(df, k=3, scale=1_000_000)

    x = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    q = np.round(x * 1_000_000).astype(np.int64)
    n, d = q.shape
    g = (q.T @ q) / 1e12
    s = q.sum(axis=0) / 1e6
    mu_ref = s / n
    cov = (g - n * np.outer(mu_ref, mu_ref)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    comp_ref = vecs[:, order]
    for c in range(comp_ref.shape[1]):
        pivot = np.argmax(np.abs(comp_ref[:, c]))
        if comp_ref[pivot, c] < 0:
            comp_ref[:, c] = -comp_ref[:, c]

    np.testing.assert_allclose(mu, mu_ref, rtol=0, atol=1e-12)
    np.testing.assert_allclose(comp, comp_ref, rtol=0, atol=1e-9)


def test_pca_project_is_centered_matmul(spark, sf_dir):
    """Projection equals (x - mean) @ components row-for-row, and the
    projected columns are (near-)uncorrelated — PCA's defining property."""
    df = load_table(spark, sf_dir, "embeddings")
    comp, mu = pca.pca_fit(df, k=2, scale=1_000_000)
    proj = {
        r["vec_id"]: np.array(r["proj"])
        for r in pca.pca_project(df, comp, mu).collect()
    }
    rows = df.orderBy("vec_id").collect()
    mat = np.array([proj[r["vec_id"]] for r in rows])
    expected = (
        np.array([r["embedding"] for r in rows], dtype=np.float64) - mu
    ) @ comp
    np.testing.assert_allclose(mat, expected, rtol=0, atol=1e-9)
    offdiag = np.corrcoef(mat.T)[0, 1]
    assert abs(offdiag) < 1e-6


# ---- symmetric-delete fuzzy join --------------------------------------------


def test_fuzzy_pairs_blocking_is_complete(spark):
    """Every ed<=1 relationship class is found (substitution, deletion/
    insertion), ed=2 pairs are rejected by the verify stage, and exact
    duplicates are not self-paired."""
    names = ["cat", "cut", "cart", "ca", "dog", "dig", "dogs", "doggy"]
    df = spark.createDataFrame([(n,) for n in names], "name STRING")
    got = {
        (r["name_a"], r["name_b"])
        for r in linkage.fuzzy_pairs(df, "name").collect()
    }
    expected = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            lo, hi = sorted((a, b))
            la, lb = len(a), len(b)
            dp = list(range(lb + 1))
            for x in range(1, la + 1):
                prev, dp[0] = dp[0], x
                for y in range(1, lb + 1):
                    cur = min(
                        dp[y] + 1,
                        dp[y - 1] + 1,
                        prev + (a[x - 1] != b[y - 1]),
                    )
                    prev, dp[y] = dp[y], cur
            if dp[lb] <= 1:
                expected.add((lo, hi))
    assert got == expected
    assert ("cat", "cut") in got  # substitution
    assert ("ca", "cat") in got  # insertion
    assert ("dog", "dogs") in got  # append
    assert ("cart", "cat") in got  # deletion
    assert ("doggy", "dogs") not in got  # ed=2 rejected by verify


def test_fuzzy_pairs_requires_depth1(spark):
    df = spark.createDataFrame([("x",)], "name STRING")
    with pytest.raises(ValueError):
        linkage.fuzzy_pairs(df, "name", max_dist=2)


# ---- market basket -----------------------------------------------------------


def test_copurchase_pairs_ordered_and_bounded(spark, sf_dir):
    """Pair keys are strictly ordered (no mirrored duplicates), support
    is positive, and no pair's support can exceed the number of orders."""
    out = registry.queries()["copurchase_brand_pairs"](spark, sf_dir)
    rows = out.collect()
    n_orders = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert rows
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert 0 < r["n_orders"] <= n_orders
    supports = [r["n_orders"] for r in rows]
    assert supports == sorted(supports, reverse=True)


# ---- plan pins ---------------------------------------------------------------


def test_new_topk_queries_plan_as_take_ordered(spark, sf_dir):
    """Both deterministic top-k queries must use per-partition heaps
    (TakeOrderedAndProject), never a global sort."""
    from mapreducemovieanalysis_cloud_spark import plans

    for name in ("bpe_pair_counts", "copurchase_brand_pairs"):
        df = registry.queries()[name](spark, sf_dir)
        assert plans.uses_take_ordered(df), name


def test_pca_gram_single_shuffle(spark, sf_dir):
    """The Gram corpus pass shuffles once — the tiny (i, j) cell
    aggregation after the per-batch matmul; the corpus itself never
    moves."""
    from mapreducemovieanalysis_cloud_spark import plans

    df = registry.queries()["pca_gram"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_fuzzy_pairs_is_an_equi_join(spark, sf_dir):
    """Symmetric-delete blocking must plan as an equi-join on the variant
    key — no nested-loop/cartesian fallback anywhere."""
    from mapreducemovieanalysis_cloud_spark import plans

    df = registry.queries()["fuzzy_name_pairs"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_copurchase_giant_basket_capped_workflow(spark):
    """The documented guard for unbounded baskets: cap_per_group bounds a
    pathological order's items BEFORE the pair self-join, so the pair
    space for a k-item basket is C(cap,2), not C(k,2) — and normal
    baskets pass through untouched."""
    from mapreducemovieanalysis_cloud_spark.operators import curation

    giant = [(1, f"b{i:03d}") for i in range(100)]
    normal = [(2, "b001"), (2, "b002"), (3, "b001")]
    basket = spark.createDataFrame(
        giant + normal, "okey LONG, brand STRING"
    )
    capped = curation.cap_per_group(
        basket, group_col="okey", id_col="brand", cap=8
    ).select("okey", "brand")
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(F.col("a.brand"), F.col("b.brand"))
        .count()
    )
    per_order = capped.groupBy("okey").count().collect()
    sizes = {r["okey"]: r["count"] for r in per_order}
    assert sizes[1] == 8  # giant basket truncated to the cap
    assert sizes[2] == 2 and sizes[3] == 1  # small baskets intact
    # pair space bounded by C(8,2) for the giant order + 1 normal pair
    assert pairs.agg(F.sum("count")).collect()[0][0] == 28 + 1


def test_entity_resolution_composition(spark):
    """End-to-end entity resolution: symmetric-delete fuzzy pairs ->
    star-contraction components -> min-name survivor. Chained typo
    clusters merge fully (transitively: anna~anne~annd at pairwise
    ed 1, anna->annd ed 2), singletons survive as themselves."""
    from mapreducemovieanalysis_cloud_spark.operators import (
        clustering,
        linkage,
    )

    names = [
        "anna", "anne", "annd",      # chain: one cluster
        "bob", "rob",                # substitution pair
        "carol",                     # singleton
        "dave", "dav", "davey",      # dav~dave (del), dave~davey? ed=1
    ]
    df = spark.createDataFrame([(n,) for n in names], "name STRING")
    pairs = linkage.fuzzy_pairs(df, "name")
    nodes = df.select(F.col("name").alias("doc_id"))
    edges = pairs.select(
        F.col("name_a").alias("src"), F.col("name_b").alias("dst")
    )
    comp = {
        r["doc_id"]: r["component"]
        for r in clustering.star_components(nodes, edges).collect()
    }
    clusters: dict[str, set] = {}
    for n, c in comp.items():
        clusters.setdefault(c, set()).add(n)
    got = set(map(frozenset, clusters.values()))
    expected = {
        frozenset({"anna", "anne", "annd"}),
        frozenset({"bob", "rob"}),
        frozenset({"carol"}),
        frozenset({"dave", "dav", "davey"}),
    }
    assert got == expected
    # survivorship: canonical = min name per cluster
    for members in got:
        canon = min(members)
        for m in members:
            assert comp[m] == canon


def test_fuzzy_incremental_index_matches_batch_rebuild(spark, tmp_path):
    """Probing a stored linkage index finds exactly the cross pairs a
    from-scratch run over (reference + batch) finds — minus the
    reference-internal pairs the incremental path correctly never
    recomputes — plus identity matches."""
    from mapreducemovieanalysis_cloud_spark.operators import linkage

    ref_names = ["anna", "bob", "carol", "dave"]
    batch_names = ["anne", "rob", "eve", "dave"]
    ref = spark.createDataFrame([(n,) for n in ref_names], "name STRING")
    batch = spark.createDataFrame(
        [(n,) for n in batch_names], "name STRING"
    )
    path = str(tmp_path / "linkage_idx")
    linkage.write_linkage_index(ref, "name", path)
    got = {
        (r["batch_name"], r["index_name"])
        for r in linkage.fuzzy_match_against_index(
            batch, "name", path
        ).collect()
    }
    assert got == {
        ("anne", "anna"),
        ("rob", "bob"),
        ("dave", "dave"),  # identity match reported
    }
