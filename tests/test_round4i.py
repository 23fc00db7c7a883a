"""Round-4i tests: oracle diffs for the corpus-linguistics wave plus
hand-built fixtures pinning each kernel's semantics."""

from __future__ import annotations

import pytest

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import curation, dedup
from tests.oracle import assert_matches_oracle

ROUND4I = (
    "keyness_llr_by_lang",
    "containment_pairs",
    "boilerplate_by_source",
)


@pytest.mark.parametrize("name", ROUND4I)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4I)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


# ---- kernel fixtures ---------------------------------------------------------


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source)."""
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_keyness_flags_the_group_exclusive_token(spark):
    """A token used only inside one group tops that group's keyness."""
    en = [(i, "alpha beta " + "zonk " * 5, "en", "s") for i in range(5)]
    de = [(100 + i, "alpha beta gamma delta", "de", "s") for i in range(5)]
    out = curation.llr_keyness(
        _docs(spark, en + de), min_support=5
    ).collect()
    top_en = [r for r in out if r.lang == "en"]
    assert top_en and top_en[0].token == "zonk"
    assert top_en[0].cnt_out == 0
    # every reported token is over-represented: cnt_in share > global share
    for r in out:
        assert r.llr_micro >= 0


def test_containment_is_directional(spark):
    """A 4-shingle doc fully inside a 40-shingle doc: (small in big)
    passes at t=1/2; (big in small) fails."""
    small_words = "one two three four five six"  # 4 3-gram shingles
    big = small_words + " " + " ".join(f"w{i}" for i in range(36))
    out = dedup.containment_pairs(
        _docs(spark, [(1, small_words, "en", "s"), (2, big, "en", "s")])
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs and (2, 1) not in pairs
    assert pairs[(1, 2)].overlap == 4
    assert pairs[(1, 2)].containment_permille == 1000


def test_containment_density_guard(spark, sf_dir):
    """The max_df guard (r04 verdict item 4): candidate volume is
    monotonically bounded by the cap; a cap at-or-above the corpus max
    df changes nothing (exact); on the fixture the guard keeps the true
    pairs (they share RARE shingles by construction)."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    exact = dedup.containment_candidate_stats(docs).collect()[0]
    capped = dedup.containment_candidate_stats(docs, max_df=8).collect()[0]
    uncapped = dedup.containment_candidate_stats(
        docs, max_df=10**9
    ).collect()[0]
    assert exact.n_docs == capped.n_docs == n_docs
    assert capped.n_candidates <= exact.n_candidates
    assert uncapped.n_candidates == exact.n_candidates
    # guard-on detector output on this fixture: same pairs (true dups
    # share rare shingles; only dense-candidate fan-out is cut)
    on = sorted(
        map(tuple, dedup.containment_pairs(docs, max_df=8).collect())
    )
    off = sorted(map(tuple, dedup.containment_pairs(docs).collect()))
    assert on == off


def test_containment_prefix_filter_is_lossless(spark, sf_dir):
    """Engine output equals the brute-force postings join on real data."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.doc_a, r.doc_b): (r.overlap, r.size_a)
        for r in dedup.containment_pairs(docs).collect()
    }
    sh = dedup.shingle_sets(docs).alias("x")
    import pyspark.sql.functions as F

    brute = (
        sh.join(
            dedup.shingle_sets(docs).alias("y"),
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    szs = {
        r.doc_id: r.s
        for r in dedup.shingle_sets(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("s"))
        .collect()
    }
    want = {
        (r.a, r.b): (r.c, szs[r.a])
        for r in brute.collect()
        if 2 * r.c >= szs[r.a]
    }
    assert got == want


def test_boilerplate_finds_the_template(spark):
    """A shared header in 3 of 4 docs qualifies; unique bodies don't."""
    header = "terms of service apply here"
    rows = [
        (1, header + " body alpha beta gamma", "en", "s"),
        (2, header + " body delta epsilon zeta", "en", "s"),
        (3, header + " body eta theta iota", "en", "s"),
        (4, "completely different text entirely now", "en", "s"),
    ]
    out = curation.boilerplate_shingles(_docs(spark, rows)).collect()
    shingles = {r.shingle for r in out}
    assert "terms of service" in shingles
    assert all(r.df == 3 and r.docs_in_source == 4 for r in out)
    assert all(r.df_permille == 750 for r in out)
    # nothing from the unique bodies
    assert not any("alpha" in s or "different" in s for s in shingles)


def test_registry_round4i_registered():
    q, o = registry.queries(), registry.oracle_sql()
    for name in ROUND4I:
        assert name in q and name in o
