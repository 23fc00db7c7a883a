"""Round-4m tests: the stored inverted-index retrieval family — oracle
diffs for both probe modes, index-vs-scan equivalence, and the static
bucket-pruning pin."""

from __future__ import annotations


import pytest

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import invindex, ranking
from mapreducemovieanalysis_cloud_spark.queries.round4m_queries import (
    _IDX_TERMS,
    ensure_inverted_index,
)
from tests.oracle import assert_matches_oracle

ROUND4M = (
    "search_bm25_stored_index",
    "search_conjunctive_stored_index",
)


@pytest.mark.parametrize("name", ROUND4M)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4M)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


def test_index_probe_equals_scan_time_bm25(spark, sf_dir):
    """The stored-index probe and the from-scratch scorer must agree row
    for row (same score tree over the same numbers — layout only)."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    path = ensure_inverted_index(spark, sf_dir)
    via_index = invindex.bm25_query_index(
        spark, path, _IDX_TERMS, topk=50
    ).collect()
    direct = ranking.bm25_scores(
        load_table(spark, sf_dir, "documents"), _IDX_TERMS, topk=50
    ).collect()
    assert via_index == direct


def test_probe_prunes_to_query_buckets(spark, sf_dir):
    """Static partition pruning pin: the pruned postings scan carries a
    PartitionFilters entry restricting the read to the ≤ |Q| bucket
    directories the query terms hash to — never the other ~60 (the
    stored-IVF pruning test's analog; same plan-text pin as
    test_partitioned_write_prunes_on_read)."""
    from mapreducemovieanalysis_cloud_spark import plans

    path = ensure_inverted_index(spark, sf_dir)
    want = set(invindex.query_term_buckets(spark, _IDX_TERMS))
    assert 1 <= len(want) <= len(_IDX_TERMS)
    text = plans.explain_formatted(
        invindex.read_postings(spark, path, _IDX_TERMS)
    )
    pf = [ln for ln in text.splitlines() if "PartitionFilters" in ln]
    assert pf, text
    # the IN-list in the partition filter is exactly the query buckets
    assert "bucket" in pf[0] and " IN " in pf[0], pf[0]
    import re

    in_list = re.search(r" IN \(([0-9,]+)\)", pf[0])
    assert in_list, pf[0]
    assert {int(x) for x in in_list.group(1).split(",")} == want, pf[0]


def test_conjunctive_mode_is_a_subset_requiring_all_terms(spark, sf_dir):
    path = ensure_inverted_index(spark, sf_dir)
    ranked = invindex.bm25_query_index(spark, path, _IDX_TERMS, topk=1000)
    allhit = invindex.bm25_query_index(
        spark, path, _IDX_TERMS, topk=1000, require_all=True
    ).collect()
    assert allhit, "sf testdata has docs containing all three terms"
    assert all(r.n_terms_hit == len(_IDX_TERMS) for r in allhit)
    ranked_ids = {r.doc_id for r in ranked.collect()}
    assert {r.doc_id for r in allhit} <= ranked_ids


def test_index_df_matches_brute_count(spark, sf_dir):
    """df from the pruned postings equals the number of docs whose token
    set contains the term (the definition the oracle uses)."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.functions.text import tokens
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    path = ensure_inverted_index(spark, sf_dir)
    post = invindex.read_postings(spark, path, _IDX_TERMS)
    got = {
        (r.term, r.df)
        for r in post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    want = set()
    for t in _IDX_TERMS:
        n = (
            docs.select(tokens("text").alias("tt"))
            .where(F.array_contains("tt", t))
            .count()
        )
        if n:
            want.add((t, n))
    assert got == want
