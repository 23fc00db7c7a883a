"""Round-4k tests: oracle diffs for the pipeline-staples wave plus
hand cases for feature hashing, time intelligence, and k-anonymity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

ROUND4K = (
    "feature_hash_docs",
    "time_intelligence_nation",
    "k_anonymity_customers",
)


@pytest.mark.parametrize("name", ROUND4K)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4K)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


# ---- hand cases --------------------------------------------------------------


def test_feature_hash_matches_python_md5(spark, sf_dir):
    """The Spark bucket for a sampled token equals hashlib's."""
    out = registry.queries()["feature_hash_docs"](spark, sf_dir)
    row = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id"), F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
        )
        .where(F.length("tok") > 0)
        .first()
    )
    expect_idx = int(hashlib.md5(row.tok.encode()).hexdigest()[:4], 16) % 64
    got = out.where(
        (F.col("doc_id") == row.doc_id) & (F.col("feature_idx") == expect_idx)
    ).count()
    assert got == 1


def test_feature_hash_counts_conserve_tokens(spark, sf_dir):
    """Sum of sparse counts == total token count (hashing loses nothing)."""
    out = registry.queries()["feature_hash_docs"](spark, sf_dir)
    total = out.agg(F.sum("cnt")).collect()[0][0]
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .where(F.length("tok") > 0)
        .count()
    )
    assert total == toks


def test_time_intelligence_windows_agree(spark, sf_dir):
    """YTD of the first month equals that month's revenue; the 3-month
    average over a full frame is the mean of the last three; MoM of the
    first month is NULL."""
    rows = registry.queries()["time_intelligence_nation"](
        spark, sf_dir
    ).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r.month)
        first = rs[0]
        assert first.mom_delta_cents is None
        assert first.mom_pct_milli is None
        assert first.ytd_cents == first.rev_cents
        if len(rs) >= 3:
            r3 = rs[2]
            expect = (
                (rs[0].rev_cents + rs[1].rev_cents + rs[2].rev_cents)
                * 1000
                // 3
            )
            assert r3.mov3_avg_cents_milli == expect
        # YTD resets at year boundaries
        for prev, cur in zip(rs, rs[1:]):
            if cur.month[:4] != prev.month[:4]:
                assert cur.ytd_cents == cur.rev_cents


def test_k_anonymity_all_below_k(spark, sf_dir):
    out = registry.queries()["k_anonymity_customers"](spark, sf_dir)
    assert out.where(F.col("n") >= 6).count() == 0


def test_registry_round4k_registered():
    q, o = registry.queries(), registry.oracle_sql()
    for name in ROUND4K:
        assert name in q and name in o
