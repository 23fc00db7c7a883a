"""Oracle-diffed tests for the round-4 queries (z-order read path, source
quality gate, context-window chunking, deterministic training shuffle) plus
invariants the oracle alone can't pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

ROUND4 = (
    "zorder_pruned_scan",
    "source_quality_filter",
    "chunk_documents",
    "shuffle_for_training",
)


@pytest.mark.parametrize("name", ROUND4)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", ROUND4)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_chunking_covers_every_token_with_fixed_overlap(spark, oracle_sf_dir):
    """Chunk windows tile each document: first chunk starts at token 1,
    consecutive starts differ by exactly the stride, the last chunk ends at
    n_tok — so every token is inside >=1 chunk — and total chunk tokens
    exceed n_tok by exactly (n_chunks-1)*overlap."""
    from mapreducemovieanalysis_cloud_spark.queries.round4_queries import (
        _CHUNK_STRIDE,
        _CHUNK_WINDOW,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    chunks = registry.queries()["chunk_documents"](spark, oracle_sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("tok_in_chunks"),
            F.max(F.col("chunk_idx") * _CHUNK_STRIDE + F.col("n_tokens")).alias(
                "last_end"
            ),
        )
    )
    docs = (
        load_table(spark, oracle_sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(r"size(split(trim(text), '\\s+'))").alias("n_tok"),
        )
        .where(F.col("n_tok") > 0)
    )
    j = per_doc.join(docs, "doc_id")
    overlap = _CHUNK_WINDOW - _CHUNK_STRIDE
    bad = j.where(
        (F.col("last_end") != F.col("n_tok"))
        | (
            F.col("tok_in_chunks")
            != F.col("n_tok")
            + (F.col("n_chunks") - 1)
            * F.least(F.lit(overlap), F.col("n_tok"))
        )
    )
    assert j.count() > 0
    assert bad.count() == 0


def test_shuffle_rank_is_a_permutation_and_shards_balance(
    spark, oracle_sf_dir
):
    """shuffle_rank is exactly 1..n (the two-phase kernel's offsets merge
    without gaps or duplicates) and round-robin sharding keeps shard sizes
    within 1 of each other."""
    from mapreducemovieanalysis_cloud_spark.queries.round4_queries import (
        _SHUFFLE_SHARDS,
    )

    out = registry.queries()["shuffle_for_training"](spark, oracle_sf_dir)
    n = out.count()
    stats = out.agg(
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
        F.countDistinct("shuffle_rank").alias("nd"),
    ).collect()[0]
    assert (stats.lo, stats.hi, stats.nd) == (1, n, n)
    sizes = [
        r.n
        for r in out.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(sizes) == _SHUFFLE_SHARDS
    assert max(sizes) - min(sizes) <= 1


def test_source_quality_filter_keeps_at_least_one_source(
    spark, oracle_sf_dir
):
    """The keep gate compares each source's integer milli-mean against the
    across-source average — at least the best source always clears it, and
    the flag equals the plain recomputation."""
    out = registry.queries()["source_quality_filter"](
        spark, oracle_sf_dir
    ).collect()
    n_sources = len(out)
    total = sum(r.mean_logit_milli for r in out)
    for r in out:
        assert r.keep_source == int(
            n_sources * r.mean_logit_milli >= total
        )
    assert any(r.keep_source for r in out)
    assert not all(r.keep_source for r in out) or n_sources == 1
