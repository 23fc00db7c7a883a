"""Oracle-diffed tests for the north-star pipeline queries (text analysis,
dedup, similarity search, multimodal plumbing)."""

from __future__ import annotations

import pytest

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

PIPELINE = (
    "dedup_exact",
    "text_stats",
    "lang_id",
    "quality_score",
    "fingerprint_docs",
    "fingerprint_winnow",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "kmeans_embeddings",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_features",
)


@pytest.mark.parametrize("name", PIPELINE)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", PIPELINE)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_minhash_lsh_recall_vs_exact(spark, oracle_sf_dir):
    """LSH near-dup recall against the exact-Jaccard ground truth: every
    exact pair at >= 0.7 must be found by the banded index (16 hashes /
    4 bands → band-match prob at j=0.7 is 1-(1-0.7^4)^4 ≈ 0.67 per band
    set; at 0.9 it is ~0.998 — we check the high-sim tier only)."""
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_dedup,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, threshold=0.9).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup(docs, threshold=0.9).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_ann_ivf_recall_vs_bruteforce(spark, oracle_sf_dir):
    """IVF (8 cells, nprobe=2) must recover a reasonable fraction of the
    exact top-10 per query — and every returned neighbor's cosine must
    equal the exact cosine (the approximation is WHICH candidates are
    scored, never the score itself)."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators.similarity import (
        ann_ivf_topk,
        brute_force_topk,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ann_ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=2).collect()
    exact_pairs = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id): r.cosine for r in approx}
    hits = set(exact_pairs) & set(approx_pairs)
    recall = len(hits) / len(exact_pairs)
    assert recall >= 0.3, f"IVF recall too low: {recall}"
    for pair in hits:
        assert exact_pairs[pair] == approx_pairs[pair], pair
