"""Oracle-diffed tests for the curation queries (repetition gates, corpus
frequency tables, balancing, PII scrub, sessionization)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

CURATION = (
    "repetition_stats",
    "ngram_corpus_topk",
    "token_doc_freq",
    "per_source_cap",
    "pii_scrub",
    "sessionize_events",
    "sample_stratified_lang",
)


@pytest.mark.parametrize("name", CURATION)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", CURATION)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_cap_per_group_caps_and_keeps_determinism(spark, oracle_sf_dir):
    """Every source ends at <= cap rows, and the kept set is identical when
    the input partitioning changes (the md5 order is data-derived, not
    placement-derived)."""
    from mapreducemovieanalysis_cloud_spark.operators.curation import (
        cap_per_group,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    kept = cap_per_group(docs, "source", "doc_id", cap=20)
    sizes = kept.groupBy("source").count().collect()
    assert sizes and all(r["count"] <= 20 for r in sizes)
    kept_ids = {r.doc_id for r in kept.collect()}
    shuffled = cap_per_group(docs.repartition(13), "source", "doc_id", cap=20)
    assert {r.doc_id for r in shuffled.collect()} == kept_ids


def test_sessionize_respects_gap(spark, oracle_sf_dir):
    """No two consecutive events inside one session are further apart than
    the gap; sessions per user are consecutively numbered from 1."""
    from mapreducemovieanalysis_cloud_spark.operators.curation import (
        sessionize,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    events = load_table(spark, oracle_sf_dir, "events")
    gap = 1800
    sessions = sessionize(events, gap_seconds=gap)
    # per-user session indices are 1..n_sessions with no holes
    per_user = sessions.groupBy("user_id").agg(
        F.min("session_idx").alias("lo"),
        F.max("session_idx").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = per_user.where(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n"))
    ).count()
    assert bad == 0
    # event counts conserve
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()


def test_pii_scrub_redacts_everything(spark, oracle_sf_dir):
    """After redaction no document fingerprint equals the pre-redaction
    fingerprint and every doc reports at least one email and one phone."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    q = registry.queries()["pii_scrub"]
    out = q(spark, oracle_sf_dir)
    assert out.where((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count() == 0
    # redaction actually changed the text: the redacted fingerprint never
    # equals the fingerprint of the augmented (pre-redaction) text. This
    # is the one check independent of the oracle, which applies the same
    # regexes and so could be mutually wrong with the engine.
    docs = load_table(spark, oracle_sf_dir, "documents")
    aug_fp = docs.select(
        "doc_id",
        F.md5(
            F.encode(
                F.concat(
                    F.col("text"),
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
                "UTF-8",
            )
        ).alias("aug_fp"),
    )
    unchanged = (
        out.join(aug_fp, "doc_id")
        .where(F.col("redacted_fp") == F.col("aug_fp"))
        .count()
    )
    assert unchanged == 0
