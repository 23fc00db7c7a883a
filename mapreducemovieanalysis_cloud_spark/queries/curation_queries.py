"""Corpus-curation queries: repetition gates, corpus n-gram/DF tables,
per-source balancing, PII scrubbing, batch sessionization — each with an
exact DuckDB oracle.

These extend the north-star pipeline (pipeline_queries.py) with the
remaining filters an LLM training-data pipeline applies between raw scans
and dedup. All determinism conventions from the registry docstring apply:
integer outputs wherever possible, cents for money, formatted strings for
timestamps, unique tie-breaks on every limit/window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import curation
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# Shared DuckDB fragment: whitespace tokens + positional 2-grams (mirrors
# functions.text.tokens / shingles_from_tokens at n=2, duplicates kept).
_BIGRAM_CTES = r"""
    toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             FROM documents),
    idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
            FROM toks WHERE len(t) >= 2),
    g AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS gram FROM idx)
"""


@query(
    "repetition_stats",
    oracle=(
        f"WITH {_BIGRAM_CTES}, "
        """
        c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_grams,
               COUNT(*) AS n_distinct_grams,
               CAST(MAX(cnt) AS BIGINT) AS top_gram_count,
               CAST(SUM(cnt) - COUNT(*) AS DOUBLE)
                 / CAST(SUM(cnt) AS DOUBLE) AS dup_gram_ratio
        FROM c GROUP BY doc_id
        """
    ),
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate inputs: per-doc duplicate-bigram
    fraction and most-frequent-bigram count."""
    return curation.repetition_stats(
        load_table(spark, sf_dir, "documents"), n=2
    )


@query(
    "ngram_corpus_topk",
    oracle=(
        f"WITH {_BIGRAM_CTES}"
        """
        SELECT gram, COUNT(*) AS total_count,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM g GROUP BY gram
        ORDER BY total_count DESC, gram ASC LIMIT 20
        """
    ),
)
def ngram_corpus_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams (frequency table for boilerplate
    detection); gram string is the unique tie-break."""
    return curation.ngram_corpus_topk(
        load_table(spark, sf_dir, "documents"), n=2, k=20
    )


@query(
    "token_doc_freq",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    tok AS (SELECT doc_id, unnest(t) AS token FROM toks)
    SELECT token, COUNT(*) AS corpus_freq,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM tok GROUP BY token
    ORDER BY doc_freq DESC, token ASC LIMIT 30
    """,
)
def token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token document-frequency table (IDF building block), top-30 by DF.
    Integer outputs only — the ln() of IDF is consumer-side so the result
    stays engine-exact."""
    return curation.token_doc_frequency(
        load_table(spark, sf_dir, "documents"), k=30
    )


@query(
    "per_source_cap",
    oracle="""
    SELECT doc_id, source, rn FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-balancing cap: keep at most 20 docs per source, selected by
    deterministic md5 order (unbiased but bit-reproducible)."""
    return curation.cap_per_group(
        load_table(spark, sf_dir, "documents"),
        group_col="source",
        id_col="doc_id",
        cap=20,
    )


# PII scrub runs over text augmented IN-QUERY with synthetic contact info
# derived from doc_id — the synthetic corpus has no real PII, and deriving
# it identically on both sides makes the oracle signal non-trivial
# (n_emails/n_phones >= 1 per doc, redaction fingerprint must agree).
_PII_AUG = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "pii_scrub",
    oracle=rf"""
    WITH aug AS (SELECT doc_id, {_PII_AUG} AS text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text,
                '\+1-555-[0-9]{{4}}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '[a-z0-9]+@[a-z]+\.[a-z]+',
                                '<EMAIL>', 'g'),
                 '\+1-555-[0-9]{{4}}', '<PHONE>', 'g')) AS redacted_fp
    FROM aug
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over in-query-derived contact strings: per-doc
    match counts and the md5 of the redacted text."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    return curation.pii_scrub(aug)


@query(
    "sessionize_events",
    oracle="""
    WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us
               FROM events),
    b AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
                           OR us - lag(us) OVER w > 1800000000
                         THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM b)
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_s,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM s GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events table (30-min inactivity
    boundary): one session row per (user, session) with start, size,
    duration, and cents-exact value sum."""
    return curation.sessionize(
        load_table(spark, sf_dir, "events"), gap_seconds=1800
    )


@query(
    "sample_stratified_lang",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS INTEGER) % 100
          < CASE lang WHEN 'en' THEN 60 WHEN 'es' THEN 25 ELSE 10 END
    """,
)
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing sample: keep 60% of en, 25% of es, 10%
    otherwise, by deterministic md5 bucket of doc_id — membership is a
    pure key function, so the mix is reproducible across engines,
    retries, and later appends."""
    from mapreducemovieanalysis_cloud_spark.operators.curation import (
        sample_stratified,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_stratified(
        docs, "lang", "doc_id", {"en": 60, "es": 25}, default_pct=10
    )
