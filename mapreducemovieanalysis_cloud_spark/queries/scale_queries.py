"""Scale-path operators round 2b: runtime-filtered joins, BM25 retrieval,
passage-level dedup, SCD2 interval building, integer histograms.

Each extends a SURVEY.md §2 family with an operator a 100 TB deployment
leans on: bloom prefilters cut fact-side shuffle volume, BM25 is the
retrieval read-path of a curation pipeline, duplicate-passage detection is
the sub-document dedup tier, SCD2 is how mutable entity state becomes
joinable history, and fixed-width histograms are the data-profiling
workhorse. All determinism conventions from the registry docstring apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import aggregates, cdc, dedup, joins, ranking
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

_BM25_TERMS = ["join", "vector", "stream"]


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT c.c_nationkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey < 5
    GROUP BY c.c_nationkey
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to a filtered customer dim through a broadcast
    Bloom-bucket prefilter: the fact side is semi-filtered map-side before
    its Exchange, and the exact join makes the result identical to the
    plain join the oracle runs."""
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") < 5)
        .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    )
    joined = joins.bloom_prefilter_join(orders, dim, on="o_custkey")
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


@query("bm25_rank", oracle=ranking.bm25_oracle_sql(_BM25_TERMS, topk=50))
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 documents by BM25 (rank-odds IDF, integer micro-unit
    scores) for a three-term query — the retrieval read-path."""
    return ranking.bm25_scores(
        load_table(spark, sf_dir, "documents"), _BM25_TERMS, topk=50
    )


@query(
    "duplicate_passages",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    w AS (SELECT doc_id,
                 array_to_string(list_slice(t, i, i + 7), ' ') AS passage
          FROM (SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 7)) AS i
                FROM toks WHERE len(t) >= 8)),
    g AS (SELECT md5(passage) AS fp,
                 MIN(passage) AS passage,
                 COUNT(DISTINCT doc_id) AS n_docs,
                 COUNT(*) AS n_occurrences,
                 MIN(doc_id) AS first_doc
          FROM w GROUP BY 1)
    SELECT passage, n_docs, n_occurrences, first_doc FROM g
    WHERE n_docs >= 2
    ORDER BY n_occurrences DESC, passage ASC LIMIT 100
    """,
)
def duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate 8-token passages (sub-document dedup
    tier): top-100 by occurrence count."""
    return dedup.duplicate_passages(
        load_table(spark, sf_dir, "documents"), n=8, min_docs=2, topk=100
    )


@query(
    "scd2_user_state",
    oracle="""
    WITH e AS (SELECT user_id, event_id, ts, event_type FROM events),
    b AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                           OR lag(event_type) OVER w <> event_type
                         THEN 1 ELSE 0 END AS chg
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    v AS (SELECT *, SUM(chg) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS version FROM b),
    g AS (SELECT user_id, CAST(version AS BIGINT) AS version,
                 MIN(event_type) AS state, MIN(ts) AS vf,
                 COUNT(*) AS n_events
          FROM v GROUP BY 1, 2)
    SELECT user_id, version, state,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(lead(vf) OVER (
               PARTITION BY user_id ORDER BY version),
               '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
           n_events
    FROM g
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history of each user's event_type: one row per
    consecutive-state run with half-open validity intervals."""
    return cdc.scd2_intervals(
        load_table(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        state_col="event_type",
        tiebreak_col="event_id",
    )


@query(
    "histogram_totalprice",
    oracle="""
    WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders)
    SELECT cents // 2500000 AS bucket,
           (cents // 2500000) * 2500000 AS bucket_lo_cents,
           COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM c GROUP BY 1, 2
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$25k-wide histogram of order totals in exact integer cents — the
    single-pass profiling histogram."""
    orders = load_table(spark, sf_dir, "orders")
    return aggregates.int_histogram(
        orders,
        F.round(F.col("o_totalprice") * 100).cast("long"),
        bucket_width_cents=2_500_000,
    )
