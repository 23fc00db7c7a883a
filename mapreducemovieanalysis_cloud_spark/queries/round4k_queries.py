"""Round-4 eleventh wave: pipeline staples — hashing-trick sparse
features, the BI time-intelligence rollup (MoM / YTD / moving average),
and a k-anonymity audit.

Exactness discipline: feature indices are md5-derived (engine-neutral),
counts/cents are int64, the one pct-change is floor-milli integer
division, and the moving average ships as (sum, count) pairs plus a
floor-milli ratio — no float aggregation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- hashing-trick sparse features ------------------------------------------

_N_FEATURES = 64


@query(
    "feature_hash_docs",
    oracle=rf"""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split_regex(trim(text), '\s+')) AS tok
                  FROM documents WHERE length(trim(text)) > 0),
    tk AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
    h AS (SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER)
                      % {_N_FEATURES} AS BIGINT) AS feature_idx
          FROM tk)
    SELECT doc_id, feature_idx, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM h GROUP BY 1, 2
    """,
)
def feature_hash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse bag-of-words features: each token maps to one
    of 64 feature buckets via the leading 16 md5 bits (the
    vocabulary-free vectorizer of large-scale linear models — no vocab
    build pass, no OOV problem, collisions by design).  Output is the
    sparse COO triple (doc, feature, count).

    The md5 bucket is the engine-neutral contract
    (functions/hashing.py:md5_bucket — same primitive as the CMS and
    the deterministic samplers): both engines hash the token bytes, so
    the feature space is reproducible anywhere, unlike builtin
    engine-specific hash functions.

    Scale: one token explode partial-aggregating into (doc, bucket)
    counts — map-side combine collapses repeated tokens; output is
    min(tokens, 64) rows per doc."""
    from mapreducemovieanalysis_cloud_spark.functions import text as T
    from mapreducemovieanalysis_cloud_spark.functions.hashing import (
        md5_bucket,
    )

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(T.tokens("text")).alias("tok"))
        .where(F.length("tok") > 0)
    )
    return (
        toks.select(
            "doc_id",
            md5_bucket("tok", _N_FEATURES).cast("long").alias("feature_idx"),
        )
        .groupBy("doc_id", "feature_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---- BI time intelligence ----------------------------------------------------


@query(
    "time_intelligence_nation",
    oracle="""
    WITH m AS (SELECT c.c_nationkey AS nk,
                      strftime(date_trunc('month', o.o_orderdate),
                               '%Y-%m-%d') AS month,
                      SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS rev
               FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
               GROUP BY 1, 2),
    w AS (SELECT nk, month, rev,
                 LAG(rev) OVER (PARTITION BY nk ORDER BY month) AS prev,
                 SUM(rev) OVER (PARTITION BY nk, substr(month, 1, 4)
                                ORDER BY month
                                ROWS UNBOUNDED PRECEDING) AS ytd,
                 SUM(rev) OVER (PARTITION BY nk ORDER BY month
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mov_sum,
                 COUNT(*) OVER (PARTITION BY nk ORDER BY month
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mov_n
          FROM m)
    SELECT n.n_name AS nation, w.month,
           CAST(w.rev AS BIGINT) AS rev_cents,
           CAST(w.rev - w.prev AS BIGINT) AS mom_delta_cents,
           CAST(CASE WHEN w.prev IS NULL OR w.prev = 0 THEN NULL
                ELSE ((w.rev - w.prev) * 1000) // w.prev END AS BIGINT)
             AS mom_pct_milli,
           CAST(w.ytd AS BIGINT) AS ytd_cents,
           CAST(w.mov_sum * 1000 // w.mov_n AS BIGINT)
             AS mov3_avg_cents_milli
    FROM w JOIN nation n ON n.n_nationkey = w.nk
    """,
)
def time_intelligence_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI time-intelligence rollup per nation: monthly revenue with
    month-over-month delta and floor-milli percent change, year-to-date
    running total, and trailing-3-month average — the dashboard staple
    (PERIOD OVER PERIOD / YTD / moving average) in one pass.

    Scale: the fact collapses to the (nation × month) grid in one
    aggregate (customer dim broadcasts); every window after that runs on
    grid rows — the 100 TB cost is the first aggregate, full stop.
    MoM pct and the moving average are floor-milli integer divisions on
    exact cents sums."""
    m = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice", "o_orderdate")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
            .alias("month"),
        )
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("rev")
        )
    )
    w_ord = Window.partitionBy("nk").orderBy("month")
    w_ytd = (
        Window.partitionBy("nk", F.substring("month", 1, 4))
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_mov = w_ord.rowsBetween(-2, 0)
    w = m.select(
        "nk",
        "month",
        "rev",
        F.lag("rev").over(w_ord).alias("prev"),
        F.sum("rev").over(w_ytd).alias("ytd"),
        F.sum("rev").over(w_mov).alias("mov_sum"),
        F.count(F.lit(1)).over(w_mov).alias("mov_n"),
    )
    return w.join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select(
                "n_nationkey", F.col("n_name").alias("nation")
            )
        ),
        F.col("n_nationkey") == F.col("nk"),
    ).select(
        "nation",
        "month",
        F.col("rev").cast("long").alias("rev_cents"),
        (F.col("rev") - F.col("prev")).cast("long").alias("mom_delta_cents"),
        F.expr(
            "CAST(CASE WHEN prev IS NULL OR prev = 0 THEN NULL"
            " ELSE ((rev - prev) * 1000) div prev END AS BIGINT)"
        ).alias("mom_pct_milli"),
        F.col("ytd").cast("long").alias("ytd_cents"),
        F.expr("CAST(mov_sum * 1000 div mov_n AS BIGINT)").alias(
            "mov3_avg_cents_milli"
        ),
    )


# ---- k-anonymity audit -------------------------------------------------------

_K_ANON = 6


@query(
    "k_anonymity_customers",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(*) < {_K_ANON}
    """,
)
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment)
    quasi-identifier: equivalence classes with fewer than k=6 members —
    the re-identification risk report a release gate runs before
    publishing micro-data (small classes pinpoint individuals; the fix
    is suppression or coarsening, both expressible as follow-up
    DataFrame transforms).

    Scale: one partial/final aggregate on the quasi-identifier key;
    HAVING prunes to the violating classes only — output is
    risk-bounded, not data-bounded."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < _K_ANON)
    )
