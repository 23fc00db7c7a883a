"""Round-4 third wave: per-key EWMA smoothing, weighted reservoir
sampling, the Deequ-style data-quality gate, and distributed ROC-AUC —
monitoring/eval staples every production pipeline runs beside its
transformations.

Exactness discipline: the EWMA fold performs the identical IEEE-754
double operations in the identical total order on both engines and only
the FINAL state is rounded; the A-Res priority is rounded to micro units
BEFORE the top-k comparator so a last-ulp libm ln() difference cannot
reorder the boundary row; the quality gate and AUC never divide floats at
all (integer micro-ratios, doubled ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import (
    curation,
    dataquality,
    evaluation,
    timeseries,
)
from mapreducemovieanalysis_cloud_spark.queries.round3_queries import (
    _SQL_LOGIT,
    SPARK_LOGIT,
)
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- per-key EWMA ------------------------------------------------------------

_EWMA_ALPHA = 0.2


@query(
    "ewma_user_value",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(list_reduce(
                 list(value ORDER BY ts, event_id),
                 (s, x) -> s * {1.0 - _EWMA_ALPHA} + x * {_EWMA_ALPHA})
               * 1000000) AS BIGINT) AS ewma_micro
    FROM events GROUP BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's value series
    (alpha = {a}) — the smoothing pass behind monitoring baselines and
    decayed engagement features (operators/timeseries.py:ewma_per_key).

    Cross-engine determinism is the interesting part: both engines fold
    s' = s*{one_minus_a} + x*{a} over the (ts, event_id)-ordered series in
    IEEE-754 double with the same association, so the UNROUNDED states are
    bit-identical and only the final value is quantized.  Scale: one
    aggregate — map-side partial collect, array_sort, fold in the same
    expression; no window, no second shuffle; O(1) state per key."""
    return timeseries.ewma_per_key(
        load_table(spark, sf_dir, "events"), alpha=_EWMA_ALPHA
    )


ewma_user_value.__doc__ = ewma_user_value.__doc__.format(
    a=_EWMA_ALPHA, one_minus_a=1.0 - _EWMA_ALPHA
)


# ---- weighted reservoir sampling --------------------------------------------

_ARES_K = 50


@query(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS weight,
           CAST(ROUND(ln((CAST(('0x' || substr(md5('ares:' ||
                  CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
                  / 4294967297.0)
                / n_chars * 1000000) AS BIGINT) AS priority_micro
    FROM documents
    ORDER BY priority_micro DESC, doc_id LIMIT {_ARES_K}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} weighted document draw (Efraimidis-Spirakis A-Res,
    length-weighted) — deterministic weighted sampling without
    replacement (operators/curation.py:weighted_sample).

    The md5-seeded uniform makes membership a pure function of doc_id —
    stable across engines, partitionings, retries, appends; the log-space
    priority is rounded to micro units BEFORE comparison so a last-ulp
    ln() difference cannot flip the boundary row.  Scale: map-side draw +
    TakeOrderedAndProject (per-partition heaps of k)."""
    return curation.weighted_sample(
        load_table(spark, sf_dir, "documents"),
        k=_ARES_K,
        weight_col="n_chars",
    )


weighted_sample_docs.__doc__ = weighted_sample_docs.__doc__.format(
    k=_ARES_K
)


# ---- data-quality gate -------------------------------------------------------


@query(
    "dq_orders_gate",
    oracle="""
    WITH m AS (SELECT COUNT(*) AS n,
                      COUNT(o_custkey) AS comp_custkey,
                      COUNT(o_orderdate) AS comp_orderdate,
                      COUNT(DISTINCT o_orderkey) AS uniq_orderkey,
                      COALESCE(SUM(CAST(o_totalprice > 0 AS BIGINT)), 0)
                        AS range_price,
                      COALESCE(SUM(CAST(o_orderstatus IN ('F', 'O', 'P')
                        AS BIGINT)), 0) AS dom_status
               FROM orders),
    r AS (SELECT COUNT(*) AS n,
                 COALESCE(SUM(CAST(c.c_custkey IS NOT NULL AS BIGINT)),
                          0) AS matched
          FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey),
    -- fail-closed on an empty batch, in lockstep with
    -- operators/dataquality.py: metric 0 / passed 0 when n = 0
    raw AS (
      SELECT 'completeness_o_custkey' AS "constraint", comp_custkey AS k,
             n FROM m
      UNION ALL
      SELECT 'completeness_o_orderdate', comp_orderdate, n FROM m
      UNION ALL
      SELECT 'uniqueness_o_orderkey', uniq_orderkey, n FROM m
      UNION ALL
      SELECT 'range_totalprice_positive', range_price, n FROM m
      UNION ALL
      SELECT 'domain_o_orderstatus', dom_status, n FROM m
      UNION ALL
      SELECT 'referential_o_custkey', matched, n FROM r)
    SELECT "constraint",
           CAST(CASE WHEN n = 0 THEN 0
                ELSE (k * 1000000) // n END AS BIGINT) AS metric_micro,
           CAST(n > 0 AND k = n AS INT) AS passed
    FROM raw
    """,
)
def dq_orders_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-promotion quality contract for orders: completeness,
    key uniqueness, value range, accepted-value domain, and referential
    integrity to customer — one (constraint, metric_micro, passed) row
    each (operators/dataquality.py).

    All five table-local metrics fuse into ONE conditional-aggregate scan
    (adding constraints does not add passes); the referential check is a
    left-semi join that moves only the key column.  Integer micro-ratios
    end-to-end — the gate's pass/fail can never drift between engines."""
    orders = load_table(spark, sf_dir, "orders")
    local = dataquality.check_constraints(
        orders,
        completeness_cols=["o_custkey", "o_orderdate"],
        unique_col="o_orderkey",
        range_checks=[("totalprice_positive", "o_totalprice > 0")],
        domain_checks=[("o_orderstatus", ["F", "O", "P"])],
    )
    ref = dataquality.referential_integrity(
        orders,
        "o_custkey",
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
    )
    return local.unionAll(ref)


# ---- distributed ROC-AUC -----------------------------------------------------


@query(
    "classifier_auc",
    oracle=f"""
    WITH f AS (SELECT CAST({_SQL_LOGIT} AS BIGINT) AS s,
                      CAST(lang = 'en' AS BIGINT) AS y
               FROM documents),
    b AS (SELECT s, COUNT(*) AS n, SUM(y) AS np FROM f GROUP BY s),
    r AS (SELECT n, np,
                 COALESCE(SUM(n) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
          FROM b)
    SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           CAST(SUM(n) - SUM(np) AS BIGINT) AS n_neg,
           CAST(CASE WHEN SUM(np) = 0 OR SUM(n) = SUM(np) THEN NULL
                ELSE ((SUM(np * (2 * cum + n + 1))
                       - SUM(np) * (SUM(np) + 1)) * 1000000)
                     // (2 * SUM(np) * (SUM(n) - SUM(np))) END
                AS BIGINT) AS auc_micro
    FROM r
    """,
)
def classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware ROC-AUC of the fixed-weight quality logit against the
    lang='en' label, by Mann-Whitney rank-sum
    (operators/evaluation.py:auc_by_ranksum) — the eval half of the
    quality-classifier pipeline.

    The global rank never sorts the corpus: rows aggregate BY SCORE VALUE
    first, so the only ordered window runs over the score-domain-bounded
    bucket table (thousands of rows at any corpus size).  Doubled
    mid-ranks keep ties integral; AUC is exact int64 micro units."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.expr(f"CAST({SPARK_LOGIT} AS BIGINT)").alias("score"),
        (F.col("lang") == "en").cast("long").alias("label"),
    )
    return evaluation.auc_by_ranksum(docs, "score", "label")
