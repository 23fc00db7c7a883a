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

from mapreducemovieanalysis_cloud_spark.operators import (
    aggregates,
    cdc,
    dedup,
    joins,
    pq,
    ranking,
)
from mapreducemovieanalysis_cloud_spark.queries.pipeline_queries import (
    _QUANT,
    _dot,
    _norm2,
)
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


def _pq_oracle(
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    n_queries: int = 5,
    topk: int = 10,
) -> str:
    """Unrolled-CTE mirror of operators.pq (same schedule as the
    kmeans_embeddings oracle: assign/update per iteration, codes from the
    final assign, distance table against the centroids that assign used)."""
    subdim = dim // m

    def assign(cents: str, out: str) -> str:
        return f"""
    {out} AS (SELECT vec_id, j, sv, sn2, cell FROM (
        SELECT p.vec_id, p.j, p.sv, p.sn2, c.cell,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.j
                 ORDER BY p.sn2 - 2 * {_dot('p.sv', 'c.cv')} + c.cn2 ASC,
                          c.cell ASC) AS rn
        FROM pn p JOIN {cents} c ON p.j = c.j) WHERE rn = 1)"""

    def update(src: str, out: str) -> str:
        return f"""
    {out}_dims AS (SELECT j, cell, i,
                          CAST(ROUND(CAST(SUM(sv[i]) AS DOUBLE) / COUNT(*))
                               AS BIGINT) AS v
                   FROM {src} CROSS JOIN generate_series(1, {subdim}) g(i)
                   GROUP BY j, cell, i),
    {out}_arr AS (SELECT j, cell, list(v ORDER BY i) AS cv
                  FROM {out}_dims GROUP BY j, cell),
    {out} AS (SELECT j, cell, cv, {_norm2('cv')} AS cn2 FROM {out}_arr)"""

    parts = [
        f"""WITH base AS (SELECT vec_id, {_QUANT.format(v='embedding')} AS qv
                  FROM embeddings),
    sub AS (SELECT vec_id, j,
                   list_slice(qv, j * {subdim} + 1, (j + 1) * {subdim}) AS sv
            FROM base CROSS JOIN generate_series(0, {m - 1}) g(j)),
    pn AS (SELECT vec_id, j, sv, {_norm2('sv')} AS sn2 FROM sub),
    c0 AS (SELECT j, vec_id AS cell, sv AS cv, sn2 AS cn2 FROM pn
           WHERE vec_id < {k})"""
    ]
    cents = "c0"
    for it in range(1, iters + 1):
        parts.append(assign(cents, f"a{it}"))
        if it < iters:
            parts.append(update(f"a{it}", f"c{it}"))
            cents = f"c{it}"
    parts.append(
        f"""
    codes AS (SELECT vec_id, j, cell AS code FROM a{iters}),
    qsub AS (SELECT vec_id AS query_id, j, sv, sn2 FROM pn
             WHERE vec_id < {n_queries}),
    dtab AS (SELECT q.query_id, q.j, c.cell AS code,
                    q.sn2 - 2 * {_dot('q.sv', 'c.cv')} + c.cn2 AS d2q
             FROM qsub q JOIN {cents} c ON q.j = c.j),
    adc AS (SELECT d.query_id, co.vec_id AS neighbor_id,
                   CAST(SUM(d.d2q) AS BIGINT) AS adc_d2
            FROM codes co
            JOIN dtab d ON co.j = d.j AND co.code = d.code
            WHERE co.vec_id <> d.query_id
            GROUP BY 1, 2)"""
    )
    return (
        ",".join(parts)
        + f"""
    SELECT query_id, neighbor_id, adc_d2, CAST(rank AS INT) AS rank FROM (
      SELECT query_id, neighbor_id, adc_d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
      FROM adc)
    WHERE rank <= {topk}
    """
    )


@query("ann_pq", oracle=_pq_oracle())
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: per-subspace codebooks (m=4, k=16, two
    Lloyd rounds), 4-byte codes, asymmetric-distance top-10 for 5 query
    vectors — the compressed-index similarity tier."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq.ann_pq_topk(emb, queries, topk=10, m=4, k=16, iters=2, dim=64)
