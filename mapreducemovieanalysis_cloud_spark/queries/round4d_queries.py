"""Round-4 fourth wave: evaluation/meta analytics over the engine's own
classifiers and corpus mix — Cohen's kappa for the language identifier,
calibration bins for the quality classifier, and temperature-scaled
multilingual sampling weights.

Everything but one 5-double pow-sum is exact int64: the kappa and
accuracy are integer rationals over contingency counts (both engines
truncate integer division toward zero — verified), calibration is fixed-
width integer binning, and the temperature mix rounds a double ratio to
micro units only at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions import text as T
from mapreducemovieanalysis_cloud_spark.operators import evaluation
from mapreducemovieanalysis_cloud_spark.queries.functions_queries import (
    _lang_score_sql,
)
from mapreducemovieanalysis_cloud_spark.queries.round3_queries import (
    _SQL_LOGIT,
    SPARK_LOGIT,
)
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- Cohen's kappa for the language identifier ------------------------------

_PRED_SQL = f"""
      SELECT lang AS label,
             CASE WHEN greatest({_lang_score_sql("en")},
                               {_lang_score_sql("es")},
                               {_lang_score_sql("de")},
                               {_lang_score_sql("fr")}) = 0 THEN 'unknown'
                  WHEN {_lang_score_sql("en")} = greatest(
                       {_lang_score_sql("en")}, {_lang_score_sql("es")},
                       {_lang_score_sql("de")}, {_lang_score_sql("fr")})
                    THEN 'en'
                  WHEN {_lang_score_sql("es")} = greatest(
                       {_lang_score_sql("en")}, {_lang_score_sql("es")},
                       {_lang_score_sql("de")}, {_lang_score_sql("fr")})
                    THEN 'es'
                  WHEN {_lang_score_sql("de")} = greatest(
                       {_lang_score_sql("en")}, {_lang_score_sql("es")},
                       {_lang_score_sql("de")}, {_lang_score_sql("fr")})
                    THEN 'de'
                  ELSE 'fr' END AS pred
      FROM documents
"""


@query(
    "langid_kappa",
    oracle=f"""
    WITH p AS ({_PRED_SQL}),
    conf AS (SELECT label, pred, COUNT(*) AS cnt FROM p GROUP BY 1, 2),
    tot AS (SELECT SUM(cnt) AS n,
                   SUM(CASE WHEN label = pred THEN cnt ELSE 0 END)
                     AS agree
            FROM conf),
    rows_ AS (SELECT label AS cls, SUM(cnt) AS rc FROM conf GROUP BY 1),
    cols_ AS (SELECT pred AS cls, SUM(cnt) AS cc FROM conf GROUP BY 1),
    pe AS (SELECT COALESCE(SUM(rc * cc), 0) AS pe_sum
           FROM rows_ JOIN cols_ USING (cls))
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(agree AS BIGINT) AS n_agree,
           CAST((agree * 1000000) // n AS BIGINT) AS accuracy_micro,
           CAST(((n * agree - pe_sum) * 1000000) // (n * n - pe_sum)
                AS BIGINT) AS kappa_micro
    FROM tot, pe
    """,
)
def langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement (Cohen's kappa) between the stopword
    language identifier and the labeled lang — the eval metric that,
    unlike raw accuracy, doesn't reward majority-class parroting.

    kappa = (n*agree - SUM(row_c * col_c)) / (n^2 - SUM(row_c * col_c)) —
    an integer rational over contingency counts.  Plan: one shuffle
    builds the contingency table (classes^2 rows at ANY corpus size);
    totals, marginals and the kappa assemble on that tiny table with
    broadcast cross-joins.  At n beyond ~3·10^9 the n^2 term needs
    DECIMAL(38) instead of int64 — wire the cast when a corpus actually
    crosses it rather than paying decimal arithmetic everywhere now.
    Degenerate corpora (one class on both axes) zero the denominator —
    kappa is undefined there by definition; Spark's div yields NULL,
    which the caller should read as "no chance correction possible"."""
    docs = load_table(spark, sf_dir, "documents")
    scores = T.lang_scores_from_tokens(T.tokens("text"))
    pred = docs.select(
        F.col("lang").alias("label"),
        T.predicted_lang_from_scores(scores).alias("pred"),
    )
    # the contingency table is classes^2 rows; localCheckpoint it so the
    # four derived aggregates (totals, two marginals, pe) all read these
    # few rows instead of re-running the corpus scan per branch
    conf = (
        pred.groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = conf.agg(
        F.sum("cnt").alias("n"),
        F.sum(
            F.when(F.col("label") == F.col("pred"), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("agree"),
    )
    rows_ = conf.groupBy(F.col("label").alias("cls")).agg(
        F.sum("cnt").alias("rc")
    )
    cols_ = conf.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("cnt").alias("cc")
    )
    pe = (
        rows_.join(cols_, "cls")
        .agg(F.coalesce(F.sum(F.col("rc") * F.col("cc")), F.lit(0)).alias(
            "pe_sum"
        ))
    )
    return tot.crossJoin(F.broadcast(pe)).select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("agree").cast("long").alias("n_agree"),
        F.expr("(agree * 1000000) div n").alias("accuracy_micro"),
        F.expr(
            "((n * agree - pe_sum) * 1000000) div (n * n - pe_sum)"
        ).alias("kappa_micro"),
    )


# ---- calibration bins for the quality classifier ----------------------------

_CAL_LO = -300
_CAL_WIDTH = 60


@query(
    "classifier_calibration",
    oracle=f"""
    WITH f AS (SELECT CAST({_SQL_LOGIT} AS BIGINT) AS s,
                      CAST(lang = 'en' AS BIGINT) AS y
               FROM documents)
    SELECT CAST((s - {_CAL_LO}) // {_CAL_WIDTH} AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST((SUM(y) * 1000000) // COUNT(*) AS BIGINT)
             AS pos_rate_micro
    FROM f GROUP BY 1
    """,
)
def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram data for the quality logit against the
    lang='en' label: fixed-width logit bins (width {w}, origin {lo} — the
    logit's exact lower bound) with the positive fraction per bin, the
    companion diagnostic to `classifier_auc` (AUC ranks; calibration
    checks the probabilities themselves).

    Fixed-width integer binning — never data-derived quantiles — keeps
    the bin of a row a pure function of the row, so bins are stable
    across engines, partitions, and corpus growth.  One aggregate,
    map-side partials, bin cardinality bounded by the logit domain."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr(f"CAST({SPARK_LOGIT} AS BIGINT)").alias("s"),
            (F.col("lang") == "en").cast("long").alias("y"),
        )
        .groupBy(
            F.expr(f"CAST((s - {_CAL_LO}) div {_CAL_WIDTH} AS INT)").alias(
                "bin"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").alias("n_pos"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.expr("(n_pos * 1000000) div n_docs").alias(
                "pos_rate_micro"
            ),
        )
    )


classifier_calibration.__doc__ = classifier_calibration.__doc__.format(
    w=_CAL_WIDTH, lo=_CAL_LO
)


# ---- temperature-scaled multilingual sampling -------------------------------

_MIX_ALPHA = 0.7


@query(
    "lang_temperature_mix",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    t AS (SELECT SUM(pow(CAST(n_docs AS DOUBLE), {_MIX_ALPHA})) AS z
          FROM c)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(ROUND(pow(CAST(n_docs AS DOUBLE), {_MIX_ALPHA}) / z
                      * 1000000) AS BIGINT) AS weight_micro
    FROM c, t
    """,
)
def lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling weights (alpha = {a}):
    w_l proportional to count_l^alpha — the standard up-weighting of
    low-resource languages in multilingual pretraining mixes (the
    population fraction cancels, so counts feed pow directly).

    Scale: one count aggregate (language cardinality is tiny), the
    normalizer is a 1-row broadcast back — the corpus is scanned once and
    never re-shuffled.  The single float ratio rounds to micro units at
    the very end; a last-ulp libm pow() divergence sits ten orders of
    magnitude below the rounding step."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    z = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), _MIX_ALPHA)).alias("z")
    )
    return counts.crossJoin(F.broadcast(z)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(
            F.pow(F.col("n_docs").cast("double"), _MIX_ALPHA)
            / F.col("z")
            * 1_000_000
        )
        .cast("long")
        .alias("weight_micro"),
    )


lang_temperature_mix.__doc__ = lang_temperature_mix.__doc__.format(
    a=_MIX_ALPHA
)


# ---- ANN index quality: recall@k vs exact ground truth -----------------------

_RECALL_K = 10
_RECALL_NQ = 5
_RECALL_NCENT = 8
_RECALL_NPROBE = 2


def _ann_recall_oracle() -> str:
    """Compose the brute-force and IVF oracle chains (same fragments as
    their standalone queries) and count the overlap per query."""
    from mapreducemovieanalysis_cloud_spark.queries.pipeline_queries import (
        _COSINE,
        _QUANT,
        _dot,
    )

    k, nq = _RECALL_K, _RECALL_NQ
    ncent, nprobe = _RECALL_NCENT, _RECALL_NPROBE
    cdot = _dot("b.qv", "c.qc")
    return f"""
    WITH base AS (SELECT vec_id, {_QUANT.format(v='embedding')} AS qv
                  FROM embeddings),
    bq AS (SELECT vec_id AS query_id, qv AS qa FROM base
           WHERE vec_id < {nq}),
    bscored AS (SELECT query_id, c.vec_id AS neighbor_id, qa, c.qv AS qb
                FROM bq, base c WHERE c.vec_id <> query_id),
    btop AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY {_COSINE} DESC, neighbor_id) AS rank
               FROM bscored) WHERE rank <= {k}),
    cents AS (SELECT vec_id AS cent_id, qv AS qc FROM base
              WHERE vec_id < {ncent}),
    assign AS (SELECT vec_id, cell FROM (
                 SELECT b.vec_id, c.cent_id AS cell,
                        ROW_NUMBER() OVER (PARTITION BY b.vec_id
                          ORDER BY {cdot} DESC, c.cent_id) AS rn
                 FROM base b, cents c) WHERE rn = 1),
    qprobe AS (SELECT vec_id AS query_id, cell FROM (
                 SELECT b.vec_id, c.cent_id AS cell,
                        ROW_NUMBER() OVER (PARTITION BY b.vec_id
                          ORDER BY {cdot} DESC, c.cent_id) AS rn
                 FROM base b, cents c WHERE b.vec_id < {nq})
               WHERE rn <= {nprobe}),
    iscored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
                       tq.qv AS qa, tn.qv AS qb
                FROM qprobe p
                JOIN assign a ON a.cell = p.cell
                JOIN base tq ON tq.vec_id = p.query_id
                JOIN base tn ON tn.vec_id = a.vec_id
                WHERE a.vec_id <> p.query_id),
    itop AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY {_COSINE} DESC, neighbor_id) AS rank
               FROM iscored) WHERE rank <= {k})
    SELECT b.query_id,
           CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
           CAST((COUNT(i.neighbor_id) * 1000000) // {k} AS BIGINT)
             AS recall_micro
    FROM btop b LEFT JOIN itop i
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.query_id
    """


@query("ann_recall_ivf", oracle=_ann_recall_oracle())
def ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the IVF index (nprobe={p}) against exact brute-force
    ground truth, per query (operators/evaluation.py:recall_at_k) — the
    build→probe→MEASURE closing of the similarity-search story: an ANN
    tier you can't measure is an ANN tier you can't tune.

    Scale: ground truth is computed for a small evaluation query SAMPLE
    (here {q} queries), never the full corpus — the brute-force side is
    |sample| x corpus scored once, and the recall join is k-rows-per-query
    on both sides.  The oracle composes the SAME CTE fragments as the
    standalone ann_bruteforce/ann_ivf oracles, so a drift in either
    pipeline breaks exactly one query."""
    from mapreducemovieanalysis_cloud_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _RECALL_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, queries_df, k=_RECALL_K)
    approx = similarity.ann_ivf_topk(
        emb,
        queries_df,
        k=_RECALL_K,
        n_centroids=_RECALL_NCENT,
        nprobe=_RECALL_NPROBE,
    )
    return evaluation.recall_at_k(approx, exact, k=_RECALL_K)


ann_recall_ivf.__doc__ = ann_recall_ivf.__doc__.format(
    k=_RECALL_K, p=_RECALL_NPROBE, q=_RECALL_NQ
)
