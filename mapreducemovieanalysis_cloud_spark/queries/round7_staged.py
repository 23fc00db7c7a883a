"""Round-7 REGISTRY CANDIDATES — implemented, oracle-backed, pytest-
verified, but NOT yet registered: the registry is frozen at 213 until
the rotation debt clears (SURVEY.md round-6 ledger item 8), and a new
entry would enter the driver's stalest-first window immediately,
displacing one of the planned rotation slots.

Each entry here is a ready-to-promote (query_fn, oracle_sql) pair in
the exact shape ``registry.query`` expects; round 7 promotes them by
moving the definitions into a registered module (or decorating them
here) once the freeze lifts.  ``tests/test_round7_staged.py`` runs the
same Spark-vs-DuckDB parity the driver would, so promotion is a
mechanical flip, not new verification work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

STAGED_ORACLES: dict[str, str] = {}
STAGED_QUERIES: dict = {}


def _staged(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


@_staged(
    "ngram_lm_scores",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    occ AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS ngram, t[i] AS context
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t)-1)) AS i
                  FROM toks WHERE len(t) >= 2)),
    nc AS (SELECT ngram, COUNT(*) AS c FROM occ GROUP BY 1),
    cc AS (SELECT context, COUNT(*) AS ctx FROM occ GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT tok) AS v
          FROM (SELECT unnest(t) AS tok FROM toks)),
    pd AS (SELECT doc_id, ngram, context, COUNT(*) AS occn
           FROM occ GROUP BY 1, 2, 3),
    j AS (SELECT pd.doc_id, pd.occn,
                 -ln(CAST(COALESCE(nc.c, 0) + 1 AS DOUBLE)
                     / CAST(COALESCE(cc.ctx, 0) + v.v AS DOUBLE)) AS term
          FROM pd LEFT JOIN nc USING (ngram)
                  LEFT JOIN cc USING (context)
                  CROSS JOIN v)
    SELECT doc_id, CAST(SUM(occn) AS BIGINT) AS n_terms,
           CAST(ROUND(SUM(occn * term) * 1000000) AS BIGINT)
               AS neg_logprob_micro,
           CAST(ROUND(SUM(occn * term) / SUM(occn) * 1000000) AS BIGINT)
               AS avg_neg_logprob_micro
    FROM j GROUP BY 1
    """,
)
def ngram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram add-1 LM score per document (CCNet-style
    quality signal): every add-k probability is a ratio of integer
    counts, the -ln terms run the identical double expression in both
    engines, and the per-doc outputs are micro-rounded BIGINTs
    (entropy_lang_by_source determinism pattern).  Scale posture in
    operators/ngram_lm.py."""
    from mapreducemovieanalysis_cloud_spark.operators import ngram_lm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_lm.score_documents(docs, ngram_lm.ngram_model(docs))


@_staged(
    "containment_candidate_stats",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
            FROM toks WHERE len(t) >= 3),
    sh AS (SELECT DISTINCT doc_id,
                  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM idx),
    sizes AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY 1),
    dfr AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
    ranked AS (SELECT sh.doc_id, sh.shingle, sizes.s,
                      ROW_NUMBER() OVER (
                          PARTITION BY sh.doc_id
                          ORDER BY dfr.df, md5(sh.shingle)) AS rk
               FROM sh JOIN dfr USING (shingle)
                       JOIN sizes USING (doc_id)),
    pre AS (SELECT doc_id AS doc_a, shingle, rk AS ra, s
            FROM ranked
            WHERE rk <= s - ((s * 1 + 1) // 2) + 1),
    cand AS (SELECT pre.doc_a, b.doc_id AS doc_b,
                    MIN(pre.s) AS s, MIN(pre.ra) AS ra,
                    MIN(b.rk) AS rb, MIN(b.s) AS sb
             FROM pre JOIN ranked b USING (shingle)
             WHERE pre.doc_a <> b.doc_id
             GROUP BY 1, 2),
    kept AS (SELECT * FROM cand
             WHERE LEAST(s - ra + 1, sb - rb + 1) * 2 >= 1 * s),
    nd AS (SELECT COUNT(*) AS n_docs FROM sizes),
    nk AS (SELECT COUNT(*) AS n_candidates FROM kept)
    SELECT CAST(nd.n_docs AS BIGINT) AS n_docs,
           CAST(nk.n_candidates AS BIGINT) AS n_candidates,
           CAST(nk.n_candidates * 1000000 // nd.n_docs AS BIGINT)
               AS candidates_per_doc_micro
    FROM nd CROSS JOIN nk
    """,
)
def containment_candidate_stats_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The containment detector's no-silent-caps measurement surface as
    a registry query (r05 verdict item 5): one-row candidate-density
    report under the default t=1/2 prefix scheme — run it before
    ``containment_pairs`` on an unfamiliar corpus; density growing with
    corpus size is the route-to-LSH signal.  The DuckDB oracle mirrors
    the (df, md5) canonical order and PPJoin+ positional gate exactly,
    so the driver checks the full candidate pipeline, not just the
    report arithmetic."""
    from mapreducemovieanalysis_cloud_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.containment_candidate_stats(docs, n=3, t_num=1, t_den=2)
