"""Relevance ranking over the documents table: BM25 scoring.

Search-style retrieval is the read side of a training-data pipeline
(mining documents similar to a seed set, building eval retrieval sets),
so BM25 joins dedup/quality as a first-class corpus operator.

Determinism contract (registry conventions): every input to the score is
an integer (tf, df, N, dl, sum_dl) and the score is a fixed-shape tree of
IEEE +,-,*,/ over those integers — no ln()/exp(), whose last-ulp behavior
differs across engines. We therefore use the *rank-odds* form of the BM25
IDF, ``(N - df + 0.5) / (df + 0.5)``, a strictly monotone transform of the
usual ``ln`` IDF: rankings are identical, values are bit-reproducible in
any IEEE engine. Per-(doc, term) scores are quantized to integer
micro-units BEFORE the per-doc sum so float summation order can never
flip the hash.

Scale: one scan of the corpus; tf for only the |Q| query terms survives
the explode filter, so the shuffle is O(matching doc-terms), not
O(corpus tokens); df and corpus stats are tiny broadcasts. Final top-k is
a TakeOrderedAndProject, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

from mapreducemovieanalysis_cloud_spark.functions.text import tokens

K1 = 1.2
B = 0.75
# Pre-fold the composite constants in Python once; both the Spark plan and
# the DuckDB oracle are built from repr() of THESE floats, so the two
# engines start from bit-identical literals.
K1_PLUS_1 = K1 + 1.0
ONE_MINUS_B = 1.0 - B


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    topk: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 over ``terms``: top-``topk`` docs by summed
    micro-unit score (desc), id ascending as the unique tie-break.

    Output: (id, bm25_micro BIGINT, n_terms_hit BIGINT).
    """
    toked = docs.select(F.col(id_col), tokens(text_col).alias("__t"))
    dl = toked.select(F.col(id_col), F.size("__t").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        toked.select(F.col(id_col), F.explode("__t").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return bm25_from_tables(tf, dl, stats, topk=topk, id_col=id_col)


def bm25_from_tables(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    topk: int = 50,
    id_col: str = "doc_id",
    n_terms_required: int | None = None,
) -> DataFrame:
    """The BM25 score tree over pre-computed tables — shared by the
    scan-time path (:func:`bm25_scores`) and the stored inverted-index
    probe (operators/invindex.py), so both produce bit-identical scores
    against the same oracle SQL.

    ``tf``: (id, term, tf) for the query terms only; ``dl``: (id, dl)
    for the whole corpus; ``stats``: one row (n_docs_total, sum_dl).
    ``n_terms_required`` filters to docs hitting exactly that many query
    terms (conjunctive AND) before the top-k cut.
    """
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # Shape of the score tree mirrors the oracle SQL exactly:
    #   idf_odds = (N - df + 0.5) / (df + 0.5)
    #   denom    = tf + k1 * ((1 - b) + (b * dl) / (sum_dl / N))
    #   micro    = round((idf_odds * ((tf * (k1+1)) / denom)) * 1e6)
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_odds",
            (F.col("n_docs_total") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5)),
        )
        .withColumn(
            "denom",
            F.col("tf")
            + F.lit(K1)
            * (
                F.lit(ONE_MINUS_B)
                + (F.lit(B) * F.col("dl"))
                / (F.col("sum_dl") / F.col("n_docs_total"))
            ),
        )
        .withColumn(
            "score_micro",
            round_half_up_long(
                (
                    F.col("idf_odds")
                    * ((F.col("tf") * F.lit(K1_PLUS_1)) / F.col("denom"))
                )
                * F.lit(1000000.0)
            ),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.sum("score_micro").alias("bm25_micro"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    if n_terms_required is not None:
        out = out.where(F.col("n_terms_hit") == F.lit(n_terms_required))
    return out.orderBy(
        F.col("bm25_micro").desc(), F.col(id_col).asc()
    ).limit(topk)


def bm25_oracle_sql(
    terms: list[str], topk: int = 50, require_all: bool = False
) -> str:
    """DuckDB oracle with the identical literal constants and the identical
    parenthesization as :func:`bm25_scores` (see module docstring)."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    # DuckDB parses bare decimal literals as DECIMAL (exact) arithmetic,
    # which rounds differently from IEEE doubles — CAST every float literal
    # to DOUBLE so both engines run the same double-precision tree.
    half = "CAST(0.5 AS DOUBLE)"
    k1 = f"CAST({K1!r} AS DOUBLE)"
    k1p1 = f"CAST({K1_PLUS_1!r} AS DOUBLE)"
    omb = f"CAST({ONE_MINUS_B!r} AS DOUBLE)"
    b = f"CAST({B!r} AS DOUBLE)"
    return rf"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents),
    dl AS (SELECT doc_id, len(t) AS dl FROM toks),
    stats AS (SELECT COUNT(*) AS n_docs_total,
                     CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           WHERE term IN ({term_list}) GROUP BY 1, 2),
    dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    sc AS (SELECT tf.doc_id,
             CAST(ROUND(
               (((n_docs_total - df + {half}) / (df + {half}))
                * ((tf * {k1p1})
                   / (tf + {k1} * ({omb}
                      + ({b} * dl) / (CAST(sum_dl AS DOUBLE) / n_docs_total)))))
               * 1000000.0) AS BIGINT) AS score_micro
           FROM tf JOIN dfx USING (term)
           JOIN dl ON tf.doc_id = dl.doc_id
           CROSS JOIN stats)
    SELECT doc_id, CAST(SUM(score_micro) AS BIGINT) AS bm25_micro,
           COUNT(*) AS n_terms_hit
    FROM sc GROUP BY doc_id
    {f"HAVING COUNT(*) = {len(terms)}" if require_all else ""}
    ORDER BY bm25_micro DESC, doc_id ASC LIMIT {topk}
    """


def skyline_2d(
    df: DataFrame,
    y_col: str,
    x_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline): the points not dominated under
    (maximize y, minimize x) — a point loses if another has y' >= y AND
    x' <= x with one strict.  Returns one (y, x) row per frontier point,
    x strictly increasing with y.

    Exploits the 2-D structure instead of the quadratic NOT-EXISTS: the
    skyline is a subset of {per-y min x} (anything else is dominated at
    its own y), so one distributive map-side MIN collapses the input to
    y-domain cardinality, and a single running-min sweep in descending y
    keeps exactly the rows whose x undercuts every higher-y minimum —
    ties on x lose to the higher y, ties on y lose to the smaller x,
    matching the strict-dominance definition.

    Scale: the aggregate is the only pass over the data (map-side
    partial MIN — a hot y costs nothing); the window runs over y-domain
    rows only.  For continuous y, bucket y first or run the same sweep
    per partition and re-sweep the union of partial frontiers — the
    skyline operator is distributive the same way MIN is.
    """
    per_y = df.groupBy(F.col(y_col).alias("y")).agg(
        F.min(F.col(x_col)).alias("x")
    )
    w = (
        Window.orderBy(F.desc("y"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_y.withColumn("__best_above", F.min("x").over(w))
        .where(
            F.col("__best_above").isNull()
            | (F.col("x") < F.col("__best_above"))
        )
        .select(
            F.col("y").alias(y_col), F.col("x").alias(x_col)
        )
    )


RRF_K = 60  # the canonical reciprocal-rank-fusion constant (Cormack et al.)


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    topk: int = 20,
    k_rrf: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists: each input carries
    (id, rank) with rank 1-based and already deterministic; a document
    scores SUM over the lists it appears in of 1000000 div (k + rank)
    — pure integer arithmetic, so the fused ordering is engine-exact
    with no float score normalization (the reason RRF beats score
    interpolation for heterogeneous rankers: BM25 micro-units and
    cosine live on incomparable scales; ranks always fuse).

    Output: (id, rrf_micro, n_lists) top-``topk`` by (rrf desc, id
    asc).  Scale: inputs are already top-k sized (bounded), so the
    union + groupBy touches O(N x k) rows — never the corpus.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked input")
    parts = [
        df.select(
            F.col(id_col),
            F.expr(f"CAST(1000000 DIV ({k_rrf} + rank) AS BIGINT)").alias(
                "__p"
            ),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.sum("__p").cast("long").alias("rrf_micro"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("rrf_micro").desc(), F.col(id_col).asc())
        .limit(topk)
    )
