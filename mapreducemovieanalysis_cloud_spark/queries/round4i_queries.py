"""Round-4 ninth wave: corpus-linguistics curation — LLR keyness per
language, asymmetric containment near-dup pairs, and per-source
boilerplate shingle detection.

Exactness discipline: counts are int64; keyness's two ln() terms are the
single identical double expression micro-rounded once and RANKED on the
rounded integer; containment and boilerplate gates are rational-integer
comparisons with no floats at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- LLR keyness per language ------------------------------------------------


@query(
    "keyness_llr_by_lang",
    oracle=r"""
    WITH toks AS (SELECT lang AS g,
                         unnest(string_split_regex(trim(text), '\s+')) AS tok
                  FROM documents WHERE length(trim(text)) > 0),
    tk AS (SELECT g, tok FROM toks WHERE length(tok) > 0),
    a AS (SELECT g, tok, COUNT(*) AS a FROM tk GROUP BY 1, 2),
    tot AS (SELECT tok, COUNT(*) AS ab FROM tk GROUP BY 1),
    grp AS (SELECT g, COUNT(*) AS ga FROM tk GROUP BY 1),
    nn AS (SELECT CAST(SUM(ga) AS BIGINT) AS n FROM grp),
    j AS (SELECT a.g, a.tok, a.a, tot.ab - a.a AS b, grp.ga,
                 nn.n - grp.ga AS gb, tot.ab, nn.n
          FROM a JOIN tot USING (tok) JOIN grp USING (g) CROSS JOIN nn
          WHERE tot.ab >= 5 AND a.a * nn.n > grp.ga * tot.ab),
    s AS (SELECT g AS lang, tok AS token,
                 CAST(a AS BIGINT) AS cnt_in, CAST(b AS BIGINT) AS cnt_out,
                 CAST(ROUND((CAST(a AS DOUBLE)
                             * ln(CAST(a AS DOUBLE) * CAST(n AS DOUBLE)
                                  / (CAST(ga AS DOUBLE) * CAST(ab AS DOUBLE)))
                             + CASE WHEN b = 0 THEN 0.0 ELSE
                               CAST(b AS DOUBLE)
                               * ln(CAST(b AS DOUBLE) * CAST(n AS DOUBLE)
                                    / (CAST(gb AS DOUBLE) * CAST(ab AS DOUBLE)))
                               END) * 2 * 1000000) AS BIGINT) AS llr_micro
          FROM j),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY llr_micro DESC, token) AS rk
          FROM s)
    SELECT lang, token, cnt_in, cnt_out, llr_micro FROM r WHERE rk <= 10
    """,
)
def keyness_llr_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 distinctive tokens per language by Dunning LLR keyness
    (operators/curation.py:llr_keyness) — which vocabulary is
    OVER-represented in each slice vs the rest of the corpus, the
    standard corpus-linguistics contrast statistic (and a practical
    lang-ID/contamination debugging view).

    Scale: one token explode into three grouped counts; joins key on
    token/group; the rank runs on the already-micro-rounded integer so
    engines cannot reorder ties."""
    from mapreducemovieanalysis_cloud_spark.operators import curation

    return curation.llr_keyness(load_table(spark, sf_dir, "documents"))


# ---- asymmetric containment pairs -------------------------------------------


# module-level so the staged containment_threshold_sweep derives its
# histogram from the identical pair SQL (lockstep by import)
_CONTAINMENT_ORACLE = r"""
    WITH toked AS (SELECT doc_id,
                          string_split_regex(trim(text), '\s+') AS t
                   FROM documents WHERE length(trim(text)) > 0),
    sh AS (SELECT DISTINCT doc_id,
                  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM toked, unnest(generate_series(1, greatest(len(t) - 2, 0)))
                AS g(i)),
    sz AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY 1),
    ix AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
           FROM sh x JOIN sh y
             ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
           GROUP BY 1, 2)
    SELECT ix.doc_a, ix.doc_b, CAST(sz.s AS BIGINT) AS size_a,
           CAST(ix.c AS BIGINT) AS overlap,
           CAST(ix.c * 1000 // sz.s AS BIGINT) AS containment_permille
    FROM ix JOIN sz ON sz.doc_id = ix.doc_a
    WHERE ix.c * 2 >= sz.s
    """


@query("containment_pairs", oracle=_CONTAINMENT_ORACLE)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional doc-in-doc near-dup pairs: |A∩B|/|A| >= 1/2 on word
    3-gram shingle sets (operators/dedup.py:containment_pairs) — the
    asymmetric complement of dedup_jaccard that catches a short doc
    quoted inside a long one (high containment, low Jaccard).

    The oracle is the brute-force postings self-join; the engine
    generates candidates from only the probing side's md5-ordered prefix
    (losslessly — any ceil(t·|A|)-overlap must touch A's first
    |A|−r+1 shingles) before re-counting the exact intersection.

    Scale: postings-keyed joins only; candidates are linear in truly
    shared shingles, and the asymmetric prefix cut shrinks the probe
    side ~(1−t) with zero recall loss."""
    from mapreducemovieanalysis_cloud_spark.operators import dedup

    return dedup.containment_pairs(load_table(spark, sf_dir, "documents"))


# ---- per-source boilerplate shingles ----------------------------------------


@query(
    "boilerplate_by_source",
    oracle=r"""
    WITH toked AS (SELECT source, doc_id,
                          string_split_regex(trim(text), '\s+') AS t
                   FROM documents WHERE length(trim(text)) > 0),
    sh AS (SELECT DISTINCT source, doc_id,
                  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM toked, unnest(generate_series(1, greatest(len(t) - 2, 0)))
                AS g(i)),
    df AS (SELECT source, shingle, COUNT(*) AS df FROM sh GROUP BY 1, 2),
    ds AS (SELECT source, COUNT(*) AS docs_in_source FROM documents
           GROUP BY 1)
    SELECT df.source, df.shingle, CAST(df.df AS BIGINT) AS df,
           CAST(ds.docs_in_source AS BIGINT) AS docs_in_source,
           CAST(df.df * 1000 // ds.docs_in_source AS BIGINT) AS df_permille
    FROM df JOIN ds USING (source)
    WHERE df.df >= 3 AND df.df * 1000 >= ds.docs_in_source * 100
    """,
)
def boilerplate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate word 3-grams: shingles present in >= 3 docs
    AND >= 10% of the source's documents (operators/curation.py:
    boilerplate_shingles) — the template detector that runs before
    near-dedup so shared headers/footers don't glue unrelated documents
    into one near-dup cluster.

    Scale: distinct (source, doc, shingle) partial-aggregates map-side to
    (source, shingle) df counts; the per-source doc-count dimension
    broadcasts; output is bounded by genuinely repeated shingles."""
    from mapreducemovieanalysis_cloud_spark.operators import curation

    return curation.boilerplate_shingles(
        load_table(spark, sf_dir, "documents")
    )
