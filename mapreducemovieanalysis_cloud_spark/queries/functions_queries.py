"""Text-analysis queries over the documents table (north-star ops), each with
an exact DuckDB oracle. Heuristics are integer arithmetic over token counts
(functions.text) so both engines compute identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions import text as T
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

_TOKS = r"string_split_regex(trim(text), '\s+')"


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INT) AS n_tokens,
           CAST(len(list_distinct({_TOKS})) AS INT) AS n_distinct,
           CAST(length(text) AS INT) AS n_chars_calc,
           CAST(len(regexp_extract_all(text,
                '[a-zA-Z]+|[0-9]+|[^\\sa-zA-Z0-9]')) AS INT) AS n_bpe_ish
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, chars, BPE-ish
    chunks — all JVM-side expressions over the scan, zero shuffles. Tokens
    materialize once in the first projection (see
    ``functions.text.stopword_hits_from_tokens`` on why)."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "text", T.tokens("text").alias("__toks"))
    return toked.select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("n_distinct"),
        F.length("text").alias("n_chars_calc"),
        T.bpe_ish_token_count().alias("n_bpe_ish"),
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({_TOKS}, "
        f"t -> list_contains([{words}], t))) AS INT)"
    )


@query(
    "lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('fr')} AS s_fr
      FROM documents
    )
    SELECT doc_id, lang AS labeled_lang, s_en, s_es, s_de, s_fr,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'unknown'
                WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-count language ID (argmax with fixed priority tie-break).
    Two projections: tokenize once, score once, then the argmax CASE reads
    the materialized score columns (zero recomputation). A production
    pipeline swaps the heuristic for fastText via pandas_udf; the
    surrounding plan is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "lang", T.tokens("text").alias("__toks")
    )
    scores = T.lang_scores_from_tokens(F.col("__toks"))
    scored = toked.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        scores["en"].alias("s_en"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
        scores["fr"].alias("s_fr"),
    )
    score_cols = {
        lang: F.col(f"s_{lang}") for lang in T.LANG_PRIORITY
    }
    return scored.select(
        "*", T.predicted_lang_from_scores(score_cols).alias("predicted_lang")
    )


@query(
    "quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS INT) AS n_tok,
             CAST(len(list_distinct({_TOKS})) AS INT) AS n_distinct,
             CAST(length(text) AS INT) AS n_chars,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INT)
               AS n_alpha
      FROM documents
    )
    SELECT doc_id, n_tok AS n_tokens,
           ((CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1 ELSE 0 END)
          + (CASE WHEN n_distinct * 10 > n_tok * 3 THEN 1 ELSE 0 END)
          + (CASE WHEN n_alpha >= n_tok * 3 AND n_alpha <= n_tok * 12
                  THEN 1 ELSE 0 END)
          + (CASE WHEN n_alpha * 10 > n_chars * 6 THEN 1 ELSE 0 END))
          / 4.0 AS quality
    FROM m
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality gates (length, repetition, word length, alpha
    ratio) as exact integer comparisons over once-materialized counts."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "text", T.tokens("text").alias("__toks"))
    counted = toked.select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("__n_distinct"),
        F.length("text").alias("__n_chars"),
        F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")).alias(
            "__n_alpha"
        ),
    )
    n_tok, n_distinct = F.col("n_tokens"), F.col("__n_distinct")
    n_chars, n_alpha = F.col("__n_chars"), F.col("__n_alpha")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1).otherwise(0)
    diversity_ok = F.when(n_distinct * 10 > n_tok * 3, 1).otherwise(0)
    word_len_ok = F.when(
        (n_alpha >= n_tok * 3) & (n_alpha <= n_tok * 12), 1
    ).otherwise(0)
    alpha_ok = F.when(n_alpha * 10 > n_chars * 6, 1).otherwise(0)
    quality = (
        (len_ok + diversity_ok + word_len_ok + alpha_ok).cast("double") / 4.0
    )
    return counted.select("doc_id", "n_tokens", quality.alias("quality"))


@query(
    "fingerprint_docs",
    oracle=r"""
    SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting + exact dedup: md5 of normalized text; min
    doc_id survives. The shuffle moves 40 bytes/row regardless of doc size."""
    from mapreducemovieanalysis_cloud_spark.operators.dedup import exact_dedup

    return exact_dedup(load_table(spark, sf_dir, "documents"))
