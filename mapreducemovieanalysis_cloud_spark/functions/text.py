"""Text-analysis column expressions for the documents table (north-star ops).

Everything here is a pure ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen'd, no Python in the hot path. At 100 TB these run as map
operations over the scan with zero shuffles.

The language-ID and quality heuristics are deliberately simple arithmetic over
token counts so they are bit-reproducible in any engine (they double as the
DuckDB oracle in the correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-count language-ID
# heuristic. Real pipelines swap in fastText/cld3 via a pandas_udf; the
# heuristic keeps the engine dependency-free and the oracle exact.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
}
# Deterministic priority order for score ties (argmax tie-break).
LANG_PRIORITY = ("en", "es", "de", "fr")


def tokens(text: str | Column = "text") -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: str | Column = "text") -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: str | Column = "text") -> Column:
    return F.size(F.array_distinct(tokens(text)))


def bpe_ish_token_count(text: str | Column = "text") -> Column:
    """BPE-ish token estimate: count of word/number/punct chunks after
    splitting CamelCase-free text on the regex a subword tokenizer would
    roughly follow. Cheap proxy for budgeting LLM token costs at scale."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]"), 0))


def stopword_hits_from_tokens(lang: str, toks: Column) -> Column:
    """Occurrences of ``lang``'s stopwords among a MATERIALIZED token array
    (higher-order filter — no UDF). Project the tokens first: expression CSE
    does not fully deduplicate repeated ``split`` trees across the four
    language scores (measured 1.7x on sf0.1)."""
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_hits(lang: str, text: str | Column = "text") -> Column:
    return stopword_hits_from_tokens(lang, tokens(text))


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    return {
        lang: stopword_hits_from_tokens(lang, toks) for lang in LANG_PRIORITY
    }


def lang_scores(text: str | Column = "text") -> dict[str, Column]:
    return {lang: stopword_hits(lang, text) for lang in LANG_PRIORITY}


def predicted_lang_from_scores(scores: dict[str, Column]) -> Column:
    """Argmax of (already-projected) per-language score columns with
    LANG_PRIORITY tie-break; 'unknown' when no stopword appears at all."""
    best = None
    for lang in LANG_PRIORITY:
        best = scores[lang] if best is None else F.greatest(best, scores[lang])
    expr = F.lit("unknown")
    # build CASE from lowest to highest priority so the highest-priority
    # language wins ties (the last WHEN evaluated in a chained when() wins
    # only if written first → iterate reversed)
    for lang in reversed(LANG_PRIORITY):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def predicted_lang(text: str | Column = "text") -> Column:
    return predicted_lang_from_scores(lang_scores(text))


def quality_score(text: str | Column = "text") -> Column:
    """Document quality in [0,1]: exact integer arithmetic over counts.

    score = 0.25·len_ok + 0.25·diversity_ok + 0.25·word_len_ok + 0.25·alpha_ok
    with each component a 0/1 gate — deterministic in any engine, no fp
    accumulation. Mirrors the usual Gopher/C4-style length & repetition
    filters in a reproducible form.
    """
    n_tok = token_count(text)
    n_distinct = distinct_token_count(text)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1).otherwise(0)
    # repetition gate: distinct/total > 0.3 ⇔ 10·distinct > 3·total (integers)
    diversity_ok = F.when(n_distinct * 10 > n_tok * 3, 1).otherwise(0)
    # mean word length 3..12 ⇔ 3·n_tok ≤ alpha ≤ 12·n_tok (integers)
    word_len_ok = F.when(
        (n_alpha >= n_tok * 3) & (n_alpha <= n_tok * 12), 1
    ).otherwise(0)
    # alpha ratio > 0.6 ⇔ 10·alpha > 6·chars
    alpha_ok = F.when(n_alpha * 10 > n_chars * 6, 1).otherwise(0)
    return (
        (len_ok + diversity_ok + word_len_ok + alpha_ok).cast("double") / 4.0
    )


def fingerprint(text: str | Column = "text") -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased text. Collision-free in practice, identical in any engine —
    the join key for exact dedup."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(F.encode(normalized, "UTF-8"))


def shingles_from_tokens(toks: Column, n: int) -> Column:
    """Ordered n-word shingles (with duplicates) from a MATERIALIZED token
    array column.

    Important for performance: pass a column that was projected in a prior
    select, not ``tokens(text)`` inline — common-subexpression elimination
    does not reach inside higher-order-function lambdas, so an inline
    ``split()`` re-tokenizes the document once per element_at (measured 15x
    slower on the sf0.1 shingle explode)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    shingled = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def positional_shingles(n: int, text: str | Column = "text") -> Column:
    """Ordered n-word shingles WITH duplicates (winnowing input — position
    matters, so no array_distinct). Prefer the two-step
    tokenize-project-then-``shingles_from_tokens`` path in operators."""
    return shingles_from_tokens(tokens(text), n)


def word_shingles(n: int, text: str | Column = "text") -> Column:
    """Distinct n-word shingles (the MinHash/Jaccard input set)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    shingled = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )
    # sequence() throws when size < n (empty range); short docs → empty set
    return F.when(F.size(toks) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )
