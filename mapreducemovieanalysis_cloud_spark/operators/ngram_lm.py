"""Distributed n-gram language-model scoring — the classic corpus
quality filter (CCNet / KenLM style): train n-gram counts on a reference
corpus, score every document by its per-token negative log-probability,
and gate or bucket on the score.  Documents far from the reference
distribution (boilerplate, gibberish, wrong language) score high.

The reference repo has no text modeling at all (its only text handling
is the CSV split, ``MovieRank.java:58``); this is part of the engine's
LLM-training-data north star, alongside lang-id and the heuristic
quality gates (operators/curation.py) — those are per-doc expressions,
while this one scores each doc AGAINST the corpus-level distribution.

Spark-first shape (no UDFs anywhere):

* **Training** is two grouped counts over exploded n-gram occurrences —
  shuffles keyed on the n-gram / context string, count-sized output
  (vocab², not corpus-sized).  Train once, reuse across scoring runs:
  the count tables are plain DataFrames, persistable like any MV.
* **Scoring** collapses each doc's occurrences to (doc, ngram, occ)
  multiplicities BEFORE joining the count tables, so the big join moves
  one row per distinct ngram-per-doc, not per token.  The per-doc
  aggregate is a sum of ``occ · ln((c + k)/(ctx + k·V))`` terms — the
  identical double expression on integer counts in both engines (the
  entropy_lang_by_source determinism pattern), micro-rounded at the end.
* **Smoothing** is add-k with integer k over the training vocab V
  (distinct unigrams), so every probability is a ratio of integers and
  unseen n-grams (including unseen contexts) score ln(k/(k·V)) — no
  zero-probability blowups on out-of-domain docs, no float state in the
  model itself.

At 100 TB: the count tables are the only state (bounded by observed
vocab, broadcastable when small); scoring is one shuffle keyed on the
ngram hash + one doc-keyed aggregate.  Skewed n-grams (stopword pairs)
are exactly the rows partial aggregation collapses map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Behavior version of the incremental count-store (n-gram definition,
# tokenization, epoch layout).  Cache keys that address a persistent
# store built by incremental_ngram_append MUST include this constant:
# bump it whenever a change here would make previously-written counts
# stale, so cached stores are invalidated by the code change itself
# rather than by someone remembering to flush /tmp (r09 advisor item).
INCREMENTAL_STORE_VERSION = "lm2"

__all__ = ["ngram_model", "score_documents", "ngram_perplexity_buckets"]


def _occurrences(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """One row per n-gram occurrence: (id, ngram, context) with the
    context being the leading (n-1)-gram.  Pure expressions: tokenize,
    slide with transform over an index sequence, posexplode."""
    if n < 2:
        raise ValueError("ngram_lm needs n >= 2 (context must be non-empty)")
    from mapreducemovieanalysis_cloud_spark.operators.skew import (
        fan_out_underparallel,
    )

    # Rebalance when the scan is narrower than the cluster (the
    # minhash-family pattern, see skew.fan_out_underparallel): the
    # gram build pays two array_join string constructions per
    # occurrence, and on a single-row-group corpus file the whole
    # explode otherwise runs on one core.  Self-extinguishing at scale.
    toked = fan_out_underparallel(
        docs.select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
        )
    ).where(
        # docs shorter than n tokens have no n-grams; filtering BEFORE
        # building the index sequence also keeps sequence(0, len-n)
        # non-descending (a negative stop makes it count downward and
        # slice(…, 0, …) then errors)
        F.size("__t") >= n
    )
    toks = F.col("__t")
    # positions 0 .. len-n; ngram i = tokens[i .. i+n-1]
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.struct(
            F.array_join(F.slice(toks, i + 1, n), " ").alias("ngram"),
            F.array_join(F.slice(toks, i + 1, n - 1), " ").alias("context"),
        ),
    )
    return (
        toked.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), F.col("g.ngram"), F.col("g.context"))
    )


def ngram_model(
    train_docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the model: ``(ngram_counts, context_counts, vocab)``.

    ``ngram_counts``: (ngram, c) over all occurrences;
    ``context_counts``: (context, ctx) — NOT derivable from ngram_counts
    by prefix-summing strings at scale, so it is its own grouped count
    of the same exploded pass; ``vocab``: one row (v) = distinct
    unigram count, the smoothing denominator's V.  The exploded pass is
    localCheckpointed so the two grouped counts share one tokenize
    (the invindex ``_postings`` pattern)."""
    occ = _occurrences(train_docs, n, id_col, text_col).localCheckpoint(
        eager=False
    )
    ngram_counts = occ.groupBy("ngram").agg(F.count(F.lit(1)).alias("c"))
    context_counts = occ.groupBy("context").agg(
        F.count(F.lit(1)).alias("ctx")
    )
    vocab = (
        train_docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("t")
        )
        .agg(F.count_distinct("t").alias("v"))
    )
    return ngram_counts, context_counts, vocab


def score_documents(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    n: int = 2,
    k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc add-k n-gram score: (id, n_terms, neg_logprob_micro,
    avg_neg_logprob_micro).

    Each n-gram occurrence contributes
    ``-ln((c + k) / (ctx + k·V))`` with c/ctx = training counts (0 when
    unseen — left joins + coalesce, never dropped rows), so every term
    is the log of a ratio of integers; the per-doc mean is the
    log-perplexity (perplexity = exp of it).  Docs shorter than n
    tokens have no terms and are absent — they cannot be scored, and
    surfacing them as 0 would rank gibberish as perfect.

    The join moves (doc, distinct-ngram) multiplicities, not tokens;
    count tables join on their natural keys (broadcast them upstream if
    the vocabulary is small).  Output is micro-rounded BIGINT (the
    repo-wide float-determinism pattern)."""
    ngram_counts, context_counts, vocab = model
    per_doc = (
        _occurrences(docs, n, id_col, text_col)
        .groupBy(F.col(id_col), "ngram", "context")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    joined = (
        per_doc.join(ngram_counts, "ngram", "left")
        .join(context_counts, "context", "left")
        .crossJoin(F.broadcast(vocab))
    )
    term = -F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(k)).cast("double")
        / (
            F.coalesce(F.col("ctx"), F.lit(0)) + F.lit(k) * F.col("v")
        ).cast("double")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("occ").cast("long").alias("n_terms"),
            F.round(F.sum(F.col("occ") * term) * 1_000_000)
            .cast("long")
            .alias("neg_logprob_micro"),
            F.round(
                F.sum(F.col("occ") * term) / F.sum("occ") * 1_000_000
            )
            .cast("long")
            .alias("avg_neg_logprob_micro"),
        )
    )


def ngram_perplexity_buckets(
    docs: DataFrame,
    n: int = 2,
    k: int = 1,
    bucket_micro: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level quality histogram: self-train on ``docs`` and bucket
    every doc's avg negative log-prob into ``bucket_micro``-wide bins —
    the bounded-cardinality report a curation run reads to pick its
    gate threshold (the raw per-doc scores stay distributed).  Output:
    (bucket, n_docs, min/max micro) sorted by bucket."""
    scored = score_documents(
        docs, ngram_model(docs, n, id_col, text_col), n, k, id_col, text_col
    )
    bucket = (
        F.floor(F.col("avg_neg_logprob_micro") / F.lit(bucket_micro))
        .cast("long")
        .alias("bucket")
    )
    return (
        scored.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("avg_neg_logprob_micro").alias("min_micro"),
            F.max("avg_neg_logprob_micro").alias("max_micro"),
        )
        .orderBy("bucket")
    )


def incremental_ngram_append(
    batch_docs: DataFrame,
    store: str,
    batch_id: int | str,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Index a NEW batch of documents into a persistent n-gram count
    store without touching already-counted history — the LM twin of
    the incremental dedup/IVF stores: n-gram and context counts merge
    by plain addition and the vocabulary by set union, so the model is
    maintainable at O(batch), and the stored state is COUNT TABLES
    (Heaps-law sublinear), never text.

    Layout: ``<store>/{ngram,context,tokens}/batch=<id>`` via the
    shared idempotent epoch write (sources.writers.write_epoch — a
    retried batch rewrites its own directory, exactly-once at the
    batch level, same protocol as the fingerprint store).  The tokens
    table stores each batch's DISTINCT unigrams (not just a count):
    distinct-counts don't merge, distinct SETS do.
    """
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        write_epoch,
    )

    occ = _occurrences(batch_docs, n, id_col, text_col).localCheckpoint(
        eager=False
    )
    write_epoch(
        occ.groupBy("ngram").agg(F.count(F.lit(1)).alias("c")),
        f"{store}/ngram",
        batch_id,
    )
    write_epoch(
        occ.groupBy("context").agg(F.count(F.lit(1)).alias("ctx")),
        f"{store}/context",
        batch_id,
    )
    write_epoch(
        batch_docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("t")
        ).distinct(),
        f"{store}/tokens",
        batch_id,
    )


def incremental_ngram_model(
    spark, store: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The merged model over every committed batch in ``store`` —
    EXACTLY the model a full rebuild over the union of the batches
    would train (counts add, vocab unions; pinned by test/oracle):
    the ``(ngram_counts, context_counts, vocab)`` tuple
    ``score_documents`` consumes.

    Scale: reads count tables only (no text rescans, ever); the merge
    is one groupBy per table over batch-count rows."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        read_epochs,
    )

    ngram_counts = (
        read_epochs(spark, f"{store}/ngram")
        .groupBy("ngram")
        .agg(F.sum("c").alias("c"))
    )
    context_counts = (
        read_epochs(spark, f"{store}/context")
        .groupBy("context")
        .agg(F.sum("ctx").alias("ctx"))
    )
    vocab = (
        read_epochs(spark, f"{store}/tokens")
        .agg(F.count_distinct("t").alias("v"))
    )
    return ngram_counts, context_counts, vocab
