"""Distributed BPE tokenizer training over the documents corpus.

Byte-pair-encoding training is the canonical "tokenizer fit" stage of an
LLM data pipeline: count word types once, then repeatedly merge the most
frequent adjacent symbol pair.  The Spark-first decomposition exploits the
two very different scales involved:

* the CORPUS is huge (100 TB) — it is touched exactly once, by the
  word-frequency aggregate (map-side partial counts, one shuffle keyed on
  the word type);
* the WORD-TYPE table is small (Heaps' law: ~millions of types for
  trillions of tokens) — every merge iteration runs on it alone, so the
  iterative part of the algorithm never rescans the corpus.

Each iteration is two dataframe ops: a weighted adjacent-pair count
(explode of per-word index pairs, aggregate weighted by word frequency)
and a leftmost-greedy merge applied as a single ``aggregate`` (fold) over
each word's symbol array.  The only driver action per iteration is the
argmax pair — one row, same O(1)-row discipline as
``operators.clustering``'s convergence probes.  The symbol table is
localCheckpoint-ed each iteration so the fold lineage stays one level deep
instead of nesting ``n_merges`` lambdas.

Determinism: ties in the pair argmax break on (count DESC, a ASC, b ASC);
the fold merges strictly leftmost-first, which is the standard BPE
convention, so the merge sequence is reproducible bit-for-bit (pinned
against a pure-Python reference in tests/test_round4b.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq) type table: the single corpus-wide pass.

    Whitespace tokenization matches the engine's text-surface convention
    (``split(trim(text), '\\s+')``, empties dropped).  Scale: one shuffle
    keyed on the word type with map-side partial counts; output is the
    Heaps-law-bounded type table every later stage runs on.
    """
    return (
        df.select(
            F.explode(F.expr(rf"split(trim({text_col}), '\\s+')")).alias(
                "word"
            )
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbol_table(words: DataFrame) -> DataFrame:
    """(word, freq) -> (freq, sym ARRAY<STRING>) with one symbol per
    character — merge iteration state zero."""
    return words.select(
        "freq",
        F.expr("filter(split(word, ''), x -> x <> '')").alias("sym"),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol table: (a, b, cnt).

    The per-word pair list is generated positionally (index sequence ->
    struct of neighbours) so a pair occurring twice in one word counts
    twice, weighted by the word's corpus frequency — exactly the statistic
    classic BPE maximizes.  Runs on the type table only; the corpus is
    never rescanned.
    """
    pairs = symbols.where(F.size("sym") >= 2).select(
        # guard: sequence(1, 0) DESCENDS in Spark, so single-symbol words
        # must be filtered before the index transform, not ranged away
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(sym) - 1),"
                " i -> struct(element_at(sym, i) AS a,"
                "             element_at(sym, i + 1) AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("freq").alias("cnt"))


def apply_merge(symbols: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every leftmost-first adjacent (a, b) into the single symbol
    a+b via one fold over each word's symbol array.

    The fold's accumulator-tail comparison implements the leftmost-greedy
    rule: after [.., a] sees b it becomes [.., ab], so an overlapping
    occurrence ("aaa" under (a,a)) correctly yields [aa, a].  Literals are
    bound through Column parameters (never interpolated into SQL text), so
    corpus symbols containing quotes are safe.
    """
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)

    def step(acc, x):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    empty = F.array().cast("array<string>")
    # withColumn (not select) so carrier columns — freq, or the word key
    # in the encode path — survive the fold
    return symbols.withColumn("sym", F.aggregate("sym", empty, step))


def bpe_train(
    words: DataFrame, n_merges: int, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) table;
    returns [(a, b, weighted_count)] in merge order.

    Per iteration: one pair-count aggregate over the type table, one
    1-row argmax collect (count DESC, a, b — deterministic), one fold to
    apply the merge, one localCheckpoint to keep the fold lineage flat.
    Stops early when no pair reaches ``min_count``.  At 100 TB the loop
    cost is independent of corpus size — it is (type-table rows x average
    word length) per iteration, all map-side except the pair-count
    shuffle whose key space is the current symbol vocabulary.
    """
    symbols = initial_symbol_table(words).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(symbols)
            .where(F.col("cnt") >= min_count)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((a, b, cnt))
        symbols = apply_merge(symbols, a, b).localCheckpoint()
    return merges


def bpe_encode_word(sym: list[str], merges: list[tuple[str, str, int]]) -> list[str]:
    """Reference (driver-side) encoder: apply the learned merge sequence
    to one symbol list, leftmost-first — the same fold ``apply_merge``
    runs distributed.  Used by tests and by callers tokenizing small
    probe strings without a Spark job."""
    for a, b, _ in merges:
        out: list[str] = []
        for x in sym:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        sym = out
    return sym


def bpe_encode_corpus(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenize a corpus with a learned merge list: (id, tokens
    ARRAY<STRING>) where each word is encoded by the merge sequence.

    The scalable shape encodes each word TYPE once, not each token
    occurrence: distinct words (Heaps-law-bounded) run through the merge
    folds, and the word->symbols mapping joins back onto the corpus rows
    (broadcast-sized for any real vocabulary-to-corpus ratio).  Merge
    folds chain lazily with a localCheckpoint every ``checkpoint_every``
    merges so the expression tree depth stays bounded while the type
    table stays distributed.

    Per-doc token order is restored by flattening the per-word encodings
    in the document's own word order.
    """
    words = df.select(
        F.col(id_col),
        F.expr(rf"filter(split(trim({text_col}), '\\s+'), x -> x <> '')")
        .alias("__words"),
    )
    types = (
        words.select(F.explode("__words").alias("word"))
        .distinct()
        .select(
            F.col("word"),
            F.expr("filter(split(word, ''), x -> x <> '')").alias("sym"),
        )
    )
    for k, (a, b, _) in enumerate(merges):
        types = apply_merge(types, a, b)
        if (k + 1) % checkpoint_every == 0:
            types = types.localCheckpoint()
    mapping = types.select("word", F.col("sym").alias("__enc"))
    exploded = words.select(
        id_col, F.posexplode("__words").alias("__pos", "word")
    )
    return (
        exploded.join(F.broadcast(mapping), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__enc"))
                    ),
                    lambda s: s["__enc"],
                )
            ).alias("tokens")
        )
    )


def save_merges(
    spark, merges: list[tuple[str, str, int]], path: str
) -> None:
    """Persist a learned merge list as parquet with its rank — the
    tokenizer artifact (train once, encode many), mirroring the stored
    IVF index lifecycle."""
    spark.createDataFrame(
        [(i, a, b, int(c)) for i, (a, b, c) in enumerate(merges)],
        "rank INT, a STRING, b STRING, cnt LONG",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str, int]]:
    """Reload a persisted merge list in training order."""
    return [
        (r["a"], r["b"], r["cnt"])
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]
