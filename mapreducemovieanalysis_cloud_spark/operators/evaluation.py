"""Model-evaluation metrics computed distributed: ROC-AUC by rank-sum.

AUC for a binary classifier equals the Mann-Whitney U statistic
normalized by n_pos * n_neg — the probability a random positive outranks
a random negative.  The textbook computation sorts every row by score
(a global sort) and sums positive ranks; the scalable formulation
aggregates BY SCORE VALUE first:

    score buckets: (score, n, n_pos)          -- one shuffle, map partials
    cumulative count below each bucket        -- window over the BUCKET
                                                 table (score-domain-sized,
                                                 not row-sized)
    2*midrank(bucket) = 2*cum_below + n + 1   -- ties get the mid-rank
    2U = sum(n_pos_b * 2*midrank_b) - ... (exact int64 all the way)

With an integer score (this engine's quality logit is exact int64
milli-units), the bucket table is bounded by the score DOMAIN — thousands
of rows however many documents exist — so the single-partition window runs
over a broadcast-sized frame, never over the corpus.  All arithmetic stays
int64; AUC is emitted in exact micro units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def auc_by_ranksum(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """One row (n_pos, n_neg, auc_micro) — exact mid-rank (tie-aware)
    ROC-AUC of integer ``score_col`` against 0/1 ``label_col``.

    auc_micro = (2U * MICRO) div (2 * n_pos * n_neg), where
    2U = sum over score buckets of n_pos_b * (2*cum_below + n_b + 1)
         - n_pos * (n_pos + 1): the doubled-rank trick keeps mid-ranks
    integral for even tie groups, so no fraction ever materializes.

    A single-class input (n_pos = 0 or n_neg = 0 — e.g. a one-row or
    one-label batch) emits NULL auc_micro, undefined by definition —
    the same contract the sliced ``auc_by_ranksum_grouped`` already
    carried (r08 single-row sweep)."""
    buckets = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(label_col).cast("long")).alias("__np"),
    )
    w = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = buckets.withColumn(
        "__cum", F.coalesce(F.sum("__n").over(w), F.lit(0))
    )
    return ranked.agg(
        F.sum("__np").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("long").alias("n_neg"),
        F.sum(
            F.col("__np") * (2 * F.col("__cum") + F.col("__n") + 1)
        ).alias("__two_mid"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr(
            f"CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE "
            f"((__two_mid - n_pos * (n_pos + 1)) * {MICRO})"
            f" div (2 * n_pos * n_neg) END"
        ).alias("auc_micro"),
    )


def recall_at_k(
    approx: DataFrame, exact: DataFrame, k: int
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one:
    (query_id, n_hits, recall_micro), one row per query — the index-
    quality metric every ANN deployment tracks next to its latency.

    Both inputs are (query_id, neighbor_id, ...) top-k sets.  Plan: one
    equi-join on (query_id, neighbor_id) — k rows per query on each side,
    so the join is query-cardinality-sized regardless of corpus size —
    then a per-query count.  A left join from the exact side keeps
    zero-hit queries in the output (an inner join would silently drop
    exactly the queries an index is failing on)."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select(
        "query_id", F.col("neighbor_id").alias("__hit")
    )
    return (
        e.join(
            a,
            (e["query_id"] == a["query_id"])
            & (e["neighbor_id"] == a["__hit"]),
            "left",
        )
        .groupBy(e["query_id"].alias("query_id"))
        .agg(F.count("__hit").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"(n_hits * {MICRO}) div {k}").alias("recall_micro"),
        )
    )


def auc_by_group(
    df: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Sliced ROC-AUC: one (group, n_pos, n_neg, auc_micro) row per
    group — the per-segment evaluation every quality dashboard slices by
    (language, source, cohort), same exact rank-sum kernel as the global
    ``auc_by_ranksum``.

    The bucket table is now (group x score-domain)-bounded and the
    ordered window partitions BY GROUP — so slices rank independently
    and in parallel, still never sorting corpus rows.  Groups with a
    single class emit NULL auc_micro (undefined by definition) rather
    than a fabricated 0.5."""
    buckets = df.groupBy(
        F.col(group_col).alias("grp"), F.col(score_col).alias("__s")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(label_col).cast("long")).alias("__np"),
    )
    w = Window.partitionBy("grp").orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = buckets.withColumn(
        "__cum", F.coalesce(F.sum("__n").over(w), F.lit(0))
    )
    return (
        ranked.groupBy("grp")
        .agg(
            F.sum("__np").cast("long").alias("n_pos"),
            (F.sum("__n") - F.sum("__np")).cast("long").alias("n_neg"),
            F.sum(
                F.col("__np") * (2 * F.col("__cum") + F.col("__n") + 1)
            ).alias("__two_mid"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_pos",
            "n_neg",
            F.expr(
                f"CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE "
                f"((__two_mid - n_pos * (n_pos + 1)) * {MICRO})"
                f" div (2 * n_pos * n_neg) END"
            ).alias("auc_micro"),
        )
    )
