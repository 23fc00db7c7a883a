"""Cross-corpus overlap estimation via bottom-k shingle sketches.

The question a curation run asks before mixing sources: how much do
source A and source B duplicate EACH OTHER?  (Per-source dedup rates —
operators/dedup.py — measure internal duplication; this measures the
cross terms that decide whether mixing weights double-count content.)

Method: the classical bottom-k (KMV) Jaccard estimator.  For each
source, keep the k lexicographically-smallest ``md5(shingle)`` values
over its DISTINCT n-gram shingles.  For a pair (A, B), the k smallest
distinct hashes of the sketch union are a uniform sample of A ∪ B, and

    Jaccard(A, B)  ≈  |BK(A ∪ B) ∩ BK(A) ∩ BK(B)| / |BK(A ∪ B)|

Everything is integer/string arithmetic on md5 hex strings (ASCII
lexicographic order is identical in every engine), so the estimate is
EXACTLY reproducible — the DuckDB oracle computes the same integers,
no floating point anywhere.

Scale posture (100 TB): the corpus is touched once by the
(source, shingle) distinct — the same shuffle as any shingling pass
(``dedup.shingle_sets``, which tokenizes in its own projection so the
split is not re-evaluated inside the shingle lambda).  Bottom-k is
two-phase so no per-source global sort ever happens: phase one takes a
local top-k per (source, hash-bucket) window — each partition holds
~1/n_prefilter_buckets of a source's shingles — and phase two re-ranks
the surviving n_prefilter_buckets * k rows per source.  Pair
enumeration is equi-join-driven, NOT a cross join: only pairs sharing
at least one sketch hash are emitted (a pair with zero sketch overlap
has estimate 0 and is absent — at 10k+ sources this is what keeps the
output near-linear instead of sources², and the plan-hygiene gate
CartesianProduct-free).  Everything after the sketch is sketch-sized:
k rows per source, kilobytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.hashing import md5_bucket


def bottomk_sketches(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    n_prefilter_buckets: int = 32,
) -> DataFrame:
    """(grp, h) bottom-k sketch rows: the k smallest md5 hex values over
    the group's distinct n-gram shingles."""
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        shingle_sets,
    )

    sh = (
        shingle_sets(docs, n=n, id_col=group_col, text_col=text_col)
        .select(F.col(group_col).alias("grp"), F.md5("shingle").alias("h"))
        .distinct()
    )
    local = Window.partitionBy(
        "grp", md5_bucket("h", n_prefilter_buckets, salt="bk:")
    ).orderBy("h")
    per_grp = Window.partitionBy("grp").orderBy("h")
    return (
        sh.withColumn("_r", F.row_number().over(local))
        .where(F.col("_r") <= k)
        .withColumn("_r", F.row_number().over(per_grp))
        .where(F.col("_r") <= k)
        .select("grp", "h")
    )


def pairwise_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    sketches: DataFrame | None = None,
) -> DataFrame:
    """Bottom-k Jaccard estimate for every unordered group pair sharing
    at least one sketch hash.

    Returns (source_a, source_b, n_union_used, n_both,
    jaccard_est_micro) with source_a < source_b; ``n_union_used`` is
    ``min(k, |sketch union|)`` — the estimator's denominator — and
    ``jaccard_est_micro = n_both * 1e6 // n_union_used``.  Pairs with
    no shared sketch hash are ABSENT (their estimate is 0); a pair can
    appear with ``n_both = 0`` when its shared hashes rank below the
    union's bottom-k cut.

    Pass ``sketches`` — a (grp, h) frame shaped like
    ``bottomk_sketches`` output, e.g. the merged incremental store —
    to skip sketch construction entirely (``docs``/``text_col``/``n``
    are then unused).
    """
    sk = (
        sketches
        if sketches is not None
        else bottomk_sketches(docs, group_col, text_col, n=n, k=k)
    )
    sk = sk.localCheckpoint()

    cand = (
        sk.alias("x")
        .join(sk.alias("y"), "h")
        .where(F.col("x.grp") < F.col("y.grp"))
        .select(
            F.col("x.grp").alias("source_a"),
            F.col("y.grp").alias("source_b"),
        )
        .distinct()
    )
    merged = (
        cand.join(sk, cand.source_a == sk.grp)
        .select("source_a", "source_b", "h", F.lit(1).alias("in_a"))
        .unionByName(
            cand.join(sk, cand.source_b == sk.grp).select(
                "source_a", "source_b", "h", F.lit(0).alias("in_a")
            )
        )
        .groupBy("source_a", "source_b", "h")
        .agg(
            F.max("in_a").alias("in_a"),
            F.max(1 - F.col("in_a")).alias("in_b"),
        )
    )
    ranked = merged.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("source_a", "source_b").orderBy("h")
        ),
    ).where(F.col("_r") <= k)
    return (
        ranked.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_union_used"),
            F.sum(F.col("in_a") * F.col("in_b"))
            .cast("long")
            .alias("n_both"),
        )
        .select(
            "source_a",
            "source_b",
            "n_union_used",
            "n_both",
            F.expr(
                "CAST(n_both * 1000000 div n_union_used AS BIGINT)"
            ).alias("jaccard_est_micro"),
        )
    )


# Behavior version of the incremental KMV store (shingle n, hash, k
# semantics, epoch layout) — the ngram_lm INCREMENTAL_STORE_VERSION
# rule: cache keys addressing a persistent store built by
# incremental_kmv_append MUST include this constant.
KMV_STORE_VERSION = "kmv1"


def incremental_kmv_append(
    batch_docs: DataFrame,
    store: str,
    batch_id: int | str,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
) -> None:
    """Append one batch's bottom-k sketches to a persistent KMV store
    at O(batch) cost: ``<store>/sketch/batch=<id>`` via the shared
    idempotent epoch write.  Bottom-k merges by union-then-re-rank —
    BK(A ∪ B) = BK(BK(A) ∪ BK(B)) — which is associative AND
    idempotent, so row-level batch splits are safe (a shingle seen in
    two batches lands in both batch sketches and dedups at merge) and
    the merged sketch equals the full-corpus sketch exactly.  Stored
    rows are <= |groups-in-batch| x k hashes — never shingles."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        write_epoch,
    )

    write_epoch(
        bottomk_sketches(batch_docs, group_col, text_col, n=n, k=k),
        f"{store}/sketch",
        batch_id,
    )


def incremental_kmv_sketches(
    spark, store: str, k: int = 64
) -> DataFrame:
    """The merged (grp, h) bottom-k sketches over every committed batch
    in ``store`` — EXACTLY the full-corpus ``bottomk_sketches`` output
    (union, DISTINCT on (grp, h) — the same hash in two batches must
    count once — then one per-group bottom-k re-rank; pinned by the
    batch-split-invariance test).  Feed to ``pairwise_overlap(...,
    sketches=...)``."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        read_epochs,
    )

    merged = (
        read_epochs(spark, f"{store}/sketch")
        .select("grp", "h")
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return (
        merged.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select("grp", "h")
    )
