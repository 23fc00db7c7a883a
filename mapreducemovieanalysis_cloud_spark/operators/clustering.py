"""Iterative clustering over embeddings (k-means, fixed Lloyd iterations).

The iterative-algorithm pattern at scale: each iteration is
broadcast-assign (centroids are always tiny) + dim-wise aggregate (one
shuffle keyed on (cell, dim) — map-side partial averages). No driver-side
loops over data: the driver only iterates the PLAN ``iters`` times; each
iteration's centroids stay a small DataFrame.

Determinism contract (what makes this oracle-checkable, unlike textbook
k-means): points are quantized ints, distances are exact int64
``|p|² − 2·p·c + |c|²`` (argmin with cell-id tie-break — no float compare),
and updated centroids round the per-dim mean back to int64 (exact bigint
sum, one IEEE division, round-half-away — identical in any engine). Seeds
are the first k vectors by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.vector import (
    qdot_arrow,
    qnorm2,
    quantize,
)


def _assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid cell per point: exact integer squared distance,
    centroid id as tie-break. ``pts``: (vec_id, qv, pn2); ``cents``:
    (cell, cv, cn2)."""
    scored = pts.join(F.broadcast(cents)).withColumn(
        "d2",
        F.col("pn2") - 2 * qdot_arrow(F.col("qv"), F.col("cv")) + F.col("cn2"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "qv", "pn2", "cell")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid per cell: per-dimension rounded mean (exact int64 sum,
    one IEEE division), reassembled in dimension order."""
    exploded = assigned.select("cell", F.posexplode("qv").alias("pos", "v"))
    per_dim = exploded.groupBy("cell", "pos").agg(
        F.round(F.avg("v")).cast("long").alias("cv_v")
    )
    return (
        per_dim.groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv_v"))),
                lambda s: s.cv_v,
            ).alias("cv")
        )
        .withColumn("cn2", qnorm2(F.col("cv")))
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster) after ``iters`` Lloyd iterations from the first-k
    seed centroids."""
    pts = emb.select(
        F.col(id_col).alias("vec_id"), quantize(vec_col).alias("qv")
    ).withColumn("pn2", qnorm2(F.col("qv")))
    cents = (
        pts.where(F.col("vec_id") < k)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("qv").alias("cv"),
            F.col("pn2").alias("cn2"),
        )
    )
    assigned = None
    for _ in range(iters):
        assigned = _assign(pts, cents)
        cents = _update(assigned)
    return assigned.select("vec_id", F.col("cell").alias("cluster"))


def label_propagation_components(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Connected components by min-label propagation, ``iters`` fixed
    rounds: label(v) <- min(label(v), min over neighbors label(u)).

    The dedup-cluster closure: near-dup PAIRS become groups so one survivor
    can be chosen per component (min doc_id). Fixed iteration count keeps
    the result a pure function of the input (oracle-checkable); components
    with diameter > iters keep distinct labels — at scale, alternate with
    large-star/small-star rounds or iterate until a convergence check on a
    count aggregate, which stays deterministic because labels are mins.

    Each round is one shuffle (join on the edge key) + one aggregate —
    no driver-side graph state. ``edges``: (src, dst) undirected pairs.
    """
    # Every round re-reads the edge list: persist it once instead of
    # re-deriving its (possibly expensive — LSH candidate generation)
    # lineage per iteration. At cluster scale this is a checkpoint to
    # storage rather than executor memory.
    sym = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .union(edges.select(F.col("dst").alias("v"), F.col("src").alias("u")))
        .cache()
    )
    labels = nodes.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("lbl")
    )
    for _ in range(iters):
        neighbor_min = (
            sym.join(
                labels.select(
                    F.col("v").alias("u"), F.col("lbl").alias("u_lbl")
                ),
                "u",
            )
            .groupBy("v")
            .agg(F.min("u_lbl").alias("n_lbl"))
        )
        labels = (
            labels.join(neighbor_min, "v", "left")
            .select(
                "v",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("n_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
    return labels.select(
        F.col("v").alias(id_col), F.col("lbl").alias("component")
    )
