"""Distributed PCA over an embedding column: Gram-matrix aggregation,
driver-side eigendecomposition, broadcast projection.

The scalable decomposition is the classic one for tall-skinny X (n rows,
d dims, n >> d):

1. ONE corpus pass computes G = X^T X and the column-sum vector — each
   Arrow batch contributes a d x d partial via a single int64 matmul
   (``mapInPandas``), and only the d(d+1)/2 upper-triangle cells are
   shuffled per batch.  For d = 64 that is 2 080 tiny rows per batch —
   the shuffle is microscopic regardless of corpus size.
2. The d x d covariance eigendecomposition runs on the DRIVER — O(d^3)
   on a matrix that fits in L2 cache; distributing it would be pure
   overhead below d ~ 10^4.
3. Projection broadcasts the (d x k) component matrix back and is a
   map-only batch matmul — no shuffle at all.

Exactness: components are quantized to integer micro-units BEFORE any
multiplication, so the Gram sums are exact int64 arithmetic — bit-identical
in any engine and any partition order (float dot-product partials would
hash-differ from a serial oracle by summation order).  Magnitude bound:
|q| <= S * max|x|, so a cell sum is <= n * (S * max|x|)^2; with S = 10^3
(milli) that stays inside int64 up to n ~ 10^12 rows for unit-scale
embeddings — pick ``scale`` accordingly at larger n (documented knob, not
a silent cap).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCHEMA = "i INT, j INT, g_q LONG"


def quantized(df: DataFrame, vec_col: str, scale: int) -> DataFrame:
    """Vector column -> int64 micro/milli-unit arrays (column ``q``).

    The component is widened to DOUBLE before multiplying: Spark's numeric
    precedence resolves FLOAT * INT in float32, whose 7 significant digits
    round differently from the float64 product other engines compute.
    float32 -> float64 is exact, so after the cast every engine rounds the
    identical IEEE-754 value."""
    return df.select(
        F.expr(
            f"transform({vec_col},"
            f" x -> CAST(ROUND(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("q")
    )


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", scale: int = 1_000_000
) -> DataFrame:
    """Upper-triangle Gram matrix of the quantized vectors:
    (i, j, g_q) with 1-based i <= j and g_q = sum(q_i * q_j), exact int64.

    Plan: scan -> mapInPandas partial matmul (d(d+1)/2 rows per batch) ->
    one tiny groupBy(i, j) sum.  The corpus never shuffles — only the
    per-batch triangle cells do.
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.array(pdf["q"].tolist(), dtype=np.int64)
            g = arr.T @ arr
            iu = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype("int32"),
                    "j": (iu[1] + 1).astype("int32"),
                    "g_q": g[iu],
                }
            )

    return (
        quantized(df, vec_col, scale)
        .mapInPandas(partials, schema=GRAM_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("g_q").alias("g_q"))
    )


def column_sums(
    df: DataFrame, vec_col: str = "embedding", scale: int = 1_000_000
) -> DataFrame:
    """(i, s_q, n) exact int64 column sums of the quantized vectors —
    the mean side of the covariance, same quantization as the Gram."""
    q = quantized(df, vec_col, scale)
    return (
        q.select(F.posexplode("q").alias("i0", "qx"))
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(
            F.sum("qx").alias("s_q"), F.count(F.lit(1)).alias("n")
        )
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    scale: int = 1_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit top-k principal components; returns (components (d, k), mean (d,)).

    Collects only the d(d+1)/2 Gram cells and d column sums (driver-size
    data for any corpus), de-quantizes, forms the covariance
    C = (G - n mu mu^T) / (n - 1), and eigendecomposes with numpy.
    Component sign is canonicalized (largest-|coordinate| entry positive)
    so the fit is deterministic.
    """
    gram_rows = gram_matrix(df, vec_col, scale).collect()
    sum_rows = column_sums(df, vec_col, scale).collect()
    d = max(r["i"] for r in sum_rows)
    n = sum_rows[0]["n"]
    s = np.zeros(d)
    for r in sum_rows:
        s[r["i"] - 1] = r["s_q"] / scale
    g = np.zeros((d, d))
    for r in gram_rows:
        g[r["i"] - 1, r["j"] - 1] = r["g_q"] / (scale * scale)
        g[r["j"] - 1, r["i"] - 1] = g[r["i"] - 1, r["j"] - 1]
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order]
    for c in range(comp.shape[1]):
        pivot = np.argmax(np.abs(comp[:, c]))
        if comp[pivot, c] < 0:
            comp[:, c] = -comp[:, c]
    return comp, mu


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only projection onto the fitted components:
    (id, proj ARRAY<DOUBLE> length k).  The (d x k) component matrix and
    mean ride inside the serialized closure — the Arrow-batch analogue of
    a broadcast join against a scalar dimension; no shuffle."""
    comp = np.ascontiguousarray(components, dtype=np.float64)
    mu = np.ascontiguousarray(mean, dtype=np.float64)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.array(pdf[vec_col].tolist(), dtype=np.float64) - mu
            proj = arr @ comp
            yield pd.DataFrame(
                {id_col: pdf[id_col], "proj": list(proj)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"{id_col} LONG, proj ARRAY<DOUBLE>"
    )
