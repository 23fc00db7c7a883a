"""mapInArrow batch operators — the lowest-overhead Python escape hatch.

Where pandas_udf pays a pyarrow→pandas→pyarrow conversion per batch,
``mapInArrow`` hands the raw Arrow RecordBatch to Python and takes one
back: zero-copy into numpy for numeric kernels. This is the right tier
for dense-vector math over millions of embeddings when an expression
can't be stated in ``pyspark.sql.functions`` — still Arrow-batched,
still pipelined per partition, no driver involvement.

Determinism: quantization stays JVM-side (``functions.vector.quantize``,
the engine-wide convention), so Python only does integer multiplies/adds
plus one IEEE sqrt — correctly rounded per IEEE-754, bit-identical in
numpy, the JVM, and DuckDB. sqrt of an integer can never land exactly on
.5 (x = (k+0.5)² is never an integer), so the final round is
half-mode-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.vector import quantize


def embedding_norms_arrow(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, l2_micro): quantized L2 norm per embedding, computed by a
    numpy kernel over raw Arrow batches (list<int64> values + offsets →
    one reduceat — no per-row Python, no pandas materialization)."""

    def norms(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            ids = rb.column(0)
            qv = rb.column(1)
            values = qv.values.to_numpy(zero_copy_only=False)
            offsets = qv.offsets.to_numpy(zero_copy_only=False)
            sq = values * values
            # row sums via prefix sums: robust to empty rows, empty
            # batches, and sliced arrays (offsets need not start at 0),
            # where reduceat faults on boundary offsets. int64-exact up
            # to ~9e18 total per batch (10k rows x 64 dims x 1e12 per
            # term is 6.4e17 — 14x headroom).
            csum = np.concatenate(([0], np.cumsum(sq)))
            sumsq = csum[offsets[1:]] - csum[offsets[:-1]]
            l2 = np.floor(np.sqrt(sumsq.astype(np.float64)) + 0.5).astype(
                np.int64
            )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(l2, type=pa.int64())],
                names=["vec_id", "l2_micro"],
            )

    qdf = emb.select(
        F.col(id_col).alias("vec_id"), quantize(vec_col).alias("qv")
    )
    return qdf.mapInArrow(norms, schema="vec_id long, l2_micro long")
