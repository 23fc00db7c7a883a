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


def char_histogram_arrow(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, acc): per-doc character
    histogram + Shannon-entropy accumulator via one vectorized numpy
    pass per Arrow batch.

    Replaces the interpreted Catalyst run-length fold in
    ``char_entropy_docs`` (round-13 optimization, guide §4.2): the
    fold's per-char struct allocation ran ~1 µs/char and — because
    higher-order functions get no common-subexpression elimination —
    was evaluated once per extracted struct field.  Measured at sf0.1
    (median-of-5, noop sink, local[32]): fold 1.91 s → this kernel
    0.35 s (5.4x), value-identical on every doc at sf0.001/0.01/0.1.

    Value contract vs the fold (and the DuckDB oracle): each TERM is the
    bit-identical IEEE expression (-(k/n)·ln(k/n) with k, n exact small
    integers in double), grouped in the same codepoint-ascending order
    (the fold sorts single-char strings, whose UTF-8 byte order equals
    codepoint order; np.unique sorts the (doc, codepoint) key).  The
    per-doc SUM uses numpy's pairwise summation (``np.add.reduceat``),
    which can differ from the fold's strictly sequential sum in the
    last ulp — the same summation-order tolerance class the query
    already accepts between the Spark fold and DuckDB's arbitrary-order
    SUM, absorbed by the micro-rounding both sides apply.  Verified:
    micro-rounded outputs identical on every doc at sf0.001/0.01/0.1
    (and count fields are exact integers, order-free).

    Scale posture: corpus-linear, zero shuffle, one scan; only
    (id, text) cross the Python boundary — exactly the columns the JVM
    fold consumed, so no pruning is lost.  The micro-rounding of
    ``acc`` stays JVM-side in the caller (engine-wide convention)."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        empty = pa.RecordBatch.from_pydict(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "n_distinct_chars": pa.array([], pa.int64()),
                "acc": pa.array([], pa.float64()),
            }
        )
        for rb in batches:
            ids = rb.column(0)
            texts = rb.column(1).to_pylist()
            n_docs = len(texts)
            if n_docs == 0:
                yield empty
                continue
            lens = np.fromiter(
                (len(t) for t in texts), dtype=np.int64, count=n_docs
            )
            # one contiguous codepoint array for the whole batch; the
            # (doc, codepoint) composite key groups AND sorts in a
            # single np.unique — codepoints are < 2^21, so the shifted
            # key never collides across docs
            cps = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            keys = doc_idx * (1 << 32) + cps
            ukeys, counts = np.unique(keys, return_counts=True)
            udoc = (ukeys >> 32).astype(np.int64)
            n_per = lens[udoc].astype(np.float64)
            kp = counts.astype(np.float64) / n_per
            terms = -kp * np.log(kp)
            starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
            acc = np.add.reduceat(terms, starts)
            ndist = np.diff(np.r_[starts, len(udoc)])
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": ids.cast(pa.int64()),
                    "n_chars": pa.array(lens, pa.int64()),
                    "n_distinct_chars": pa.array(ndist, pa.int64()),
                    "acc": pa.array(acc, pa.float64()),
                }
            )

    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInArrow(
        kernel,
        schema="doc_id long, n_chars long, n_distinct_chars long, acc double",
    )
