"""Streaming maintenance of the stored IVF ANN index.

The batch side (operators/similarity.ivf_append_batch) lands each new
vector batch as a committed cell-partitioned delta under the index; this
wrapper makes a Structured Streaming query the APPENDER via
``foreachBatch`` — a retried micro-batch rewrites its own
``cells_delta/batch=<id>`` directory and re-stamps its ``_COMMITTED``
marker last, exactly-once at the batch level.  Assignment is per-vector
under the FIXED stored centroids, so ANY vector-to-micro-batch
assignment leaves probe(base + deltas) exactly equal to
probe(one build over the union) — pinned by tests/test_streaming2.py —
which makes this the live-ingest path for an embedding index: new
vectors are searchable one micro-batch after they land, no rebuild, no
corpus rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mapreducemovieanalysis_cloud_spark.operators.similarity import (
    ivf_append_batch,
)


def ivf_delta_sink(
    stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """writeStream wrapper: each micro-batch of (id, embedding) rows is
    assigned to the stored centroids and committed as a delta.  The
    index must already exist (``ivf_append_batch`` fails loudly on a
    missing centroids table — appending to a half-built index is an
    error, not a quiet no-op).  Returns the started StreamingQuery;
    probe with the stored-index search path at any time."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: ivf_append_batch(
                batch.sparkSession, index_path, batch, bid,
                id_col=id_col, vec_col=vec_col,
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
