"""Sequence packing: assign documents to fixed-size training context
windows (GPT-style concat-then-chunk) via a DISTRIBUTED global prefix sum.

``packed_positions`` computes, for each document in ascending id order, the
total token count of all earlier documents (``cum_prev``), then derives
``pack_id = cum_prev div ctx`` and ``pack_offset = cum_prev mod ctx`` — the
exact placement a sequential concatenate-and-chunk packer produces,
without ever ordering the corpus through one task.

The naive formulation — ``SUM(n_tok) OVER (ORDER BY doc_id)`` with no
PARTITION BY — collapses the whole table into a single window partition:
the one-task global sort that dies first at 100 TB. This operator runs the
textbook two-phase scan instead:

1. range-partition by id (parallel range sort, the same exchange a global
   ``orderBy`` would use) and compute each partition's LOCAL running sum;
2. aggregate one row per partition (its token total), prefix-sum THAT tiny
   table (p rows — the only single-partition window, over partition
   counts, not rows), and broadcast the offsets back.

local_prev + partition_offset = the global prefix sum, bit-identical to
the naive window (integer addition is associative), which is exactly what
the DuckDB oracle computes. The materialized range partitioning is
localCheckpointed because phase 2 and the final projection both read it —
and partition ids must come from ONE materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def packed_positions(
    docs: DataFrame,
    ctx: int = 2048,
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tok, cum_prev, pack_id, pack_offset) per document, packing in
    ascending ``id_col`` order into ``ctx``-token windows.

    ``num_partitions`` pins the range-partition count (AQE coalesces tiny
    test inputs to one partition, which would leave the two-phase merge
    untested; the result is partition-count-independent either way)."""
    narrow = docs.select(id_col, tok_col)
    ranged = (
        narrow.repartitionByRange(num_partitions, F.col(id_col))
        if num_partitions
        else narrow.repartitionByRange(F.col(id_col))
    )
    ranged = ranged.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint()
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_pid = ranged.groupBy("_pid").agg(F.sum(tok_col).alias("_psum"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = per_pid.select(
        "_pid",
        F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).alias("_poff"),
    )
    return (
        ranged.withColumn(
            "_prev_local",
            F.coalesce(F.sum(tok_col).over(w_local), F.lit(0)),
        )
        .join(F.broadcast(offs), "_pid")
        .select(
            id_col,
            F.col(tok_col).cast("long").alias(tok_col),
            (F.col("_poff") + F.col("_prev_local"))
            .cast("long")
            .alias("cum_prev"),
        )
        .select(
            id_col,
            tok_col,
            "cum_prev",
            F.expr(f"cum_prev div {ctx}").alias("pack_id"),
            (F.col("cum_prev") % ctx).alias("pack_offset"),
        )
    )
