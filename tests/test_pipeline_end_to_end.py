"""The full make-training-shards pipeline, composed from the registered
stages: source quality gate -> context-window chunking -> sequence
packing -> deterministic shard shuffle. Each stage is oracle-checked on
its own; this test pins the INTERFACES between them — token conservation
across the chain, pack-window geometry over chunk outputs, and shard
balance of the final deal — which no per-stage oracle can see."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators.packing import (
    packed_positions,
)
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

_CTX = 256


def test_make_training_shards_end_to_end(spark, oracle_sf_dir):
    docs = load_table(spark, oracle_sf_dir, "documents")

    # stage 1: keep documents from sources that clear the quality gate
    gate = registry.queries()["source_quality_filter"](
        spark, oracle_sf_dir
    )
    kept_sources = [
        r["source"] for r in gate.where(F.col("keep_source") == 1).collect()
    ]
    assert kept_sources, "gate kept nothing — fixture drift"
    gated = docs.where(F.col("source").isin(kept_sources))

    # stage 2: chunk the gated docs (reuse the registered chunker's
    # output, filtered to gated docs so stages stay composable)
    chunks = (
        registry.queries()["chunk_documents"](spark, oracle_sf_dir)
        .join(gated.select("doc_id"), "doc_id", "left_semi")
        .localCheckpoint(eager=False)
    )

    # interface pin 1: chunking covers every gated token (first chunk
    # per doc starts at 0 and strides tile the doc — total chunk tokens
    # >= doc tokens, equality modulo the fixed overlap)
    doc_tok = (
        gated.select(
            "doc_id",
            F.size(F.expr(r"split(trim(text), '\\s+')")).alias("n_tok"),
        )
        .where(F.col("n_tok") > 0)
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("chunk_tok"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    joined = doc_tok.join(per_doc, "doc_id")
    bad = joined.where(
        F.col("chunk_tok")
        != F.col("n_tok") + (F.col("n_chunks") - 1) * 8  # overlap = 32-24
    ).count()
    assert bad == 0

    # stage 3: pack chunks into fixed context windows by global prefix sum
    chunk_rows = chunks.select(
        F.concat_ws(
            ":", F.col("doc_id"), F.col("chunk_idx")
        ).alias("chunk_key"),
        F.col("n_tokens").cast("long").alias("n_tok"),
    )
    packed = packed_positions(
        chunk_rows,
        ctx=_CTX,
        id_col="chunk_key",
        tok_col="n_tok",
        num_partitions=5,
    ).localCheckpoint(eager=False)

    # interface pin 2: packing conserves tokens and never overflows a
    # window start boundary (pack_id = cum_prev div ctx by construction)
    total_chunk_tok = chunk_rows.agg(F.sum("n_tok")).collect()[0][0]
    last = packed.orderBy(F.desc("cum_prev")).limit(1).collect()[0]
    assert last["cum_prev"] + last["n_tok"] == total_chunk_tok
    assert (
        packed.where(
            F.col("pack_id") != F.expr(f"cum_prev div {_CTX}")
        ).count()
        == 0
    )

    # stage 4: deal packs across shards deterministically
    shards = packed.select(
        "pack_id",
        F.expr("pmod(conv(substring(md5(CAST(pack_id AS STRING)), 1, 4),"
               " 16, 10), 8)").cast("int").alias("shard_id"),
    ).distinct()
    counts = [
        r["n"] for r in
        shards.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(counts) == 8  # every shard populated
    # md5 deal is multinomial-uniform: with n/8 ~ 8 expected per shard,
    # bound deviations at ~4 sigma of Poisson(n/8), not a fixed ratio
    # (a 2x max/min bound false-alarms at these small counts)
    mean = sum(counts) / len(counts)
    assert max(counts) <= mean + 4 * mean**0.5, counts
    assert min(counts) >= max(mean - 4 * mean**0.5, 1), counts
