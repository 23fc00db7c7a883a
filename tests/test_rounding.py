"""Pins for functions/rounding.round_half_up_long — the round-13
optimization replaced the engine's per-row ``F.round(x).cast('long')``
quantization idiom (BigDecimal per value) with a two-IEEE-op equivalent.
These tests pin value-equivalence so a Spark upgrade or a helper edit
that drifts from BigDecimal HALF_UP semantics fails red, not in a
driver hash mismatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
    round_half_up_sql,
)

# Exact decimal ties both signs, near-ties at double precision, zeros,
# nulls, and magnitudes up to the exact-integer double range: every
# class where HALF_UP and floor(x+0.5) could conceivably diverge.
_GRID = [
    0.0,
    -0.0,
    0.5,
    -0.5,
    1.5,
    -1.5,
    2.5,
    -2.5,
    2.4999999999999996,
    -2.4999999999999996,
    2.5000000000000004,
    -2.5000000000000004,
    1916.999999999999998,
    -1916.999999999999998,
    123456789.455,
    -123456789.455,
    1e15 + 0.5,
    -(1e15 + 0.5),
    None,
]


def test_grid_matches_bigdecimal_round(spark):
    df = spark.createDataFrame([(x,) for x in _GRID], "x double")
    out = df.select(
        F.round(F.col("x")).cast("long").alias("old"),
        round_half_up_long(F.col("x")).alias("new"),
        F.expr(round_half_up_sql("x")).cast("long").alias("new_sql"),
    ).collect()
    for row in out:
        assert row["old"] == row["new"], row
        assert row["old"] == row["new_sql"], row


def test_documented_divergence_window_is_sub_ulp(spark):
    """The ONLY divergence class (functions/rounding.py module doc):
    a double one ulp below an exact .5 tie, where x + 0.5 rounds UP to
    the next integer in IEEE while BigDecimal rounds the shortest-repr
    decimal DOWN.  Pin that the window is exactly this — a sub-ulp
    neighbour of a tie, off by exactly 1 — so a helper edit that
    widens it fails here."""
    x = 0.49999999999999994  # 0.5 - 2^-54: x + 0.5 -> 1.0 (round-to-even)
    df = spark.createDataFrame([(x,), (-x,)], "x double")
    rows = df.select(
        F.col("x"),
        F.round(F.col("x")).cast("long").alias("old"),
        round_half_up_long(F.col("x")).alias("new"),
    ).collect()
    for r in rows:
        assert abs(r["old"] - r["new"]) == 1, r
        assert abs(abs(r["x"]) - 0.5) < 1e-15, r


def test_driver_money_columns_identical(spark, sf_dir):
    """Column-level equivalence on the real driver data: every lineitem
    money expression the TPC-H queries quantize, plus the (half
    negative) embedding components the vector quantizer rounds."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    exprs = [F.col("l_quantity"), F.col("l_extendedprice"), disc, charge]
    cond = None
    for e in exprs:
        x = e * 100
        c = F.round(x).cast("long") != round_half_up_long(x)
        cond = c if cond is None else (cond | c)
    assert li.where(cond).count() == 0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    el = emb.select(F.explode("embedding").alias("v")).select(
        (F.col("v").cast("double") * 1_000_000).alias("x")
    )
    assert el.where(F.col("x") < 0).count() > 0, "fixture must cover sign"
    assert (
        el.where(
            F.round(F.col("x")).cast("long")
            != round_half_up_long(F.col("x"))
        ).count()
        == 0
    )


def test_output_type_is_long(spark):
    df = spark.range(1).select(
        round_half_up_long(F.lit(1.25) * 100).alias("v")
    )
    assert dict(df.dtypes)["v"] == "bigint"
    assert df.collect()[0]["v"] == 125
