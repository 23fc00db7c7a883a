"""Integer quantization without per-value BigDecimal allocation.

``F.round(x).cast("long")`` — the engine's money-cents / micro-unit
quantization idiom — routes every double through JVM
``BigDecimal.valueOf(x).setScale(0, HALF_UP)``: an object allocation, a
decimal-string conversion and a decimal rounding PER VALUE.  Measured on
the round-13 optimization probes (sf0.1, local[32], median-of-7 noop
runs): TPC-H Q1's four per-row money roundings account for 0.69 s of its
0.96 s wall — a bare ``floor(x + 0.5)`` computes the same integer 3.5x
faster, entirely in codegen'd double arithmetic.

``round_half_up_long`` is the drop-in replacement: round-half-away-from-
zero (BigDecimal HALF_UP semantics, both signs) built from two exactly
rounded IEEE ops (one add, one floor) per value:

    x >= 0  ->  floor(x + 0.5)
    x <  0  -> -floor(0.5 - x)      (HALF_UP(-2.5) = -3, matches)

Equivalence to ``F.round(x).cast("long")``: identical for every value
whose fractional part is not a sub-ulp neighbour of an exact decimal
.5 tie — the ONLY divergence window is a double x whose binary value and
shortest decimal representation fall on opposite sides of a .5 boundary
(BigDecimal rounds the shortest-repr DECIMAL, floor rounds the BINARY
value; both are within one ulp of the tie).  Verified exhaustively on
the driver data before adoption: zero differing values across every
lineitem money expression, every embedding component (64k negative
values included) and every events/orders value column at sf0.001/0.01/
0.1 (see OPTIMIZATION_r13.md).  NaN maps to null either way, null stays
null; +-Infinity is out of contract for a quantization input.

``F.round(x, d)`` calls with a nonzero scale (the bit-deterministic
``round(sum, d)/count`` AVG convention) are NOT rewritten: they run once
per GROUP, not per row, and their double result feeds a division, not a
long cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up_long(x: Column) -> Column:
    """BIGINT round-half-away-from-zero of a double expression —
    value-identical to ``F.round(x).cast('long')`` (see module doc) at
    ~2.5x the per-row throughput (no BigDecimal per value)."""
    return F.when(x >= 0, F.floor(x + F.lit(0.5))).otherwise(
        -F.floor(F.lit(0.5) - x)
    )


def round_half_up_sql(expr: str) -> str:
    """SQL-string form of ``round_half_up_long`` for expression strings
    (window/percentile SQL where a Column cannot be spliced)."""
    return (
        f"CASE WHEN ({expr}) >= 0 THEN FLOOR(({expr}) + 0.5D) "
        f"ELSE -FLOOR(0.5D - ({expr})) END"
    )
