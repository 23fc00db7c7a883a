"""Aggregation surface: grouped/cube/rollup/grouping-sets, approx aggregates,
deterministic float averages.

The reference has two hand-rolled aggregates (COUNT at ``MovieRank.java:99-115``,
COUNT+SUM+AVG at ``MovieRating.java:81-105``), both one-pass streaming folds —
exactly Spark's partial/final HashAggregate, which applies automatically to
everything here (the reference's disabled combiner, ``MovieRank.java:80-95``,
is always-on map-side partial aggregation in Spark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)


def exact_avg(measure: str, decimals: int = 2) -> Column:
    """Cross-engine bit-deterministic average: ``round(sum, decimals)/count``.

    Plain AVG over doubles differs in the final ulp per summation order (and
    between engines), which flips value-hash comparisons. When the measure has
    at most ``decimals`` decimal digits, the rounded sum is exact, and IEEE
    division of identical operands is exactly rounded — so the result is
    bit-identical in any engine, any plan, any partitioning.
    """
    return F.round(F.sum(measure), decimals) / F.count(F.lit(1))


def grouped(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """groupBy().agg() with aliased outputs (hash-agg, partial+final)."""
    return df.groupBy(*keys).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


def cube_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """CUBE: aggregate over every subset of ``keys`` (2^k grouping sets).
    Spark expands grouping sets inside a single shuffle via Expand."""
    return df.cube(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def rollup_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """ROLLUP: hierarchical prefixes of ``keys``."""
    return df.rollup(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, alias: str = "approx_nd", rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog++ distinct-count estimate. At 100 TB this is the only sane
    COUNT(DISTINCT) — fixed-size sketch per group, no second shuffle of raw
    values. (HLL++ sparse mode is exact for small cardinalities, which the
    oracle check exploits.)"""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias(alias)
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 64,
    k: int = 10,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Heavy hitters via an explicit count-min sketch, exact-oracle-able.

    Builds the d×w CMS as a DataFrame (depth rows of md5-derived buckets,
    one partial-aggregated count per cell — the sketch is depth·width
    cells TOTAL, independent of input size), then estimates each probed
    key's frequency as the min over its depth cells and returns the top-k
    by estimate with the true count alongside.

    The sketch BUILD is the scale win: the raw stream aggregates into
    d·w ≈ 200 cells with map-side combine, so that shuffle carries cells,
    not keys. The PROBE side is as big as the key set you probe: pass
    ``candidates`` (a DataFrame with ``key_col`` — e.g. last window's
    hitters, a sampled key set, or a per-partition top-m pre-pass) to keep
    the probe and its exact-count join proportional to the candidate set.
    With ``candidates=None`` every distinct key is probed via a full
    groupBy — fine for tests and bounded domains, NOT the billion-key
    path. The estimate is a provable overestimate (est ≥ true). Hash =
    leading 16 bits of md5(i:key) mod width, bit-identical in any engine.
    """
    from mapreducemovieanalysis_cloud_spark.functions.hashing import (
        md5_bucket,
    )

    def bucket(i: int):
        return md5_bucket(key_col, width, salt=f"{i}:")

    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"), bucket(i).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.row_idx", "cell.bucket")
    cms = rows.groupBy("row_idx", "bucket").agg(
        F.count(F.lit(1)).alias("cell_count")
    )

    probe_src = (
        df.join(F.broadcast(candidates.select(key_col).distinct()), key_col)
        if candidates is not None
        else df
    )
    keys = probe_src.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    probes = keys.select(
        key_col,
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"), bucket(i).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "true_count", "cell.row_idx", "cell.bucket")
    est = (
        probes.join(F.broadcast(cms), ["row_idx", "bucket"])
        .groupBy(key_col, "true_count")
        .agg(F.min("cell_count").alias("est_count"))
    )
    return est.orderBy(
        F.desc("est_count"), F.asc(key_col)
    ).limit(k)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile: per-column null count, EXACT distinct count,
    and min/max (stringified) — one union branch per column, each branch
    a column-pruned scan into a value-keyed partial aggregate.

    The validation sweep that gates every ingest batch. Why N pruned
    scans instead of one wide scan: N exact COUNT(DISTINCT) in a single
    aggregate is planner-rewritten through an Expand that replicates
    EVERY input row once per profiled column and shuffles the amplified
    stream full-width. The branch shape reads each column alone (parquet
    column pruning makes the N scans cost about one full-width scan in
    total I/O), collapses to its distinct-value table map-side, and
    derives all five metrics from that table's one-row rollup — shuffle
    volume is Σ per-column distinct values, independent of row count.
    min/max stringify so the output schema is column-type-agnostic;
    restrict to integer/string columns when an engine-exact oracle
    matters (float formatting differs across engines).

    ``profile_columns_approx`` remains the 100 TB measurement tier: ONE
    scan, no per-value shuffle at all (fixed-size HLL sketches), ±rsd on
    the distinct counts.
    """
    out = None
    for c in cols:
        vt = (
            df.select(F.col(c).alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).alias("__k"))
        )
        branch = vt.agg(
            # coalesce: sum over the EMPTY value table is NULL, not 0,
            # and an empty ingest batch is exactly a state this gate
            # must report — a NULL n_rows falls out of any threshold
            # comparison silently (r06 advisor)
            F.coalesce(F.sum("__k"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("__v").isNull(), F.col("__k"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_nulls"),
            # the value table has one row per distinct value (plus at
            # most one null row); count(__v) skips the null row, exactly
            # COUNT(DISTINCT c) semantics
            F.count("__v").cast("long").alias("n_distinct"),
            F.min("__v").cast("string").alias("min_value"),
            F.max("__v").cast("string").alias("max_value"),
        ).select(
            F.lit(c).alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
        )
        out = branch if out is None else out.unionAll(branch)
    return out


def int_histogram(
    df: DataFrame,
    cents_col: Column,
    bucket_width_cents: int,
) -> DataFrame:
    """Fixed-width histogram over an integer-cents measure: one row per
    occupied bucket with its inclusive lower bound, row count, and exact
    cents sum.

    Entirely integer arithmetic (`div`, never float division + floor, whose
    double rounding can misplace exact-boundary values), so the bucket
    assignment is bit-identical in any engine. One scan, one shuffle on the
    small bucket-id key with map-side partials — the classic
    aggregation-tree histogram, O(buckets) output at any input scale.
    """
    bucketed = df.select(
        cents_col.alias("__cents")
    ).select(
        F.expr(f"__cents div {bucket_width_cents}").alias("bucket"),
        F.col("__cents"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__cents").alias("sum_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket") * bucket_width_cents).alias("bucket_lo_cents"),
            "n_rows",
            "sum_cents",
        )
    )


def integer_z_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cents_col: Column,
    z_num: int = 2,
    z_den: int = 1,
) -> DataFrame:
    """Rows whose value deviates from their group mean by more than
    (z_num/z_den) group standard deviations — decided ENTIRELY in integer
    arithmetic, so the gate is bit-identical in any engine.

    |x - mean| > z*sigma is equivalent (after multiplying through by
    n^2 * z_den^2, all positive) to

        z_den^2 * (n*x - sum)^2  >  z_num^2 * (n*sumsq - sum^2)

    — every term an int64 product of exact cents sums. No sqrt, no float
    variance, no summation-order sensitivity. One aggregate pass builds the
    per-group (n, sum, sumsq) triple (tiny — one row per group, broadcast
    back), one scan applies the gate.

    Domain bound (int64): requires n * max|cents| < ~3e9 per group
    (the squared term must stay below 2^63). At larger scales compute the
    same triple per sub-partition and combine exactly — the triple is
    associative — or lift the products to DecimalType(38).
    """
    stats = (
        df.select(F.col(group_col), cents_col.alias("__x"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__x").alias("__s"),
            F.sum(F.col("__x") * F.col("__x")).alias("__q"),
        )
    )
    dev = F.col("__n") * F.col("__x") - F.col("__s")
    var_n2 = F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
    return (
        df.select(F.col(id_col), F.col(group_col), cents_col.alias("__x"))
        .join(F.broadcast(stats), group_col)
        .where(
            F.lit(z_den * z_den) * dev * dev > F.lit(z_num * z_num) * var_n2
        )
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("__x").alias("value_cents"),
        )
    )


def equidepth_histogram(
    df: DataFrame,
    cents_col: Column,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram WITHOUT a global sort:
    one distributed exact-percentile aggregate computes the n-1 interior
    boundaries, which broadcast back as an array literal; bucket
    membership is then a map-side count of boundaries <= x. Output per
    bucket: row count, min/max cents, exact cents sum.

    The ntile() formulation needs a single-partition total order — a
    non-starter at 100 TB. This shape is two scans and one tiny exchange.
    Boundaries are DISCRETE quantiles (actual data values) from the
    Greenwald-Khanna sketch at accuracy 1e6 — exact at test sizes and
    mirror of DuckDB's quantile_disc (parity pinned by
    percentile_approx_disc) — so membership comparisons are pure integer
    <=, with no interpolated-float boundary whose last ulp could differ
    between engines. Ties at a boundary go to the lower bucket in both.
    At 100 TB the sketch accuracy bounds memory per group; no sort ever
    happens.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    vals = df.select(cents_col.alias("__x"))
    bnds = vals.agg(
        F.percentile_approx("__x", probs, 1000000).alias("__bnds")
    )
    bucketed = vals.crossJoin(F.broadcast(bnds)).select(
        "__x",
        F.size(
            F.filter("__bnds", lambda b: b <= F.col("__x"))
        ).cast("long").alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("min_cents"),
            F.max("__x").alias("max_cents"),
            F.sum("__x").alias("sum_cents"),
        )
    )


def grouped_linreg(
    df: DataFrame,
    group_col: str,
    x_col: Column,
    y_cents_col: Column,
) -> DataFrame:
    """Per-group least-squares trend from exact integer moments:

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
        intercept = (Sy - slope*Sx) / n

    The five moments (n, Sx, Sy, Sxx, Sxy) are int64 sums — one map-side-
    combined aggregate, order-independent, engine-exact; the slope is a
    single IEEE division of two int64s and the intercept two more float
    ops with fixed shape, so both quantize reproducibly to micro-units.
    Groups with < 2 points or zero x-variance are dropped (undefined
    trend). Int64 domain: n*|x|*|y| and n*x^2 must stay < 2^63 — center x
    upstream (e.g. hours since the group's epoch) to keep moments small.

    This is regr_slope/regr_intercept with a determinism contract: built
    from explicit integer sums, never a float accumulator.
    """
    m = (
        df.select(
            F.col(group_col),
            x_col.cast("long").alias("__x"),
            y_cents_col.cast("long").alias("__y"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("sx"),
            F.sum("__y").alias("sy"),
            F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
            F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        )
    )
    var_num = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    slope = (m["n"] * m["sxy"] - m["sx"] * m["sy"]) / var_num
    intercept = (m["sy"] - slope * m["sx"]) / m["n"]
    return (
        m.where((F.col("n") >= 2) & (var_num > 0))
        .select(
            F.col(group_col),
            F.col("n"),
            F.round(slope * F.lit(1000000.0)).cast("long").alias(
                "slope_micro"
            ),
            F.round(intercept).cast("long").alias("intercept_cents"),
        )
    )


def profile_columns_approx(
    df: DataFrame, cols: list[str], rsd: float = 0.05
) -> DataFrame:
    """The 100 TB tier of ``profile_columns``: identical output shape,
    but distinct counts come from HyperLogLog sketches
    (``approx_count_distinct``, relative error ``rsd``).

    Why it exists: even the exact tier's union shape must shuffle one
    row per distinct value per column — fine for enum-ish columns,
    corpus-sized for near-unique keys. HLL sketches aggregate map-side
    (one fixed-size sketch per column per partition in a SINGLE scan, no
    per-value shuffle at all) and merge associatively, so profile cost
    is independent of both row count and value cardinality. The exact
    variant stays the CONTRACT surface (oracle-checked); this is the
    measurement surface for data where ±rsd on distinct counts is
    immaterial — pinned within tolerance of the exact profile in tests.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def ols_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    unit: int = 1_000_000,
) -> DataFrame:
    """Grouped simple-OLS fit y = a + b*x from exact integer sums: one
    aggregate computes (n, Σx, Σy, Σxy, Σx², Σy²) per group map-side,
    then the closed forms

        b  = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        a  = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
        r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    evaluate in double on the group row and round to ``unit`` fixed-point
    (micro by default).  Groups with zero x-variance (or zero y-variance
    for r²) emit NULL, never a fabricated 0.

    Cross-engine exactness contract (same as the correlation matrix):
    x and y must already be int64-quantized so every sum is exact int64
    whose double image stays below 2^53 at the test scale; both engines
    then run the IDENTICAL scalar double expression on identical
    operands.  At 10¹²-row scale switch the sums to DECIMAL(38) — same
    shape, same closed forms.

    Scale: ONE partial/final HashAggregate over (group) — no Expand, no
    second pass, no per-group sort; output is group-cardinality rows
    with 6 int64s each, broadcastable downstream.
    """
    x, y = F.col(x_col), F.col(y_col)
    s = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    dd = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    dy = (
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    cov = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return s.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.expr(
            f"CAST(CASE WHEN {dd} = 0 THEN NULL ELSE"
            f" ROUND({cov} / {dd} * {unit}) END AS BIGINT)"
        ).alias("slope_micro"),
        F.expr(
            f"CAST(CASE WHEN {dd} = 0 THEN NULL ELSE"
            f" ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)"
            f"        - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))"
            f" / {dd} * {unit}) END AS BIGINT)"
        ).alias("intercept_micro"),
        F.expr(
            f"CAST(CASE WHEN {dd} = 0 OR {dy} = 0 THEN NULL ELSE"
            f" ROUND({cov} * {cov} / ({dd} * {dy}) * {unit}) END AS BIGINT)"
        ).alias("r2_micro"),
    )


def pearson_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    unit: int = 1_000_000,
    min_n: int = 2,
) -> DataFrame:
    """Grouped Pearson correlation from exact integer sums — the grouped
    sibling of the global correlation matrix (same exactness contract as
    ``ols_by_group``: int64-quantized inputs, one partial/final
    HashAggregate for (n, Σx, Σy, Σxy, Σx², Σy²), one IDENTICAL scalar
    double expression per group row, one rounding to ``unit``).  Groups
    with n < ``min_n`` or zero variance on either side emit NULL.
    """
    x, y = F.col(x_col), F.col(y_col)
    s = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    dd = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    dy = (
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    cov = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return s.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.expr(
            f"CAST(CASE WHEN n < {min_n} OR {dd} = 0 OR {dy} = 0"
            f" THEN NULL ELSE"
            f" ROUND({cov} / (sqrt({dd}) * sqrt({dy})) * {unit})"
            f" END AS BIGINT)"
        ).alias("corr_micro"),
    )


def gini_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    unit: int = 1_000_000,
) -> DataFrame:
    """Grouped Gini concentration coefficient over non-negative int64
    values:  G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx)  with xᵢ ascending —
    the inequality/concentration statistic (0 = uniform, →1 = one member
    holds everything).  NULL when the group sums to zero.

    Determinism: the rank i comes from a total order (value, tiebreak),
    and Σ(i·xᵢ) is invariant under permutations WITHIN a tied value run
    anyway (equal x), so any engine's sort yields the same sum; the
    closed form is one double expression on int64 operands, rounded to
    ``unit``.

    Scale: one sort shuffle on the group key ranks members in-partition,
    then a key-local aggregate — no self-join, no global sort.  Σ(i·x)
    needs i·x < 2^63: at 10⁹-member groups switch the products to
    DECIMAL(38), same shape."""
    w = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    ranked = df.select(
        *group_cols,
        F.col(value_col).alias("__x"),
        F.row_number().over(w).alias("__i"),
    )
    s = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__i").cast("long") * F.col("__x")).alias("six"),
    )
    return s.select(
        *group_cols,
        F.col("n").cast("long").alias("n"),
        F.expr(
            f"CAST(CASE WHEN sx = 0 THEN NULL ELSE"
            f" ROUND((2.0D * CAST(six AS DOUBLE)"
            f"        - (CAST(n AS DOUBLE) + 1.0D) * CAST(sx AS DOUBLE))"
            f" / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) * {unit})"
            f" END AS BIGINT)"
        ).alias("gini_micro"),
    )


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    cents_col: Column,
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """Robust dispersion profile per group: exact median, exact median
    absolute deviation (MAD), and the count of rows beyond
    (k_num/k_den)·MAD from the median — the outlier gate that, unlike the
    z-score (``integer_z_outliers``), a handful of extreme values cannot
    drag open (50% breakdown point vs 0%).

    Exactness: medians ride the 2× trick — ``med2`` = 2·median(cents) and
    ``mad4`` = 2·median(2·|dev|) are integers for integer inputs (doubled
    middle, or the sum of the two middles), so engine interpolation paths
    cannot differ.  The gate |x − med| > k·MAD is applied as
    2·k_den·dev2 > k_num·mad4 — pure int64.

    Scale: ONE exchange on the group key — both unbounded ``percentile``
    windows and the final count aggregate share the same partitioning,
    so the fact scans once.  ``percentile`` holds a group's values in
    the window buffer, so at extreme per-group cardinality the
    approximate tier (percentile_approx) substitutes.
    """
    w = Window.partitionBy(group_col)
    # Both medians ride unbounded windows over the same partition key:
    # one exchange, one scan — no median aggregate joined back.
    vals = df.select(F.col(group_col), cents_col.alias("__x"))
    dev = vals.select(
        F.col(group_col),
        "__x",
        F.round(F.expr("percentile(__x, 0.5D)").over(w) * 2)
        .cast("long")
        .alias("med2_cents"),
    ).select(
        F.col(group_col),
        "med2_cents",
        F.abs(F.lit(2) * F.col("__x") - F.col("med2_cents")).alias("__dev2"),
    )
    gated = dev.select(
        F.col(group_col),
        "med2_cents",
        "__dev2",
        F.round(F.expr("percentile(__dev2, 0.5D)").over(w) * 2)
        .cast("long")
        .alias("mad4_cents"),
    )
    return gated.groupBy(group_col, "med2_cents", "mad4_cents").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (
                F.lit(2 * k_den) * F.col("__dev2")
                > F.lit(k_num) * F.col("mad4_cents")
            ).cast("long")
        )
        .cast("long")
        .alias("n_outliers"),
    )


def ks_by_group(
    df: DataFrame,
    group_col: str,
    cents_col: Column,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic for each group vs
    the REST of the table: D = max over pooled values of
    |CDF_in(v) − CDF_rest(v)|, reported as floor-micro with the whole
    derivation in exact int64 (cross-multiplied counts — no float CDFs).

    Evaluates the CDF gap at every pooled distinct value (the max of the
    step-function difference is attained there), via a
    (distinct values × groups) grid: bounded by the value DOMAIN, not the
    row count — the same collapse the histogram/Benford kernels ride.

    Scale: one aggregate collapses the fact to (value, group) counts;
    the grid cross-join broadcasts the per-group totals (group
    cardinality rows); cumulative sums run per group over the value
    order.  Overflow envelope: cum·n_rest ≤ n_in·n_rest and the ×10⁶
    product must stay under 2⁶³ — lift to DECIMAL(38) beyond ~10⁹ rows
    per side.
    """
    # The (value, group) count table feeds four lineages (totals, grand
    # total, value grid, per-value cumulative); checkpointing the
    # domain-bounded aggregate keeps the fact scan single and stops the
    # re-derivation (measured: 5 scans / 11 exchanges -> 1 scan).
    counts = (
        df.select(F.col(group_col), cents_col.alias("__v"))
        .groupBy(group_col, "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    ).localCheckpoint(eager=False)
    totals = counts.groupBy(group_col).agg(F.sum("__c").alias("n_in"))
    grand = totals.agg(F.sum("n_in").alias("__n_all"))
    vals = counts.select("__v").distinct()
    grid = vals.crossJoin(F.broadcast(totals)).join(
        counts, [group_col, "__v"], "left"
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v_tot = (
        counts.groupBy("__v")
        .agg(F.sum("__c").alias("__cv"))
        .select(
            "__v",
            F.sum("__cv")
            .over(
                Window.orderBy("__v").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("__cum_all"),
        )
    )
    stepped = (
        grid.select(
            F.col(group_col),
            "__v",
            "n_in",
            F.sum(F.coalesce("__c", F.lit(0))).over(w_cum).alias("__cum_in"),
        )
        .join(v_tot, "__v")
        .crossJoin(F.broadcast(grand))
    )
    num = F.abs(
        F.col("__cum_in") * (F.col("__n_all") - F.col("n_in"))
        - (F.col("__cum_all") - F.col("__cum_in")) * F.col("n_in")
    )
    return (
        stepped.select(
            F.col(group_col),
            F.col("n_in"),
            (F.col("__n_all") - F.col("n_in")).alias("n_rest"),
            (num * 1_000_000).alias("__num"),
        )
        # a group that IS the whole table has no "rest" sample: KS vs an
        # empty distribution is undefined, and Spark's integer div would
        # otherwise degrade to a silent NULL (DuckDB's // raises on the
        # same input) — drop such groups explicitly instead
        .where(F.col("n_rest") > 0)
        .groupBy(group_col, "n_in", "n_rest")
        .agg(
            F.expr("CAST(MAX(__num) div (n_in * n_rest) AS BIGINT)").alias(
                "ks_micro"
            )
        )
        .select(
            group_col,
            F.col("n_in").cast("long").alias("n_in"),
            F.col("n_rest").cast("long").alias("n_rest"),
            "ks_micro",
        )
    )


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    cents_col: Column,
    tail_num: int = 5,
    tail_den: int = 100,
) -> DataFrame:
    """Winsorized mean per group: the k = ⌊n·tail⌋ smallest values are
    clamped up to the (k+1)-th order statistic and the k largest down to
    the (n−k)-th, then averaged — the bounded-influence alternative to
    trimming (keeps n constant) whose clamp bounds are EXACT order
    statistics picked by integer rank, so no quantile interpolation
    exists anywhere.

    Output per group: n, k, raw ``mean_cents_milli`` and
    ``winsorized_mean_cents_milli`` (both floor-milli of exact integer
    sums).

    Scale: ONE exchange on the group key — the rank window, the
    unordered (n, lo, hi) windows, and the final aggregate all share one
    hash partitioning (the CUSUM/MAD plan shape).
    """
    w_rank = Window.partitionBy(group_col).orderBy("__x")
    w_all = Window.partitionBy(group_col)
    k = F.expr(f"CAST(n * {tail_num} div {tail_den} AS BIGINT)")
    ranked = (
        df.select(F.col(group_col), cents_col.alias("__x"))
        .select(
            F.col(group_col),
            "__x",
            F.row_number().over(w_rank).alias("__rn"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .withColumn("__k", k)
        .select(
            F.col(group_col),
            "__x",
            "n",
            "__k",
            F.max(
                F.when(F.col("__rn") == F.col("__k") + 1, F.col("__x"))
            )
            .over(w_all)
            .alias("__lo"),
            F.max(
                F.when(F.col("__rn") == F.col("n") - F.col("__k"), F.col("__x"))
            )
            .over(w_all)
            .alias("__hi"),
        )
    )
    clamped = F.least(F.greatest(F.col("__x"), F.col("__lo")), F.col("__hi"))
    return ranked.groupBy(group_col, "n", "__k").agg(
        F.expr("CAST(SUM(__x) * 1000 div MAX(n) AS BIGINT)").alias(
            "mean_cents_milli"
        ),
        F.sum(clamped).alias("__ws"),
    ).select(
        group_col,
        F.col("n").cast("long").alias("n"),
        F.col("__k").cast("long").alias("k"),
        "mean_cents_milli",
        F.expr("CAST(__ws * 1000 div n AS BIGINT)").alias(
            "winsorized_mean_cents_milli"
        ),
    )


def percentile_bands(
    df: DataFrame,
    group_cols: list[str],
    cents_col: Column,
) -> DataFrame:
    """P50/P95/P99 bands per group in scaled-integer exactness: for a
    rational quantile a/b over int64 inputs, b×percentile is an integer
    (the interpolation fraction is a multiple of 1/b), so ROUND(b·q)
    is bit-identical across engines — p50 ships ×2, p95 ×20, p99 ×100
    (the latency-band rollup every metrics pipeline publishes).

    Scale: one partial/final aggregate per group; ``percentile`` holds a
    group's values before the merge, so extreme per-group cardinality
    swaps in the approximate tier with the same output contract.
    """
    return (
        df.select(*[F.col(c) for c in group_cols], cents_col.alias("__x"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.expr("percentile(__x, 0.5D)") * 2)
            .cast("long")
            .alias("p50_x2"),
            F.round(F.expr("percentile(__x, 0.95D)") * 20)
            .cast("long")
            .alias("p95_x20"),
            F.round(F.expr("percentile(__x, 0.99D)") * 100)
            .cast("long")
            .alias("p99_x100"),
        )
    )


# Poisson(1) inverse-CDF thresholds on a 32-bit uniform: T[k] =
# floor(P(X <= k) * 2^32) for k = 0..7; the replica weight is the count
# of thresholds at or below the draw (so P(w = k) is exactly Poisson(1)
# at 32-bit resolution, with the ~1e-5 tail mass lumped into w = 8).
# Identical literals are baked into the DuckDB oracle — the weights are
# a pure integer function of (id, replica) in both engines.
POISSON1_T32 = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
)


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    b: int = 32,
    salt: str = "boot",
) -> DataFrame:
    """Per-group mean of integer ``value_col`` with a deterministic
    Poisson-bootstrap confidence band — the resampling scheme that
    actually distributes: a classic multinomial bootstrap needs a
    corpus-wide draw per replica (global coordination), while Poisson
    bootstrap gives every row an independent Poisson(1) replica weight,
    so all B replicas ride ONE scan as map-side conditional partials
    (the Google-style large-scale bootstrap).

    Determinism: the weight of row ``id`` in replica ``r`` is a pure
    function of md5(salt:id:r) against the POISSON1_T32 thresholds —
    stable across engines, partitionings, and retries; replica means
    are integer micro-ratios and the CI bounds are order statistics
    (rank 2 and rank ceil(0.95 * B) of B, replica id as tie-break), so
    the whole output is engine-exact.

    Scale: the B-way explode is map-side CPU only — the (group,
    replica) partial aggregate combines before the shuffle, so shuffle
    volume is |groups| x B partial rows regardless of corpus size; the
    rank window orders B rows per group.  A replica that draws weight
    0 everywhere (only plausible on near-empty groups) contributes
    mean 0 rather than NULL so the rank positions stay fixed.

    Output: (group..., n_rows, mean_micro, ci_lo_micro, ci_hi_micro).

    Precondition: ``b >= 20``.  The CI uses the FIXED order statistics
    rank 2 (lower) and ceil(0.95 * b) (upper); both consumers' oracles
    (_bootstrap_oracle, _ab_oracle) hardcode rank 2, so an adaptive
    lower rank for small b would silently diverge from them (r09
    advisor item) — the operator now rejects b < 20 outright instead
    of adapting.
    """
    if b < 20:
        raise ValueError(
            "poisson_bootstrap_mean_ci requires b >= 20: the CI's "
            f"lower bound is the fixed rank-2 order statistic (got b={b})"
        )
    lo_rank = 2
    hi_rank = -(-95 * b // 100)  # ceil(0.95 * b)
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col(id_col).cast("string"),
                    F.col("__r").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = None
    for t in POISSON1_T32:
        term = (u >= F.lit(t)).cast("long")
        w = term if w is None else w + term
    rep = df.select(
        *group_cols,
        F.col(id_col),
        F.col(value_col).alias("__x"),
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("__r"),
    ).select(
        *group_cols,
        "__r",
        "__x",
        w.alias("__w"),
    )
    per_rep = rep.groupBy(*group_cols, "__r").agg(
        F.sum(F.col("__w") * F.col("__x")).alias("__s"),
        F.sum("__w").alias("__n"),
    ).select(
        *group_cols,
        "__r",
        F.expr(
            "CAST(CASE WHEN __n = 0 THEN 0"
            " ELSE __s * 1000000 DIV __n END AS BIGINT)"
        ).alias("__m"),
    )
    rk_w = Window.partitionBy(*group_cols).orderBy("__m", "__r")
    ranked = per_rep.withColumn("__rk", F.row_number().over(rk_w))
    ci = ranked.groupBy(*group_cols).agg(
        F.max(
            F.when(F.col("__rk") == lo_rank, F.col("__m"))
        ).alias("ci_lo_micro"),
        F.max(
            F.when(F.col("__rk") == hi_rank, F.col("__m"))
        ).alias("ci_hi_micro"),
    )
    base = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            f"CAST(SUM({value_col}) * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("mean_micro"),
    )
    return base.join(ci, group_cols)


def grouped_zipf_slope(
    ranked: DataFrame,
    group_col: str,
    rank_col: str = "r",
    count_col: str = "c",
) -> DataFrame:
    """Per-group Zipf fit: least-squares slope/intercept of
    ln(count) against ln(rank) over an already-ranked frequency head —
    the corpus-health scalar behind ``token_head_mass``'s permille
    summary (slope ≈ -1 is classic Zipf; a steeper head is
    templated/boilerplate, a flatter one is diverse).

    Exactness contract (the grouped_linreg discipline, adapted to the
    log-log domain): both coordinates quantize FIRST —
    x = round(ln(rank)·1e6), y = round(ln(count)·1e6) as int64, the
    identical double expression on both engines (the adamic_adar /
    TF-IDF ln() convention) — then the five moments (n, Sx, Sy, Sxx,
    Sxy) are exact int64 sums, map-side combined and order-independent,
    and the slope/intercept are fixed-shape IEEE divisions, micro-
    rounded.  Domain: |x|,|y| ≤ ~2e7 for any count below e^20 ≈ 5e8,
    so the moment SUMS fit int64 at any realistic head size — but the
    closed-form PRODUCTS (n·Sxy, Sx·Sy) can pass int64 already at a
    100-row head of large counts, so they are carried in DECIMAL(38,0)
    (HUGEINT on the oracle side), exact at these magnitudes, and only
    the final covariance/variance ratio drops to double.

    Groups with < 2 head rows or zero x-variance are dropped (undefined
    fit).  Output: (group, n_head, slope_micro, intercept_micro).
    """
    x = round_half_up_long(
        F.log(F.col(rank_col).cast("double")) * 1_000_000
    )
    y = round_half_up_long(
        F.log(F.col(count_col).cast("double")) * 1_000_000
    )
    m = (
        ranked.select(F.col(group_col), x.alias("__x"), y.alias("__y"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("sx"),
            F.sum("__y").alias("sy"),
            F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
            F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        )
    )
    dec = "decimal(38,0)"
    var_num = F.col("n").cast(dec) * F.col("sxx").cast(dec) - F.col(
        "sx"
    ).cast(dec) * F.col("sx").cast(dec)
    cov_num = F.col("n").cast(dec) * F.col("sxy").cast(dec) - F.col(
        "sx"
    ).cast(dec) * F.col("sy").cast(dec)
    slope = cov_num.cast("double") / var_num.cast("double")
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return (
        m.where((F.col("n") >= 2) & (var_num > 0))
        .select(
            F.col(group_col),
            F.col("n").cast("long").alias("n_head"),
            F.round(slope * F.lit(1_000_000.0)).cast("long").alias(
                "slope_micro"
            ),
            F.round(intercept).cast("long").alias("intercept_micro"),
        )
    )
