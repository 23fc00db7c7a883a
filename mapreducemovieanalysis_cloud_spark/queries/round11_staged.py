"""Round-11 query wave — REGISTERED as of round 11 (the freeze lifted
per the committed round-10 ledger plan).

History: built and oracle-parity-tested during round 9 while round 9's
50 driver slots were fully committed (36 r04 rotation rows + the
promoted round8/round9 waves) and round 10's plan was already fixed
(the 6 round10_staged candidates + post-r09 rotation debt).  Round 11
promoted them: every ``_staged`` entry now ALSO registers through
``registry.query``, so the driver's correctness gate covers them
directly.  The STAGED_QUERIES/STAGED_ORACLES dicts remain as the
module's index (the parity tests iterate them);
``tests/test_round11_staged.py::test_staged_are_registered`` pins that
every entry is live in the registry with the identical callable and
oracle.

What the wave adds (new capabilities, not variants):

* ``chisq_lang_source`` — extends the registered chi-square family
  (``chi2_cells_type_hod``) to the corpus-mix contingency AND adds the
  global statistic + degrees of freedom on every row (the registered
  query emits cells only — a consumer still had to sum and count);
  over documents it answers "is language mix independent of source?",
  which PSI/KS (single-variable drift) cannot.
* ``benford_price_audit`` — extends the registered Benford profile
  (``benford_totalprice``, corpus-global) to per-segment audits with a
  decision-ready per-segment total-variation distance: WHICH order
  priority deviates, by how much mass — the slice-localized forensic.
* ``cusum_changepoint_events`` — extends the registered CUSUM family
  (``cusum_user_value``, max excursion magnitude per user's value
  series) to the dense hourly RATE grid per type and reports the
  located changepoint HOUR (argmax |S|), not just the excursion size:
  the sequential-drift alarm the point-in-time outlier family (z/MAD)
  cannot see.
* ``seasonal_hour_decompose`` — classical additive decomposition of the
  hourly rate series (25-hour centered-MA trend, hour-of-day seasonal
  means, residual): the deseasonalized residual is what anomaly
  detection SHOULD threshold on (raw hourly counts alarm every
  midnight).
* ``adamic_adar_suppliers`` — Adamic-Adar link prediction on the
  supplier co-occurrence graph: the "which missing edges look most like
  existing ones" tier between the graph itself and reachability.
* ``anf_reach_suppliers`` — Flajolet-Martin approximate neighborhood
  function (ANF): per-node k-hop reach estimates from fixed-width
  bitmask sketches — the sketch tier of the graph family (bfs_hops /
  two_hop_reach materialize frontier SETS, the thing you cannot do at
  100 TB; ANF's state is 16 bitmasks per node and neighborhood union is
  a bitwise OR, idempotent and partial-aggregatable).
* ``incremental_graph_edges`` — the co-occurrence edge list served from
  an incrementally-maintained pair-count store: the graph family joins
  the incremental-store posture (counts add => merged edges == full
  rebuild, same oracle; a new ingest day appends its own orders' pairs
  and never rescans history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import sketches
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

STAGED_ORACLES: dict[str, str] = {}
STAGED_QUERIES: dict = {}


def _staged(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return query(name, oracle)(fn)

    return deco


# ---- chi-square independence: lang x source ----------------------------------

_CHISQ_ORACLE = """
    WITH obs AS (SELECT lang, source, COUNT(*) AS o
                 FROM documents GROUP BY 1, 2),
    rt AS (SELECT lang, SUM(o) AS rt FROM obs GROUP BY 1),
    ct AS (SELECT source, SUM(o) AS ct FROM obs GROUP BY 1),
    n AS (SELECT SUM(o) AS n FROM obs),
    dims AS (SELECT (SELECT COUNT(*) FROM rt) AS nl,
                    (SELECT COUNT(*) FROM ct) AS ns),
    grid AS (SELECT rt.lang, ct.source, rt.rt, ct.ct FROM rt CROSS JOIN ct),
    cell AS (SELECT g.lang, g.source, COALESCE(o.o, 0) AS o,
                    g.rt, g.ct, n.n
             FROM grid g LEFT JOIN obs o USING (lang, source) CROSS JOIN n),
    c2 AS (SELECT lang, source, o,
                  CAST(ROUND(CAST(rt AS DOUBLE) * ct / n * 1000000)
                       AS BIGINT) AS expected_micro,
                  CAST(ROUND(POW(o - CAST(rt AS DOUBLE) * ct / n, 2)
                             / (CAST(rt AS DOUBLE) * ct / n) * 1000000)
                       AS BIGINT) AS contrib_micro
           FROM cell)
    SELECT lang, source, CAST(o AS BIGINT) AS n_obs,
           expected_micro, contrib_micro,
           CAST(SUM(contrib_micro) OVER () AS BIGINT) AS chi2_micro,
           CAST((d.nl - 1) * (d.ns - 1) AS BIGINT) AS dof
    FROM c2 CROSS JOIN dims d
    """


@_staged("chisq_lang_source", oracle=_CHISQ_ORACLE)
def chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence audit of the (lang, source)
    contingency table: per cell the observed count, the
    independence-expected count, and the cell's chi-square contribution
    (the standardized residual's square — WHICH cells drive the
    dependence), plus the global statistic and degrees of freedom on
    every row.  Extends the registered ``chi2_cells_type_hod``
    (round4g — cells only, events modality) with the rolled-up
    chi2_micro/dof a consumer otherwise had to compute, applied to the
    corpus-mix question PSI and KS cannot answer: whether two
    categorical variables are associated at all — a source whose
    language mix diverges from the corpus-wide mix lights up its row of
    cells.

    Determinism: marginals and observed counts are exact integers; the
    expected value and per-cell contribution are ONE shared double
    expression on those integers (rt*ct/n and its chi-square term — the
    corr_matrix pattern), each micro-rounded to BIGINT per cell BEFORE
    the global sum, so chi2_micro is an exact integer sum under any
    partitioning (the quality_nb_scores quantize-the-leaves rule).

    Scale: obs/rt/ct are one partial-agg pass each (cells bounded by
    |langs| x |sources| — a catalog grid, not data-sized); the grid is
    a broadcast cross join of two catalog-sized marginal tables (BNLJ
    by design, whitelisted); every grid cell joins obs by key.  Nothing
    here grows with corpus rows except the first aggregate's input.
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    )
    obs = obs.localCheckpoint(eager=False)  # feeds marginals + cells
    rt = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("n"))
    dims = rt.agg(F.count(F.lit(1)).alias("nl")).crossJoin(
        F.broadcast(ct.agg(F.count(F.lit(1)).alias("ns")))
    )
    grid = rt.crossJoin(F.broadcast(ct))
    cell = (
        grid.join(obs, ["lang", "source"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(n))
    )
    c2 = cell.select(
        "lang",
        "source",
        F.col("o"),
        F.expr(
            "CAST(ROUND(CAST(rt AS DOUBLE) * ct / n * 1000000)"
            " AS BIGINT)"
        ).alias("expected_micro"),
        F.expr(
            "CAST(ROUND(POW(o - CAST(rt AS DOUBLE) * ct / n, 2)"
            " / (CAST(rt AS DOUBLE) * ct / n) * 1000000) AS BIGINT)"
        ).alias("contrib_micro"),
    )
    from pyspark.sql import Window

    return c2.crossJoin(F.broadcast(dims)).select(
        "lang",
        "source",
        F.col("o").cast("long").alias("n_obs"),
        "expected_micro",
        "contrib_micro",
        F.sum("contrib_micro")
        .over(Window.partitionBy())
        .cast("long")
        .alias("chi2_micro"),
        ((F.col("nl") - 1) * (F.col("ns") - 1))
        .cast("long")
        .alias("dof"),
    )


# ---- Benford leading-digit audit ---------------------------------------------

# round(log10(1 + 1/d) * 1e6) for d = 1..9 — BAKED literals shared with
# the oracle (the POISSON1_T32 pattern: no libm log10 at query time, so
# no cross-engine ulp exposure on the reference distribution).  The nine
# values sum to exactly 1_000_000.
BENFORD_MICRO = (
    (1, 301030),
    (2, 176091),
    (3, 124939),
    (4, 96910),
    (5, 79181),
    (6, 66947),
    (7, 57992),
    (8, 51153),
    (9, 45757),
)

_BENFORD_VALUES = ", ".join(f"({d}, {m})" for d, m in BENFORD_MICRO)

_BENFORD_ORACLE = f"""
    WITH src AS (SELECT o_orderpriority,
                        CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                         AS VARCHAR), 1, 1) AS INT) AS d
                 FROM orders WHERE o_totalprice >= 1),
    n AS (SELECT o_orderpriority, COUNT(*) AS n FROM src GROUP BY 1),
    o AS (SELECT o_orderpriority, d, COUNT(*) AS c FROM src GROUP BY 1, 2),
    bf AS (SELECT * FROM (VALUES {_BENFORD_VALUES}) AS t(d, bm)),
    cell AS (SELECT g.o_orderpriority, g.d, g.n, g.bm, COALESCE(o.c, 0) AS c
             FROM (SELECT n.o_orderpriority, n.n, bf.d, bf.bm
                   FROM n CROSS JOIN bf) g
             LEFT JOIN o ON o.o_orderpriority = g.o_orderpriority
                        AND o.d = g.d),
    s AS (SELECT o_orderpriority, d, n, c,
                 c * 1000000 // n AS share_micro, bm,
                 c * 1000000 // n - bm AS dev_micro
          FROM cell)
    SELECT o_orderpriority, CAST(d AS INT) AS lead_digit,
           CAST(n AS BIGINT) AS n_orders, CAST(c AS BIGINT) AS n_digit,
           CAST(share_micro AS BIGINT) AS share_micro,
           CAST(bm AS BIGINT) AS benford_micro,
           CAST(dev_micro AS BIGINT) AS dev_micro,
           CAST(SUM(ABS(dev_micro)) OVER (PARTITION BY o_orderpriority)
                // 2 AS BIGINT) AS tvd_half_micro
    FROM s
    """


@_staged("benford_price_audit", oracle=_BENFORD_ORACLE)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law leading-digit audit of o_totalprice per order
    priority: per (priority, digit 1..9) the observed share vs the
    Benford expectation, and per priority the total-variation distance
    — the classic numeric-column forensic (organically-generated
    magnitudes follow log-uniform leading digits; synthetic, capped, or
    fabricated values don't).  Extends the registered
    ``benford_totalprice`` (round4g — one corpus-global digit profile)
    to SLICED audits with a per-segment TVD summary: which slice
    deviates and by how much mass, the decision-ready form.

    Determinism: pure integer arithmetic end to end — digit extraction
    is string slicing of an exact BIGINT floor, shares are integer
    micro floor-divisions, and the nine Benford reference values are
    BAKED micro literals shared with the oracle (no libm log10 at query
    time), summing to exactly 1_000_000.

    Scale: one partial-agg pass to (priority, digit) cells — a bounded
    grid (|priorities| x 9) regardless of corpus size; the 9-row digit
    table broadcasts (BNLJ by design, whitelisted); the TVD window
    orders 9 rows per priority.
    """
    bf = spark.createDataFrame(
        list(BENFORD_MICRO), "d int, bm long"
    )
    src = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1)
        .select(
            "o_orderpriority",
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("d"),
        )
    )
    src = src.localCheckpoint(eager=False)  # feeds totals + digit counts
    n = src.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    o = src.groupBy("o_orderpriority", "d").agg(
        F.count(F.lit(1)).alias("c")
    )
    cell = (
        n.crossJoin(F.broadcast(bf))
        .join(o, ["o_orderpriority", "d"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    s = cell.select(
        "o_orderpriority",
        "d",
        "n",
        "c",
        F.expr("c * 1000000 DIV n").alias("share_micro"),
        "bm",
        F.expr("c * 1000000 DIV n - bm").alias("dev_micro"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority")
    return s.select(
        "o_orderpriority",
        F.col("d").cast("int").alias("lead_digit"),
        F.col("n").cast("long").alias("n_orders"),
        F.col("c").cast("long").alias("n_digit"),
        F.col("share_micro").cast("long"),
        F.col("bm").cast("long").alias("benford_micro"),
        F.col("dev_micro").cast("long"),
        F.expr("ABS(dev_micro)").alias("__a"),
    ).select(
        "o_orderpriority",
        "lead_digit",
        "n_orders",
        "n_digit",
        "share_micro",
        "benford_micro",
        "dev_micro",
        (F.sum("__a").over(w) / 2)
        .cast("long")
        .alias("tvd_half_micro"),
    )


# ---- hourly event-rate series (shared grid) ----------------------------------

_US_PER_HOUR = 3_600_000_000

_GRID_CTE = """
    h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx
          FROM events),
    cnt AS (SELECT event_type, hour_idx, COUNT(*) AS c
            FROM h GROUP BY 1, 2),
    span AS (SELECT event_type, MIN(hour_idx) AS lo, MAX(hour_idx) AS hi
             FROM h GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hour_idx
             FROM span),
    g AS (SELECT grid.event_type, grid.hour_idx, COALESCE(cnt.c, 0) AS c
          FROM grid LEFT JOIN cnt USING (event_type, hour_idx))
    """


def _hourly_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hour_idx, c): each type's hourly event counts on a
    DENSE per-type hour grid (missing hours = 0) — the regular series
    both decomposition queries consume.  Same grid protocol as
    operators/timeseries.resample_hourly_locf: integer epoch-hours via
    unix_micros div, span from min/max, sequence explode."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(_US_PER_HOUR))
        .cast("long")
        .alias("hour_idx"),
    )
    cnt = ev.groupBy("event_type", "hour_idx").agg(
        F.count(F.lit(1)).alias("c")
    )
    span = ev.groupBy("event_type").agg(
        F.min("hour_idx").alias("lo"), F.max("hour_idx").alias("hi")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("hour_idx"),
    )
    return (
        grid.join(cnt, ["event_type", "hour_idx"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )


_CUSUM_ORACLE = f"""
    WITH {_GRID_CTE},
    m AS (SELECT event_type, COUNT(*) AS n_hours, SUM(c) AS tot
          FROM g GROUP BY 1),
    d AS (SELECT g.event_type, g.hour_idx,
                 g.c * 1000000 - (m.tot * 1000000 // m.n_hours) AS dev
          FROM g JOIN m USING (event_type)),
    cs AS (SELECT event_type, hour_idx,
                  SUM(dev) OVER (PARTITION BY event_type ORDER BY hour_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
           FROM d),
    cp AS (SELECT event_type, hour_idx, s FROM (
             SELECT event_type, hour_idx, s,
                    ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY ABS(s) DESC, hour_idx ASC) AS rn
             FROM cs) WHERE rn = 1)
    SELECT m.event_type, CAST(m.n_hours AS BIGINT) AS n_hours,
           CAST(m.tot * 1000000 // m.n_hours AS BIGINT) AS mean_cnt_micro,
           CAST(cp.hour_idx AS BIGINT) AS cp_hour_idx,
           CAST(cp.s AS BIGINT) AS cusum_at_cp_micro,
           CAST(ABS(cp.s) AS BIGINT) AS max_abs_cusum_micro
    FROM m JOIN cp USING (event_type)
    """


@_staged("cusum_changepoint_events", oracle=_CUSUM_ORACLE)
def cusum_changepoint_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM changepoint screen per event type: over the dense hourly
    rate series, the cumulative sum of deviations from the series mean
    S_i = Σ_{j<=i} (c_j - mean), and the hour where |S| peaks — the
    classic single-changepoint locator (S drifts monotonically while
    the level differs from the overall mean, so its extremum IS the
    most likely shift point).  Extends the registered
    ``cusum_user_value`` (round4h — max excursion MAGNITUDE per user's
    value series) to the dense hourly rate grid per type, and reports
    the located changepoint HOUR, not just the excursion size.  The
    sequential-drift alarm the point-in-time outlier family
    (outliers_value_z / _mad) cannot see: a slow 10% level shift never
    trips a per-point threshold but accumulates linearly in S.

    Determinism: counts are exact integers, the mean is an integer
    micro floor-division, deviations and cumulative sums are pure
    integer arithmetic, and the argmax is an integer comparison with
    hour as tie-break (min_by over (-|S|, hour) — the
    canonical_survivors shape).  Engine-exact end to end; Spark DIV
    and DuckDB // both truncate toward zero so signed values agree.

    Scale: the grid aggregate collapses map-side to (type, hour) rows
    (time-bounded, not corpus-bounded); the cumulative window
    partitions by type — per-type series state is the time-series
    family posture (same as ewma/resample); the final argmax is one
    row per type.
    """
    g = _hourly_grid(spark, sf_dir)
    g = g.localCheckpoint(eager=False)  # feeds mean + cumsum
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"), F.sum("c").alias("tot")
    )
    d = g.join(m, "event_type").select(
        "event_type",
        "hour_idx",
        "n_hours",
        "tot",
        F.expr("c * 1000000 - (tot * 1000000 DIV n_hours)").alias("dev"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = d.select(
        "event_type", "hour_idx", F.sum("dev").over(w).alias("s")
    )
    cp = cs.groupBy("event_type").agg(
        F.min_by(
            F.struct(
                F.col("hour_idx").alias("cp_hour_idx"),
                F.col("s").alias("cusum_at_cp_micro"),
            ),
            F.struct(
                (-F.abs(F.col("s"))).alias("_na"),
                F.col("hour_idx").alias("_h"),
            ),
        ).alias("p")
    ).select("event_type", "p.cp_hour_idx", "p.cusum_at_cp_micro")
    return (
        m.join(cp, "event_type")
        .select(
            "event_type",
            F.col("n_hours").cast("long"),
            F.expr("CAST(tot * 1000000 DIV n_hours AS BIGINT)").alias(
                "mean_cnt_micro"
            ),
            F.col("cp_hour_idx").cast("long"),
            F.col("cusum_at_cp_micro").cast("long"),
            F.abs(F.col("cusum_at_cp_micro"))
            .cast("long")
            .alias("max_abs_cusum_micro"),
        )
    )


_SEASONAL_ORACLE = f"""
    WITH {_GRID_CTE},
    tr AS (SELECT event_type, hour_idx, c,
                  SUM(c) OVER w AS s25, COUNT(*) OVER w AS w25
           FROM g WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
             ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    det AS (SELECT event_type, hour_idx, c,
                   s25 * 1000000 // 25 AS trend_micro,
                   c * 1000000 - s25 * 1000000 // 25 AS det_micro
            FROM tr WHERE w25 = 25),
    seas AS (SELECT event_type, hour_idx % 24 AS hod,
                    SUM(det_micro) // COUNT(*) AS seasonal_micro
             FROM det GROUP BY 1, 2)
    SELECT d.event_type, CAST(d.hour_idx AS BIGINT) AS hour_idx,
           CAST(d.c AS BIGINT) AS n_events,
           CAST(d.trend_micro AS BIGINT) AS trend_micro,
           CAST(s.seasonal_micro AS BIGINT) AS seasonal_micro,
           CAST(d.det_micro - s.seasonal_micro AS BIGINT) AS residual_micro
    FROM det d JOIN seas s ON s.event_type = d.event_type
                          AND s.hod = d.hour_idx % 24
    """


@_staged("seasonal_hour_decompose", oracle=_SEASONAL_ORACLE)
def seasonal_hour_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive decomposition of each type's hourly event
    rate: trend (25-hour centered moving average — one full day plus
    the center, so the daily cycle integrates out), hour-of-day
    seasonal component (mean of the detrended series per hod), and
    residual.  The residual is what rate anomaly detection should
    threshold on — raw hourly counts alarm every midnight, the
    deseasonalized residual only on genuine deviations; emitted for
    interior hours only (full 25-hour windows), the standard
    centered-MA edge rule.

    Determinism: counts are integers on a dense grid; the trend is an
    integer micro floor-division of a 25-hour window sum; detrended
    values, seasonal means, and residuals are pure integer arithmetic
    (Spark DIV and DuckDB // both truncate toward zero, so the signed
    seasonal means agree bit-for-bit).

    Scale: (type, hour) cells are time-bounded; the centered-MA window
    and the hod aggregate both partition by type (the time-series
    posture); the seasonal join-back keys on (type, hod) — 24 rows per
    type.
    """
    g = _hourly_grid(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(-12, 12)
    )
    tr = g.select(
        "event_type",
        "hour_idx",
        "c",
        F.sum("c").over(w).alias("s25"),
        F.count(F.lit(1)).over(w).alias("w25"),
    )
    det = tr.where(F.col("w25") == 25).select(
        "event_type",
        "hour_idx",
        "c",
        F.expr("s25 * 1000000 DIV 25").alias("trend_micro"),
        F.expr("c * 1000000 - s25 * 1000000 DIV 25").alias("det_micro"),
    )
    det = det.localCheckpoint(eager=False)  # feeds seasonal + output
    # seas derives FROM det, so the join below is a self-join on shared
    # lineage — rename its keys to break the attribute ambiguity
    seas = (
        det.groupBy(
            "event_type", (F.col("hour_idx") % 24).alias("hod")
        )
        .agg(F.expr("SUM(det_micro) DIV COUNT(*)").alias("seasonal_micro"))
        .select(
            F.col("event_type").alias("__et"), "hod", "seasonal_micro"
        )
    )
    return (
        det.join(
            seas,
            (F.col("event_type") == F.col("__et"))
            & ((F.col("hour_idx") % 24) == F.col("hod")),
        )
        .select(
            "event_type",
            F.col("hour_idx").cast("long"),
            F.col("c").cast("long").alias("n_events"),
            F.col("trend_micro").cast("long"),
            F.col("seasonal_micro").cast("long"),
            (F.col("det_micro") - F.col("seasonal_micro"))
            .cast("long")
            .alias("residual_micro"),
        )
    )


# ---- supplier co-occurrence graph (shared edge CTE) ---------------------------

# identical edge definition to the registered triangle_counts_suppliers
# oracle (scale_queries.py) — min_shared=20 co-orders
_EDGES_CTE = """
    li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    pr AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS shared
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2),
    edges AS (SELECT u, v FROM pr WHERE shared >= 20),
    adj AS (SELECT u AS node, v AS nbr FROM edges
            UNION ALL SELECT v, u FROM edges)
    """

_AA_DEG_CAP = 64
_AA_TOPK = 100

_AA_ORACLE = f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY 1),
    apex AS (SELECT node,
                    CAST(ROUND(1000000 / ln(CAST(deg AS DOUBLE)))
                         AS BIGINT) AS w
             FROM deg WHERE deg >= 2 AND deg <= {_AA_DEG_CAP}),
    wd AS (SELECT a.node AS apex, a.nbr, ap.w
           FROM adj a JOIN apex ap USING (node)),
    pairs AS (SELECT w1.nbr AS u, w2.nbr AS v,
                     SUM(w1.w) AS score_micro, COUNT(*) AS n_common
              FROM wd w1 JOIN wd w2 ON w1.apex = w2.apex
                                   AND w1.nbr < w2.nbr
              GROUP BY 1, 2),
    ne AS (SELECT p.* FROM pairs p
           LEFT JOIN edges e ON e.u = p.u AND e.v = p.v
           WHERE e.u IS NULL)
    SELECT u, v, CAST(score_micro AS BIGINT) AS score_micro,
           CAST(n_common AS BIGINT) AS n_common
    FROM ne ORDER BY score_micro DESC, u, v LIMIT {_AA_TOPK}
    """


@_staged("adamic_adar_suppliers", oracle=_AA_ORACLE)
def adamic_adar_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} Adamic-Adar link predictions on the supplier
    co-occurrence graph (same edge definition as
    triangle_counts_suppliers: >= 20 shared orders): for every
    NON-edge pair, the sum of 1/ln(deg) over common neighbors — which
    missing edges look most like existing ones, the recommender tier
    between the graph itself and reachability.

    Determinism and the deg-cap scale bound live in
    operators/graph.adamic_adar_scores (weights micro-rounded per apex
    BEFORE summation; apexes above deg {cap} excluded by CONTRACT —
    principled: 1/ln(deg) already says hubs carry no signal — making
    wedge volume <= n x cap² under any skew).  Deterministic top-k
    (TakeOrderedAndProject).
    """
    from mapreducemovieanalysis_cloud_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(
        li, group_col="l_orderkey", node_col="l_suppkey", min_shared=20
    )
    return graph.adamic_adar_scores(
        edges, deg_cap=_AA_DEG_CAP, topk=_AA_TOPK
    )


adamic_adar_suppliers.__doc__ = adamic_adar_suppliers.__doc__.format(
    k=_AA_TOPK, cap=_AA_DEG_CAP
)


_ANF_R = 16
_ANF_HOPS = 3
# the cap and bias correction are OWNED by operators/sketches.py (one
# source of truth for every FM consumer — graph.anf_reach imports the
# same two); the oracle SQL below bakes them in via these f-strings so
# a sketches.py change re-derives the DuckDB side too.
_ANF_BIT_CAP = sketches.FM_BIT_CAP


def _anf_sketch_sql(src: str) -> str:
    """One ANF hop in SQL: OR each node's sketch with its neighbors'."""
    return f"""(SELECT node, r, bit_or(m) AS m FROM (
         SELECT a.node, s.r, s.m FROM adj a JOIN {src} s ON s.node = a.nbr
         UNION ALL SELECT node, r, m FROM {src}) GROUP BY 1, 2)"""


_ANF_EST = (
    "CAST(ROUND(POW(2.0, CAST(b_sum AS DOUBLE) / {r}) / {phi} * 1000) "
    "AS BIGINT)"
).format(r=_ANF_R, phi=sketches.FM_PHI)

_ANF_ORACLE = f"""
    WITH {_EDGES_CTE},
    nodes AS (SELECT DISTINCT node FROM adj),
    regs AS (SELECT node, r FROM nodes,
             unnest(generate_series(0, {_ANF_R - 1})) AS gg(r)),
    h0 AS (SELECT node, r,
                  CAST(('0x' || substr(md5('anf:' || CAST(r AS VARCHAR)
                        || ':' || CAST(node AS VARCHAR)), 1, 8))
                       AS BIGINT) AS hv
           FROM regs),
    s0 AS (SELECT node, r,
                  (CAST(1 AS BIGINT) << CASE WHEN hv = 0 THEN {_ANF_BIT_CAP}
                     ELSE LEAST(bit_count((hv & -hv) - 1), {_ANF_BIT_CAP})
                     END) AS m
           FROM h0),
    s1 AS {_anf_sketch_sql("s0")},
    s2 AS {_anf_sketch_sql("s1")},
    s3 AS {_anf_sketch_sql("s2")},
    b1 AS (SELECT node, 1 AS hop,
                  SUM(bit_count(m & xor(m, m + 1))) AS b_sum
           FROM s1 GROUP BY 1),
    b2 AS (SELECT node, 2 AS hop,
                  SUM(bit_count(m & xor(m, m + 1))) AS b_sum
           FROM s2 GROUP BY 1),
    b3 AS (SELECT node, 3 AS hop,
                  SUM(bit_count(m & xor(m, m + 1))) AS b_sum
           FROM s3 GROUP BY 1),
    allb AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2
             UNION ALL SELECT * FROM b3)
    SELECT node, CAST(hop AS INT) AS hop, CAST(b_sum AS BIGINT) AS b_sum,
           {_ANF_EST} AS est_reach_milli
    FROM allb
    """


@_staged("anf_reach_suppliers", oracle=_ANF_ORACLE)
def anf_reach_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighborhood function over the supplier
    co-occurrence graph: per node and hop 1..{h}, a Flajolet-Martin
    estimate of the h-hop reach from {r} md5-seeded bitmask registers
    — the SKETCH tier of the graph family.  bfs_hops/two_hop_reach are
    the exact tiers and materialize per-node frontier SETS, the thing
    you cannot do at 100 TB; ANF state is {r} fixed-width masks per
    node and neighborhood union is bitwise OR — idempotent,
    associative, partial-aggregatable map-side, so each hop is one
    edge-keyed join plus one OR-aggregate regardless of how large the
    neighborhoods get.

    Output carries BOTH the exact integer register sum (b_sum — the
    value the driver hash pins) and the milli-rounded FM estimate
    (one shared double expression on that integer).  Determinism and
    the register/hash construction live in operators/graph.anf_reach.
    """
    from mapreducemovieanalysis_cloud_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(
        li, group_col="l_orderkey", node_col="l_suppkey", min_shared=20
    )
    return graph.anf_reach(edges, hops=_ANF_HOPS, registers=_ANF_R)


anf_reach_suppliers.__doc__ = anf_reach_suppliers.__doc__.format(
    h=_ANF_HOPS, r=_ANF_R
)


# ---- incremental co-occurrence graph store -------------------------------------

_INC_GRAPH_ORACLE = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    pr AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS shared
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2)
    SELECT u, v, CAST(shared AS BIGINT) AS shared
    FROM pr WHERE shared >= 20
    """


@_staged("incremental_graph_edges", oracle=_INC_GRAPH_ORACLE)
def incremental_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier co-occurrence edge list served from an INCREMENTALLY
    maintained pair-count store: the fact table arrives as two batches
    (l_orderkey parity — complete orders per batch, the store's
    contract), each appended at O(batch) cost
    (operators/graph.incremental_cooccurrence_append — the idempotent
    epoch layout the fingerprint/LM/IVF stores use), and the edge list
    is the merged counts filtered at min_shared=20.  Because
    within-group pair counts merge by ADDITION, the merged edges equal
    a full-corpus rebuild EXACTLY — the oracle is the full-rebuild
    derivation, no weaker tier.

    This is the graph family's 100 TB posture made storable: every
    registered supplier-graph query (triangles, k-core, BFS, two-hop,
    LPA, Adamic-Adar, ANF) pays the group-keyed self-join over the
    FULL fact table on every run — the 10x probes show that derivation
    dominating both round-11 graph candidates — while a new ingest day
    appends only its own orders' pairs and never rescans history.

    Scale: stored state is pair-count partials (Σ_groups C(members, 2)
    rows per batch, group-size-bounded); the merge is one (u, v)-keyed
    groupBy over batch-count rows; min_shared prunes before any
    traversal.
    """
    from mapreducemovieanalysis_cloud_spark.operators import graph

    return graph.incremental_cooccurrence_edges(
        spark, cooc_store_path(spark, sf_dir), min_shared=20
    )


def cooc_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-absent the supplier co-occurrence pair-count store for
    ``sf_dir`` and return its path — shared by every stored-graph
    consumer (incremental_graph_edges here, the round-12 staged
    triangle consumer), so they all read ONE store per corpus.

    Cache key = data fingerprint + the operator-owned behavior version;
    built in a process-unique dir, published with one atomic rename
    (the incremental_lm_scores protocol — no half-built concurrent
    reads, stale-on-code-change)."""
    from mapreducemovieanalysis_cloud_spark.operators import graph
    from mapreducemovieanalysis_cloud_spark.operators.storecache import (
        cached_store,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )

    def _build(build: str) -> None:
        graph.incremental_cooccurrence_append(
            li.where(F.col("l_orderkey") % 2 == 0), build, "b0",
            group_col="l_orderkey", node_col="l_suppkey",
        )
        graph.incremental_cooccurrence_append(
            li.where(F.col("l_orderkey") % 2 == 1), build, "b1",
            group_col="l_orderkey", node_col="l_suppkey",
        )

    return cached_store(
        sf_dir,
        "spark_graft_graph_inc",
        graph.COOC_STORE_VERSION,
        "lineitem",
        _build,
    )
