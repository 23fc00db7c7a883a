"""Round-4 sixth wave: the interval/sweep-line family (peak concurrency,
union-of-intervals coverage), linear-interpolation resampling (the
gap-fill complement of LOCF), grouped OLS regression from exact sums,
multi-source BFS hop distances, TF-IDF top terms, and seasonal
(hour-of-day) anomaly counts.

Exactness discipline (same as waves 1-5): every quantity an oracle hash
touches is int64 (epoch-micros, micro/milli/cents fixed-point, counts);
the only float steps are IDENTICAL scalar double expressions evaluated
on identical integer operands in both engines immediately before one
micro-rounding (OLS closed forms, ln() in TF-IDF), and every ranking
comparator orders on the ALREADY-quantized score so a last-ulp libm
difference cannot flip a boundary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- grouped OLS regression --------------------------------------------------

_OLS_DD = (
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_OLS_DY = (
    "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_OLS_COV = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)


@query(
    "regr_price_on_qty_by_brand",
    oracle=f"""
    WITH m AS (SELECT p.p_brand AS brand,
                      CAST(FLOOR(l.l_quantity) AS BIGINT) AS x,
                      CAST(FLOOR(l.l_extendedprice) AS BIGINT) AS y
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    s AS (SELECT brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM m GROUP BY 1)
    SELECT brand, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN {_OLS_DD} = 0 THEN NULL ELSE
             ROUND({_OLS_COV} / {_OLS_DD} * 1000000) END AS BIGINT)
             AS slope_micro,
           CAST(CASE WHEN {_OLS_DD} = 0 THEN NULL ELSE
             ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                   / {_OLS_DD} * 1000000) END AS BIGINT) AS intercept_micro,
           CAST(CASE WHEN {_OLS_DD} = 0 OR {_OLS_DY} = 0 THEN NULL ELSE
             ROUND({_OLS_COV} * {_OLS_COV} / ({_OLS_DD} * {_OLS_DY})
                   * 1000000) END AS BIGINT) AS r2_micro
    FROM s
    """,
)
def regr_price_on_qty_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand simple OLS of line price on quantity (slope = effective
    unit price, intercept = fixed offset, r² = linearity) — the grouped
    regression primitive behind elasticity/trend dashboards
    (operators/aggregates.py:ols_by_group).

    Scale: the part side joins on the part key (dimension-sized —
    broadcast at test SF, shuffle-hash beyond), then ONE partial/final
    HashAggregate computes all six sums; the closed forms run on
    brand-cardinality rows. No second pass over the fact table."""
    from mapreducemovieanalysis_cloud_spark.operators import aggregates

    m = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    "p_partkey", "p_brand"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
            F.expr("CAST(FLOOR(l_extendedprice) AS BIGINT)").alias("y"),
        )
    )
    return aggregates.ols_by_group(m, ["brand"], "x", "y")


# ---- sweep-line peak concurrency --------------------------------------------

_CONC_US_PER_MIN = 60_000_000


@query(
    "peak_concurrent_by_type",
    oracle=f"""
    WITH iv AS (SELECT event_type, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + CAST(ROUND(value * {_CONC_US_PER_MIN}) AS BIGINT)
                         AS e
                FROM events),
    pts AS (SELECT event_type, s AS t, 1 AS d FROM iv
            UNION ALL SELECT event_type, e, -1 FROM iv),
    net AS (SELECT event_type, t, SUM(d) AS net FROM pts GROUP BY 1, 2),
    run AS (SELECT event_type,
                   SUM(net) OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cur
            FROM net),
    mx AS (SELECT event_type, MAX(cur) AS max_concurrent FROM run
           GROUP BY 1),
    n AS (SELECT event_type, COUNT(*) AS n_intervals FROM iv GROUP BY 1)
    SELECT n.event_type, CAST(n.n_intervals AS BIGINT) AS n_intervals,
           CAST(mx.max_concurrent AS BIGINT) AS max_concurrent
    FROM n JOIN mx ON n.event_type = mx.event_type
    """,
)
def peak_concurrent_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous activity per event type, treating each event as
    a [ts, ts + value minutes) session — the capacity-planning sweep
    (operators/timeseries.py:peak_concurrency) that replaces the naive
    quadratic interval self-join with one sorted scan.

    Determinism: +1/-1 deltas aggregate per instant BEFORE the ordered
    running sum, so the cumulative series is unique under any engine's
    tie order (closed-open intervals: an end and a start at the same
    instant net out)."""
    from mapreducemovieanalysis_cloud_spark.operators import timeseries

    iv = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("__s"),
        (
            F.unix_micros(F.col("ts"))
            + F.expr(
                f"CAST(ROUND(value * {_CONC_US_PER_MIN}) AS BIGINT)"
            )
        ).alias("__e"),
    )
    return timeseries.peak_concurrency(iv, "event_type")


# ---- union-of-intervals coverage --------------------------------------------


@query(
    "interval_coverage_user",
    oracle=f"""
    WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + CAST(ROUND(value * {_CONC_US_PER_MIN}) AS BIGINT)
                         AS e
                FROM events),
    marked AS (SELECT user_id, event_id, s, e,
                      CASE WHEN MAX(e) OVER w_prev IS NULL
                             OR s > MAX(e) OVER w_prev
                           THEN 1 ELSE 0 END AS opens
               FROM iv
               WINDOW w_prev AS (PARTITION BY user_id
                 ORDER BY s, e, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    isl AS (SELECT user_id, s, e,
                   SUM(opens) OVER (PARTITION BY user_id
                     ORDER BY s, e, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
            FROM marked),
    per AS (SELECT user_id, island, COUNT(*) AS n, MAX(e) - MIN(s) AS len
            FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len) AS BIGINT) AS covered_us
    FROM per GROUP BY 1
    """,
)
def interval_coverage_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicated activity coverage per user: overlapping/touching
    [ts, ts + value minutes) sessions merge into islands; report
    interval count, island count, and total covered microseconds
    (operators/timeseries.py:interval_coverage) — utilization
    accounting where overlaps must not double-count.

    Scale: one sort shuffle on the user feeds both gaps-and-islands
    windows; no self-join — the O(n²) overlap join becomes O(n log n)."""
    from mapreducemovieanalysis_cloud_spark.operators import timeseries

    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("__tb"),
        F.unix_micros(F.col("ts")).alias("__s"),
        (
            F.unix_micros(F.col("ts"))
            + F.expr(
                f"CAST(ROUND(value * {_CONC_US_PER_MIN}) AS BIGINT)"
            )
        ).alias("__e"),
    )
    return timeseries.interval_coverage(
        iv, "user_id", "__s", "__e", "__tb"
    )


# ---- linear-interpolation resampling ----------------------------------------


@query(
    "resample_hourly_interp",
    oracle="""
    WITH obs AS (SELECT user_id, epoch_us(ts) AS t,
                        max_by(CAST(ROUND(value * 1000000) AS BIGINT),
                               event_id) AS vm
                 FROM events GROUP BY 1, 2),
    span AS (SELECT user_id, MIN(t) AS lo, MAX(t) AS hi FROM obs
             GROUP BY 1),
    grid AS (SELECT user_id, g * 3600000000 AS t
             FROM span, unnest(generate_series(lo // 3600000000 + 1,
                                (hi - 1) // 3600000000)) AS gs(g)),
    merged AS (SELECT user_id, t, 0 AS is_grid, vm FROM obs
               UNION ALL
               SELECT user_id, t, 1, NULL FROM grid),
    f AS (SELECT user_id, t, is_grid,
                 last_value(vm IGNORE NULLS) OVER w_prev AS pv,
                 last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
                   OVER w_prev AS pt,
                 first_value(vm IGNORE NULLS) OVER w_next AS nv,
                 first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
                   OVER w_next AS nt
          FROM merged
          WINDOW w_prev AS (PARTITION BY user_id ORDER BY t, is_grid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 w_next AS (PARTITION BY user_id ORDER BY t, is_grid
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT user_id,
           strftime(make_timestamp(t), '%Y-%m-%d %H:%M:%S') AS hour,
           pv + CASE WHEN nv < pv
                     THEN -CAST((CAST(abs(nv - pv) AS HUGEINT) * (t - pt))
                                // (nt - pt) AS BIGINT)
                     ELSE CAST((CAST(abs(nv - pv) AS HUGEINT) * (t - pt))
                               // (nt - pt) AS BIGINT) END
             AS interp_micro
    FROM f
    WHERE is_grid = 1 AND pv IS NOT NULL AND nv IS NOT NULL
    """,
)
def resample_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of each user's value series at interior hour
    boundaries (operators/timeseries.py:resample_hourly_interp) — the
    straight-line gap fill metric/sensor pipelines want where LOCF's
    step function biases downstream aggregates.

    Exactness: micro-unit int64 values, pure integer interpolation term
    (abs/sign split so truncating division agrees for negative slopes).
    Scale: span-bounded grid explode + ONE per-user sort serving both
    the backward (prev) and forward (next) frames."""
    from mapreducemovieanalysis_cloud_spark.operators import timeseries

    return timeseries.resample_hourly_interp(
        load_table(spark, sf_dir, "events")
    )


# ---- multi-source BFS hop distance ------------------------------------------

_BFS_MAX_HOPS = 3
_BFS_SRC_MOD = 7


@query(
    "bfs_hops_suppliers",
    oracle=f"""
    WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_suppkey
                          FROM lineitem),
    pr AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS shared
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                               AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2),
    edges AS (SELECT u, v FROM pr WHERE shared >= 20),
    sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    srcs AS (SELECT DISTINCT u AS node FROM sym
             WHERE u % {_BFS_SRC_MOD} = 0),
    walk(node, hops) AS (
      SELECT node, 0 FROM srcs
      UNION
      SELECT s.v, w.hops + 1
      FROM walk w JOIN sym s ON s.u = w.node
      WHERE w.hops < {_BFS_MAX_HOPS}),
    d AS (SELECT node, MIN(hops) AS hops FROM walk GROUP BY 1)
    SELECT node, CAST(hops AS INT) AS hops FROM d
    """,
)
def bfs_hops_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance over the supplier co-supply graph
    (same >= 20-shared-orders edges as the triangle/two-hop queries):
    minimum hops from the nearest seed supplier (suppkey % {mod} == 0),
    horizon {h} (operators/graph.py:bfs_hops).

    The oracle is the textbook recursive-CTE BFS (UNION-deduped walk,
    hop-bounded); the engine runs the frontier loop — each round
    expands ONLY newly reached nodes and anti-joins the visited set, so
    a node's first appearance is its BFS minimum and total work is
    edges-within-horizon."""
    from mapreducemovieanalysis_cloud_spark.operators import graph

    edges = graph.cooccurrence_edges(
        load_table(spark, sf_dir, "lineitem"),
        group_col="l_orderkey",
        node_col="l_suppkey",
        min_shared=20,
    ).localCheckpoint(eager=False)
    sym_nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    sources = sym_nodes.where(F.col("node") % _BFS_SRC_MOD == 0)
    return graph.bfs_hops(edges, sources, _BFS_MAX_HOPS)


bfs_hops_suppliers.__doc__ = bfs_hops_suppliers.__doc__.format(
    mod=_BFS_SRC_MOD, h=_BFS_MAX_HOPS
)


# ---- TF-IDF top terms --------------------------------------------------------

_TFIDF_K = 3


@query(
    "tfidf_top_terms",
    oracle=rf"""
    WITH tok AS (SELECT doc_id,
                        unnest(string_split_regex(trim(text), '\s+'))
                          AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (SELECT t.doc_id, t.term, t.tf,
                      CAST(ROUND(t.tf * ln((CAST(n_docs AS DOUBLE) + 1.0)
                                 / (CAST(d.df AS DOUBLE) + 1.0))
                                 * 1000000) AS BIGINT) AS score_micro
               FROM tf t JOIN dft d ON t.term = d.term CROSS JOIN nd)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score_micro,
           CAST(rk AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY score_micro DESC, term) AS rk
          FROM scored)
    WHERE rk <= {_TFIDF_K}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF terms per document — the classic keyword/feature
    extraction pass (tf · ln((N+1)/(df+1)), micro-rounded BEFORE the
    per-doc rank so a last-ulp ln() difference cannot flip the boundary
    row; ties break on the term).

    Scale: explode → (doc, term) aggregate → term-keyed join against
    the vocabulary-sized df table (broadcast at test SF, shuffle-hash
    when the vocabulary outgrows it) → 1-row corpus-count broadcast →
    one per-doc window rank. The corpus is tokenized exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(r"split(trim(text), '\\s+')")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=False)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            F.expr(
                "CAST(ROUND(tf * ln((CAST(n_docs AS DOUBLE) + 1.0D)"
                " / (CAST(df AS DOUBLE) + 1.0D)) * 1000000) AS BIGINT)"
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), "term"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TFIDF_K)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score_micro",
            F.col("rank").cast("int").alias("rank"),
        )
    )


tfidf_top_terms.__doc__ = tfidf_top_terms.__doc__.format(k=_TFIDF_K)


# ---- seasonal (hour-of-day) anomaly counts ----------------------------------


@query(
    "anomaly_hour_of_day",
    oracle="""
    WITH f AS (SELECT event_type,
                      CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                      CAST(ROUND(value * 100) AS BIGINT) AS v
               FROM events),
    g AS (SELECT event_type, hod, COUNT(*) AS n, SUM(v) AS s,
                 SUM(v * v) AS ss
          FROM f GROUP BY 1, 2)
    SELECT f.event_type, f.hod, CAST(g.n AS BIGINT) AS n,
           CAST((g.s * 1000) // g.n AS BIGINT) AS mean_milli,
           CAST(SUM(CASE WHEN (f.v * g.n - g.s) * (f.v * g.n - g.s)
                              > 4 * (g.n * g.ss - g.s * g.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM f JOIN g ON f.event_type = g.event_type AND f.hod = g.hod
    GROUP BY 1, 2, 3, 4
    """,
)
def anomaly_hour_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly profile: per (event type, hour-of-day) cell, the
    event count, mean value (milli), and how many events sit beyond 2
    standard deviations of their OWN cell — the time-of-day baseline
    behind monitoring alerts (3 a.m. traffic is judged against 3 a.m.
    norms, not the daily mean).

    Entirely integer: the 2σ test is the cross-multiplied
    (v·n − Σv)² > 4(nΣv² − (Σv)²) — no division, no sqrt, bit-exact in
    any engine (int64-safe at test SF; DECIMAL(38) at 10¹² rows).
    Scale: ONE shuffle on (type, hod) serves both the whole-partition
    stats window and the final aggregate — the join-back the oracle
    spells out is fused into a window over the same partitioning."""
    f = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
    )
    w = Window.partitionBy("event_type", "hod")
    stats = f.select(
        "event_type",
        "hod",
        "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("ss"),
    )
    flagged = stats.withColumn(
        "is_outlier",
        (
            (F.col("v") * F.col("n") - F.col("s"))
            * (F.col("v") * F.col("n") - F.col("s"))
            > 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        ).cast("long"),
    )
    return flagged.groupBy("event_type", "hod").agg(
        F.max("n").cast("long").alias("n"),
        F.expr("CAST((max(s) * 1000) div max(n) AS BIGINT)").alias(
            "mean_milli"
        ),
        F.sum("is_outlier").cast("long").alias("n_outliers"),
    )
