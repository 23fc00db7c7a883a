"""Round-4m: the persistent inverted-index retrieval family plus late
round-4 widening — ops tooling, temporal joins, recsys, and SQL-surface
conformance.

Retrieval: build-once term-bucketed POSITIONAL postings probed without
rescanning the corpus (operators/invindex.py) in ranked-OR,
conjunctive-AND, and exact-phrase modes.  The index queries follow the
build-if-absent + probe lifecycle of ``zorder_pruned_scan`` and the
stored-IVF query: the layout materializes once per sf_dir under the
temp root, and the registered query is the READ path the layout exists
for.  BM25 oracles are the same SQL the scan-time ``bm25_rank`` is
checked against (ranking.bm25_oracle_sql) — the index is layout, not
semantics, so the stored-index probe must hash-match the from-scratch
computation exactly.

Also here: ``multimodal_blockhash`` (perceptual block-mean hash),
``ann_sq8`` (scalar-8-bit ANN tier), ``sql_group_by_all`` (GROUP BY
ALL / ORDER BY ALL through one shared SQL text), ``join_asof_tolerance``
and ``join_point_in_time`` (temporal-join widening over the as-of
kernel), ``skew_report_lineitem`` / ``snapshot_diff_orders`` (ops
tooling), ``brand_affinity_cf`` (item-item CF), and ``rfm_segments``
(RFM quintile census).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import invindex, ranking
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# Distinct from bm25_rank's query so the two retrieval paths don't share
# a cached result by accident; all three are mid-frequency corpus terms.
_IDX_TERMS = ["hash", "scan", "merge"]


# Layout format version: bump when the stored schema changes so a stale
# materialization from an earlier build is never probed (v2 = positional
# postings; v3 = bucket count recorded in <path>/meta).
_FMT = "v3"


def inverted_index_path(sf_dir: str) -> str:
    """Deterministic per-SF location of the stored inverted index.  The
    leaf carries the layout format version AND a content fingerprint of
    the source table, so a driver-side regeneration of documents.parquet
    (same path, new bytes — as happened to events between rounds 2 and
    3) relocates the layout and forces a rebuild instead of silently
    probing a stale index."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import (
        table_fingerprint,
    )

    leaf = os.path.basename(os.path.normpath(sf_dir))
    fp = table_fingerprint(sf_dir, "documents")
    return os.path.join(
        tempfile.gettempdir(),
        "spark_graft_invindex",
        leaf,
        "documents",
        f"{_FMT}-{fp}",
    )


def ensure_inverted_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the index once per source-table content version
    (write-once/probe-many); rebuild only when absent or when the
    source fingerprint changed (which changes the path)."""
    path = inverted_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "postings", "_SUCCESS")):
        invindex.build_inverted_index(
            load_table(spark, sf_dir, "documents"), path
        )
    return path


@query(
    "search_bm25_stored_index",
    oracle=ranking.bm25_oracle_sql(_IDX_TERMS, topk=50),
)
def search_bm25_stored_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval from the STORED inverted index: top-50 by BM25
    for a three-term query, reading ≤ 3 of the 64 postings bucket
    directories (static partition pruning, pinned in
    tests/test_round4m.py) plus the one-row stats and doclen tables —
    the corpus itself is never scanned.

    Scale: probe I/O is O(df of the query terms), independent of corpus
    size; df and scores derive from the pruned postings through the
    SAME score tree as the scan-time path, so this hash-matches the
    from-scratch BM25 oracle."""
    path = ensure_inverted_index(spark, sf_dir)
    return invindex.bm25_query_index(spark, path, _IDX_TERMS, topk=50)


_PHRASE = ["hash", "join"]


@query(
    "search_phrase_stored_index",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                  FROM documents)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
    WHERE t[i] = '{_PHRASE[0]}' AND t[i+1] = '{_PHRASE[1]}'
    GROUP BY doc_id
    """,
)
def search_phrase_stored_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase retrieval ("{p0} {p1}" as CONSECUTIVE tokens) from
    the positional index — the query class a bag-of-words index cannot
    answer; the oracle brute-scans every adjacent token pair while the
    engine intersects two pruned posting lists' positions and never
    reads the corpus (operators/invindex.py:phrase_query_index)."""
    path = ensure_inverted_index(spark, sf_dir)
    return invindex.phrase_query_index(spark, path, _PHRASE)


search_phrase_stored_index.__doc__ = search_phrase_stored_index.__doc__.format(
    p0=_PHRASE[0], p1=_PHRASE[1]
)


@query(
    "multimodal_blockhash",
    oracle=r"""
    WITH pos AS (SELECT doc_id, text, length(text) AS n,
                        unnest(generate_series(1, length(text))) AS i
                 FROM documents WHERE length(text) > 0),
    ch AS (SELECT doc_id, n, ((i - 1) * 64) // n AS j,
                  unicode(substr(text, i, 1)) AS cp
           FROM pos),
    blk AS (SELECT doc_id, ANY_VALUE(n) AS n, j,
                   CAST(SUM(cp) AS BIGINT) AS bs, COUNT(*) AS bl
            FROM ch GROUP BY doc_id, j),
    tot AS (SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS total
            FROM blk GROUP BY doc_id),
    bits AS (SELECT b.doc_id, b.j,
                    CASE WHEN b.bs * b.n > t.total * b.bl
                         THEN 1 ELSE 0 END AS bit
             FROM blk b JOIN tot t USING (doc_id))
    SELECT doc_id AS media_id,
      CAST(SUM(CASE WHEN j < 16 THEN bit * (1 << (15 - j)) ELSE 0 END)
           AS INT) AS b0,
      CAST(SUM(CASE WHEN j >= 16 AND j < 32
                    THEN bit * (1 << (31 - j)) ELSE 0 END) AS INT) AS b1,
      CAST(SUM(CASE WHEN j >= 32 AND j < 48
                    THEN bit * (1 << (47 - j)) ELSE 0 END) AS INT) AS b2,
      CAST(SUM(CASE WHEN j >= 48 THEN bit * (1 << (63 - j)) ELSE 0 END)
           AS INT) AS b3
    FROM bits GROUP BY doc_id
    """,
)
def multimodal_blockhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual block-mean hash of every media payload (blockhash.io
    over the decoded sample stream; exact integer cross-multiply per
    bit), emitted as the four 16-bit signature blocks the pigeonhole
    pair join consumes (operators/multimodal.py:blockhash64 /
    phash_pairs — the pair kernel itself is fixture-pinned in
    tests/test_round4m.py because THIS corpus's nearest payloads sit at
    hamming 10, above any pigeonhole-coverable threshold; the hash is
    what the driver can check exactly, on every doc).

    Scale: hash is one map-side Arrow pass over payloads (which never
    shuffle); output is (id, 4 ints) per media row."""
    from mapreducemovieanalysis_cloud_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") > 0
    )
    return multimodal.blockhash64(multimodal.documents_as_media(docs))


@query(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR
                THEN c.click_event_id END AS click_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE gate (pandas ``merge_asof(tolerance)``
    semantics): each purchase takes the latest prior click by the same
    user only if it happened within 1 hour — stale matches NULL out while
    the left row is kept.  The gate is evaluated post-window on the
    carried match timestamp (operators/joins.py:asof_join ``within``), so
    the plan is byte-identical to the ungated as-of: one key-partitioned
    exchange, no range explosion, zero extra shuffles."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    from mapreducemovieanalysis_cloud_spark.operators import joins

    joined = joins.asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        within=lambda lt, rt: F.unix_micros(lt) - F.unix_micros(rt)
        <= 3600 * 1_000_000,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "purchase_ts"
        ),
        F.col("click_event_id_right").alias("click_event_id"),
    )


@query(
    "join_point_in_time",
    oracle="""
    WITH e AS (SELECT user_id, event_id, ts, event_type FROM events),
    b AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                           OR lag(event_type) OVER w <> event_type
                         THEN 1 ELSE 0 END AS chg
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    v AS (SELECT *, SUM(chg) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS version FROM b),
    g0 AS (SELECT user_id, CAST(version AS BIGINT) AS version,
                  MIN(event_type) AS state, MIN(ts) AS vf
           FROM v GROUP BY 1, 2),
    g AS (SELECT * FROM (
            SELECT *, lead(vf) OVER (PARTITION BY user_id
                                     ORDER BY version) AS vt
            FROM g0)
          WHERE vt IS NULL OR vf <> vt),
    snaps AS (SELECT DISTINCT user_id,
                     date_trunc('hour', ts) + INTERVAL 30 MINUTE AS snap_ts
              FROM events)
    SELECT s.user_id AS user_id,
           strftime(s.snap_ts, '%Y-%m-%d %H:%M:%S') AS snap_ts,
           g.state AS state, g.version AS version
    FROM snaps s
    ASOF LEFT JOIN g ON s.user_id = g.user_id AND s.snap_ts >= g.vf
    """,
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: reconstruct every user's state at
    each half-hour snapshot mark from the SCD2 validity history the CDC
    kernel builds (`scd2_user_state`) — the warehouse op behind "what
    did the dimension look like when this fact happened".  Because SCD2
    runs are CONTIGUOUS per key (valid_to = next valid_from, last one
    open), the PIT lookup is EXACTLY the as-of-backward join on
    valid_from — one key-partitioned exchange, no interval explosion,
    no inequality join.  Snapshot marks before a user's first interval
    stay NULL (as-of left-outer semantics).  Zero-duration runs
    (valid_from = valid_to, from equal-timestamp state flips) are
    dropped first: a state that lasted zero time is not observable at
    any instant, and removing them is exactly what makes the remaining
    valid_from values strictly increasing per key — i.e., what makes
    the as-of lookup well-defined.

    Scale: intervals are run-length-bounded (one row per state change),
    snapshots are grid-bounded; both shuffle once on the key."""
    from mapreducemovieanalysis_cloud_spark.operators import cdc, joins

    events = load_table(spark, sf_dir, "events")
    iv = (
        cdc.scd2_intervals(
            events,
            key_col="user_id",
            ts_col="ts",
            state_col="event_type",
            tiebreak_col="event_id",
            formatted=False,
        )
        .where(
            F.col("valid_to").isNull()
            | (F.col("valid_from") != F.col("valid_to"))
        )
        .select(
            "user_id",
            F.col("valid_from").alias("vf"),
            "state",
            "version",
        )
    )
    snaps = events.select(
        "user_id",
        (
            F.date_trunc("hour", F.col("ts"))
            + F.expr("INTERVAL 30 MINUTES")
        ).alias("snap_ts"),
    ).distinct()
    pit = joins.asof_join(
        snaps, iv, key="user_id", left_ts="snap_ts", right_ts="vf"
    )
    return pit.select(
        "user_id",
        F.date_format("snap_ts", "yyyy-MM-dd HH:mm:ss").alias("snap_ts"),
        F.col("state_right").alias("state"),
        F.col("version_right").alias("version"),
    )


@query(
    "brand_affinity_cf",
    oracle="""
    WITH basket AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
                    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM basket GROUP BY 1),
    co AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
                  CAST(COUNT(*) AS BIGINT) AS co
           FROM basket a JOIN basket b
             ON a.okey = b.okey AND a.brand < b.brand
           GROUP BY 1, 2)
    SELECT co.brand_a, co.brand_b, co.co AS co_orders,
           (co.co / sqrt(CAST(na.n * nb.n AS DOUBLE))) AS cosine
    FROM co JOIN n na ON na.brand = co.brand_a
            JOIN n nb ON nb.brand = co.brand_b
    ORDER BY cosine DESC, brand_a, brand_b LIMIT 50
    """,
)
def brand_affinity_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering affinity: cosine-normalized
    basket co-occurrence, ``co(a,b) / sqrt(n_a · n_b)`` — the recsys
    similarity kernel that raw co-purchase counts
    (`copurchase_brand_pairs`) are NOT: dividing by both items'
    popularity surfaces genuine affinity instead of "everything
    co-occurs with the most popular brand".  The score is one IEEE
    divide over a sqrt of an exact int64 product — identical expression
    tree on both engines, so the double hashes bit-exactly (the
    ann-cosine precedent).

    Scale: basket distinct + two grouped counts + the basket-bounded
    self-join (the same candidate generation as co-purchase, capped per
    order); top-50 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    basket = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = basket.groupBy("brand").agg(F.count(F.lit(1)).alias("n"))
    co = (
        basket.alias("a")
        .join(basket.alias("b"), "okey")
        .where(F.col("a.brand") < F.col("b.brand"))
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return (
        co.join(
            n.select(F.col("brand").alias("brand_a"), F.col("n").alias("na")),
            "brand_a",
        )
        .join(
            n.select(F.col("brand").alias("brand_b"), F.col("n").alias("nb")),
            "brand_b",
        )
        .select(
            "brand_a",
            "brand_b",
            F.col("co").alias("co_orders"),
            (
                F.col("co")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
            ).alias("cosine"),
        )
        .orderBy(
            F.col("cosine").desc(),
            F.col("brand_a").asc(),
            F.col("brand_b").asc(),
        )
        .limit(50)
    )


@query(
    "rfm_segments",
    oracle="""
    WITH m AS (SELECT o_custkey,
                      MAX(o_orderdate) AS last_order,
                      CAST(COUNT(*) AS BIGINT) AS freq,
                      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) AS monetary_cents
               FROM orders GROUP BY 1),
    q AS (SELECT o_custkey,
                 NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_q,
                 NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
                 NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey)
                   AS m_q
          FROM m)
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM q GROUP BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) —
    the customer-analytics staple: one aggregate collapses orders to one
    row per customer, three NTILE(5) rankings (each deterministic via
    the custkey tie-break) assign quintiles with 1 = best, and the
    output is the segment-cell census.  Exact: monetary in integer
    cents; recency ranks on the raw order date (no 'days since' clock
    dependence, so the query is reproducible at any run time).

    Scale: the windows rank the CUSTOMER table (one row per customer,
    orders-of-magnitude smaller than the fact); at extreme customer
    counts NTILE's single-partition sort is replaced by the md5-bucket
    equidepth pattern (`histogram_equidepth`) — documented tier, same
    output contract."""
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT)"
            ).alias("monetary_cents"),
        )
    )
    from pyspark.sql import Window

    r_w = Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    f_w = Window.orderBy(F.col("freq").desc(), F.col("o_custkey"))
    m_w = Window.orderBy(
        F.col("monetary_cents").desc(), F.col("o_custkey")
    )
    return (
        m.select(
            F.ntile(5).over(r_w).cast("int").alias("r_q"),
            F.ntile(5).over(f_w).cast("int").alias("f_q"),
            F.ntile(5).over(m_w).cast("int").alias("m_q"),
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "skew_report_lineitem",
    oracle="""
    WITH c AS (SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_keys FROM c)
    SELECT key, cnt,
           CAST(cnt * 1000 // total AS BIGINT) AS permille,
           CAST(cnt * n_keys > 4 * total AS INT) AS skewed,
           CAST((cnt * n_keys + 4 * total - 1) // (4 * total) AS BIGINT)
             AS salt_factor
    FROM c, t
    ORDER BY cnt DESC, key ASC LIMIT 10
    """,
)
def skew_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for the fact table's supplier key — the
    detector that decides WHEN the salted-join kernel
    (operators/skew.py, `salted_hot_key_agg`) is worth its extra
    exchange: top-10 heaviest keys with exact-integer share (permille),
    a >4x-mean skew flag (cross-multiplied, no division), and the
    ceil-ratio salt factor a skewed key would need to flatten back to
    ~4x mean.  The ops-tooling read path of the skew family.

    Scale: ONE count aggregate over the fact (map-side partials), a
    one-row totals broadcast, and a TakeOrderedAndProject — no sort of
    the key space."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = c.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "key",
            "cnt",
            F.expr("CAST(cnt * 1000 div total AS BIGINT)").alias(
                "permille"
            ),
            F.expr("CAST(cnt * n_keys > 4 * total AS INT)").alias(
                "skewed"
            ),
            F.expr(
                "CAST((cnt * n_keys + 4 * total - 1) div (4 * total)"
                " AS BIGINT)"
            ).alias("salt_factor"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(10)
    )


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_orderstatus,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        AS price_cents
               FROM orders),
    b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 5 = 0 THEN price_cents + 100
                  ELSE price_cents END AS price_cents
      FROM a WHERE o_orderkey % 7 <> 3
      UNION ALL
      SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM a), 'N',
             CAST(0 AS BIGINT)
      FROM a WHERE o_orderkey % 97 = 0)
    SELECT CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN a.o_orderstatus <> b.o_orderstatus
                     OR a.price_cents <> b.price_cents THEN 'changed'
                ELSE 'same' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    GROUP BY 1
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: key-keyed FULL OUTER diff of two table
    versions into added / removed / changed / same counts — the
    migration-audit twin of the MERGE kernel (`merge_upsert_orders`
    APPLIES a change batch; this MEASURES the drift between two
    materializations, the check you run after any backfill or engine
    swap).  The second snapshot is derived deterministically (updates on
    key % 5, deletes on key % 7 = 3, inserts past MAX(key)) so both
    engines diff identical inputs.

    Scale: one key-partitioned full outer join, counts collapse
    map-side; at 100 TB both sides bucket-partition by the key and the
    join is co-located."""
    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
    )
    max_key = a.agg(F.max("o_orderkey").alias("m"))
    b = (
        a.where(F.col("o_orderkey") % 7 != 3)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("price_cents") + 100
            )
            .otherwise(F.col("price_cents"))
            .alias("price_cents"),
        )
        .unionByName(
            a.where(F.col("o_orderkey") % 97 == 0)
            .crossJoin(F.broadcast(max_key))
            .select(
                (F.col("o_orderkey") + F.col("m") + 1).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(0).cast("long").alias("price_cents"),
            )
        )
    )
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full"
    )
    status = (
        F.when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(
            (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
            | (F.col("a.price_cents") != F.col("b.price_cents")),
            F.lit("changed"),
        )
        .otherwise(F.lit("same"))
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


_SQ8_QUANT = (
    "list_transform({v}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)"
    " AS BIGINT))"
)


@query(
    "ann_sq8",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id,
                      {_SQ8_QUANT.format(v='embedding')} AS qv
               FROM embeddings WHERE vec_id < 5),
    e AS (SELECT vec_id, {_SQ8_QUANT.format(v='embedding')} AS v
          FROM embeddings),
    comp AS (SELECT vec_id, d, v[d] AS x
             FROM e, unnest(generate_series(1, len(v))) AS g(d)),
    st AS (SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM comp GROUP BY d),
    rec AS (SELECT vec_id, comp.d,
              CASE WHEN mx = mn THEN mn
                   ELSE mn + (((x - mn) * 255) // (mx - mn)) * (mx - mn)
                        // 255
              END AS r
            FROM comp JOIN st USING (d)),
    dist AS (SELECT q.query_id, rec.vec_id AS neighbor_id,
                    CAST(SUM((q.qv[rec.d] - rec.r)
                             * (q.qv[rec.d] - rec.r)) AS BIGINT) AS dist_sq
             FROM q, rec WHERE rec.vec_id <> q.query_id
             GROUP BY 1, 2)
    SELECT query_id, neighbor_id, dist_sq, CAST(rank AS INT) AS rank FROM (
      SELECT query_id, neighbor_id, dist_sq,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dist_sq, neighbor_id) AS rank
      FROM dist)
    WHERE rank <= 10
    """,
)
def ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-8-bit-quantized ANN (Faiss SQ8): top-10 per query by exact
    int64 squared-L2 against the per-dim [min, max]-coded reconstruction
    (operators/similarity.py:sq8_topk) — the codebook-free compression
    tier between raw brute force and PQ (4 bytes/dim -> 1), completing
    the spectrum brute -> SRP-LSH -> IVF -> SQ8 -> PQ -> IVF-PQ.

    Scale: one 64-key posexplode aggregate broadcasts the dim ranges;
    encoding is map-side; queries broadcast; only scored triples shuffle
    into the rank window."""
    from mapreducemovieanalysis_cloud_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.sq8_topk(emb, queries, k=10)


_GBA_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS rev_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """


@query("sql_group_by_all", oracle=_GBA_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL conformance through the ``spark.sql``
    entry path — the analyst-SQL ergonomic both engines resolve to
    grouping on every non-aggregate select item and ordering by the full
    output row; ONE SQL string runs verbatim on Spark and DuckDB (the
    strongest possible surface-parity check, like tpch_q6's shared
    text).  Plan is the ordinary partial/final hash aggregate + sort."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(_GBA_SQL)


@query(
    "search_conjunctive_stored_index",
    oracle=ranking.bm25_oracle_sql(_IDX_TERMS, topk=50, require_all=True),
)
def search_conjunctive_stored_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conjunctive-AND retrieval (docs containing ALL three query terms,
    BM25-ranked) from the same stored index — the boolean-retrieval mode
    layered on the identical probe: the n_terms_hit count the ranked
    mode already computes becomes the AND gate, no second pass over
    postings."""
    path = ensure_inverted_index(spark, sf_dir)
    return invindex.bm25_query_index(
        spark, path, _IDX_TERMS, topk=50, require_all=True
    )
