"""Round-4 second wave: tokenizer-training statistics, distributed PCA's
corpus pass, symmetric-delete fuzzy matching, and market-basket pair
mining — four more training-pipeline staples, each oracle-checked.

Exactness discipline: every float leaves the plan as exact int64 (the PCA
Gram quantizes vector components BEFORE multiplying, so no summation-order
drift can exist even in principle); counts are int64; string surfaces
reuse the engine's ``split(trim(text), '\\s+')`` convention that is
bit-compatible with DuckDB's ``string_split_regex``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import bpe, linkage, pca
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- BPE training: the corpus-pass statistic --------------------------------

_BPE_TOPK = 50


@query(
    "bpe_pair_counts",
    oracle=rf"""
    WITH words AS (
      SELECT w AS word, count(*) AS freq
      FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents)
      WHERE len(w) > 0 GROUP BY w)
    SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b,
           CAST(SUM(freq) AS BIGINT) AS cnt
    FROM words, unnest(generate_series(1, length(word) - 1)) AS g(i)
    GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT {_BPE_TOPK}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} weighted adjacent character pairs over the word-type table —
    BPE training's iteration-zero statistic, i.e. the only part of the
    tokenizer fit that touches the corpus (operators/bpe.py; the full
    iterative trainer is pinned merge-for-merge against a pure-Python
    reference in tests/test_round4b.py, since a merge LOOP is not
    one SQL statement).

    Scale: one corpus scan -> word-type aggregate (Heaps-law-bounded
    output), then pair counting runs on types x word-length only.  The
    deterministic (cnt DESC, a, b) top-k is a TakeOrderedAndProject — no
    global sort materializes."""
    words = bpe.word_freq(load_table(spark, sf_dir, "documents"))
    return (
        bpe.pair_counts(bpe.initial_symbol_table(words))
        .orderBy(F.desc("cnt"), "a", "b")
        .limit(_BPE_TOPK)
    )


bpe_pair_counts.__doc__ = bpe_pair_counts.__doc__.format(k=_BPE_TOPK)


# ---- distributed PCA: the corpus pass ---------------------------------------

_PCA_SCALE = 1_000_000


@query(
    "pca_gram",
    oracle=f"""
    WITH q AS (SELECT [CAST(ROUND(CAST(x AS DOUBLE) * {_PCA_SCALE}) AS BIGINT)
                       for x in embedding] AS qe
               FROM embeddings)
    SELECT i, j, CAST(SUM(qe[i] * qe[j]) AS BIGINT) AS g_q
    FROM q, unnest(generate_series(1, 64)) AS g1(i),
         unnest(generate_series(1, 64)) AS g2(j)
    WHERE i <= j GROUP BY i, j
    """,
)
def pca_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix of the embedding corpus in exact int64
    micro-units — distributed PCA's single corpus pass (operators/pca.py;
    the d x d eigendecomposition and the map-only projection it feeds are
    verified against numpy's full PCA in tests/test_round4b.py).

    Scale: each Arrow batch contributes one int64 matmul and shuffles
    d(d+1)/2 = 2 080 cells; the corpus itself never shuffles.  Quantizing
    components BEFORE multiplication makes every cell exact integer
    arithmetic — a float dot-product would hash-differ from any serial
    oracle through summation order alone."""
    return pca.gram_matrix(
        load_table(spark, sf_dir, "embeddings"),
        vec_col="embedding",
        scale=_PCA_SCALE,
    )


# ---- symmetric-delete fuzzy join --------------------------------------------


@query(
    "fuzzy_name_pairs",
    oracle="""
    SELECT a.c_name AS name_a, b.c_name AS name_b
    FROM customer a JOIN customer b ON a.c_name < b.c_name
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 entity pairs over customer names via
    symmetric-delete blocking + exact levenshtein verify
    (operators/linkage.py).

    The oracle states the O(n^2) naive join (fine at sf0.01: 2.25 M
    comparisons); the Spark plan is the linear-blocking equi-join — the
    point of registering both is precisely that the results must be
    identical while the plans are not.  Scale: (L + 1) x n short blocking
    keys, one shuffle, candidates driven by near-duplicate density."""
    return linkage.fuzzy_pairs(
        load_table(spark, sf_dir, "customer"), "c_name", max_dist=1
    )


# ---- market-basket pair mining ----------------------------------------------

_BASKET_TOPK = 50


@query(
    "copurchase_brand_pairs",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM basket a JOIN basket b ON a.okey = b.okey AND a.brand < b.brand
    GROUP BY 1, 2 ORDER BY n_orders DESC, brand_a, brand_b
    LIMIT {_BASKET_TOPK}
    """,
)
def copurchase_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} co-purchased brand pairs (support counting over order
    baskets) — the frequent-itemset / recommender-affinity staple.

    Scale: lineitem->part is a key-partitioned equi-join (AQE broadcasts
    the dimension when it fits); each order's distinct-brand set is then
    ONE ``collect_set`` aggregate — a single okey-keyed shuffle that
    also dedups, replacing the earlier distinct + self-join shape that
    recomputed the whole basket subtree on both join sides and paid
    three exchanges for what the set-fold pays once.  Pair emission is
    map-side (i<j over the sorted set), quadratic only in BASKET size,
    which TPC-H bounds at 7 lines — unbounded baskets get capped
    upstream with ``curation.cap_per_group``, the standard guard.  Pair
    counting shuffles one row per in-order pair with map-side partials;
    the deterministic top-k is a TakeOrderedAndProject."""
    basket_sets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
            load_table(spark, sf_dir, "part").select(
                "p_partkey", "p_brand"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )
    # bs is a materialized column (plain attribute ref), so referencing
    # it inside the lambdas is free — cf. the HOF-CSE hazard note on
    # char_entropy_docs.
    pairs = basket_sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("bs"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("bs"),
                            i + F.lit(2),
                            F.size(F.col("bs")),
                        ),
                        lambda y: F.struct(
                            x.alias("brand_a"), y.alias("brand_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(_BASKET_TOPK)
    )


copurchase_brand_pairs.__doc__ = copurchase_brand_pairs.__doc__.format(
    k=_BASKET_TOPK
)
