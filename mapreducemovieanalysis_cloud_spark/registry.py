"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame plus
its DuckDB oracle SQL.

This is the engine's public query surface and the driver's correctness gate
(__spark_entry__.py contract): each entry runs on the driver-provided parquet
tables (TESTDATA.md) and must hash-match its oracle at sf=0.01. Column names
are aliased identically on both sides; float aggregates are rounded on both
sides so fp summation order can't flip the hash; timestamps are formatted to
strings on both sides.

Keys are grouped by SURVEY.md §2 operator family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness run covers a bounded prefix of the registry
# (~50 entries), so registration order is a coverage decision, not a style
# one.  Policy (round 3): first every query with NO green CORRECTNESS row
# in any round — the r2c/late-r2 additions that registered past the window
# (ADVICE r2) plus multimodal_features, whose r2 row errored on an
# array-typed output column (now CSV-serialized); then new round-3
# queries; then rotation slots re-checking entries whose only green row is
# from round 1, oldest coverage first, so drift anywhere surfaces within
# two rounds.
_PRIORITY = [
    # --- no driver row yet: TPC-H adaptations registered past the r2
    # window (ADVICE r2 medium) ---
    "tpch_q2_best_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_count",
    "tpch_q20_promotion_suppliers",
    # --- no driver row yet: round-2c scale-path operators ---
    "join_bloom_prefilter",
    "duplicate_passages",
    "scd2_user_state",
    "histogram_totalprice",
    "triangle_counts_suppliers",
    "resample_hourly_locf",
    "funnel_conversion",
    "outliers_value_z",
    # --- no driver row yet: late round-2 additions ---
    "negative_pairs",
    "tokenize_to_ids",
    "user_event_sequences",
    "arrow_batch_norms",
    "histogram_equidepth",
    "user_value_trend",
    # --- r2 row errored (unhashable array column); output now
    # CSV-serialized — needs a green re-check ---
    "multimodal_features",
    # --- round-3 additions get slots here (keep above the rotation) ---
    "cohort_retention",
    "outliers_value_mad",
    "merge_upsert_orders",
    "quality_classifier",
    "bigram_pmi",
    "semantic_dedup",
    "trigram_lm_score",
    "stream_first_seen",
    "ann_ivf_pq",
    "recursive_user_hierarchy",
    "lateral_top_customers",
    "pack_sequences",
    "train_mix_sample",
    "join_interval_events_outer",
    "curriculum_buckets",
    "join_asof_forward",
    "decimal_revenue",
    "listagg_order_priorities",
    "null_semantics",
    "setops_all_variants",
    "filtered_aggregates",
    "window_value_functions",
    "dedup_clusters_star",
    # --- rotation: green only in CORRECTNESS_r01, code unchanged;
    # re-checked oldest-first to bound staleness of every green row ---
    "movie_rank",
    "movie_rating",
    "join_asof",
    "join_theta_range",
    "join_full_outer",
    "window_trailing_range",
    "window_topk_per_group",
    "window_analytics",
    "cube_qty",
    "grouping_sets",
    "percentile_approx_disc",
    "approx_distinct",
    "pivot_returnflag",
    "unpivot_part",
    "json_struct",
    "subquery_correlated",
    "pandas_udaf_median",
    "udtf_char_bigrams",
    "grouped_map_top2",
    "salted_hot_key_agg",
    "dedup_jaccard",
    "dedup_exact",
    "fingerprint_docs",
    "quality_score",
    "lang_id",
    "explode_tokens",
    "map_functions",
    "array_functions",
    "setops_intersect",
]


def _ordered(d: dict) -> dict:
    ordered = {n: d[n] for n in _PRIORITY if n in d}
    ordered.update((n, v) for n, v in d.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import mapreducemovieanalysis_cloud_spark.queries.reference_queries  # noqa: F401

    try:
        import mapreducemovieanalysis_cloud_spark.queries.relational  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.relational2  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.functions_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.pipeline_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.curation_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.graph_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.streaming_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.tpch_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.scale_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.round3_queries  # noqa: F401
    except ImportError:
        pass  # modules land incrementally; reference queries are the floor
    _LOADED = True
