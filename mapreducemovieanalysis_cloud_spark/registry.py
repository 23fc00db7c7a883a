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


# The driver's correctness run covers a bounded prefix of the registry (50
# entries in round 1), so registration order is a coverage decision, not a
# style one: the hardest-to-oracle families (TPC-H joins/aggregates,
# streaming windows, the approximate dedup/ANN/multimodal pipeline) come
# first; the long relational tail — every entry of which already has a green
# CORRECTNESS_r01 row — fills the remaining slots in original order.
_PRIORITY = [
    # The driver's correctness run covers a bounded prefix (50 entries in
    # r1), so every slot here goes to a query with NO green CORRECTNESS
    # row yet. movie_rank / movie_rating / movie_rank_desc and the whole
    # relational tail earned green rows in CORRECTNESS_r01 and their code
    # is unchanged — they cede their slots to never-driver-checked
    # queries (r2 additions bm25_rank, ann_pq at the end of the window).
    # TPC-H (driver-unchecked in r1)
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue",
    "tpch_q21_suppliers_waiting",
    "tpch_q22_global_sales",
    # streaming (driver-unchecked in r1)
    "window_tumbling",
    "window_sliding",
    "window_session",
    "join_interval_events",
    # pipeline operators driver-unchecked in r1
    "curate_corpus",
    "decontaminate_batch",
    "dedup_minhash_lsh",
    "fingerprint_winnow",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "dedup_embedding_cosine",
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_features",
    "kmeans_embeddings",
    "dedup_clusters",
    # curation batch (new in r2: repetition/balancing/PII/sessionization)
    "repetition_stats",
    "ngram_corpus_topk",
    "token_doc_freq",
    "per_source_cap",
    "pii_scrub",
    "sessionize_events",
    "pagerank_trade_graph",
    "join_range_binned",
    "variant_extract",
    "cms_heavy_hitters",
    "profile_orders",
    "sample_stratified_lang",
    # round-2c additions with the most oracle-fragile surface: the BM25
    # IEEE float tree and the three-stage iterative PQ index
    "bm25_rank",
    "ann_pq",
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
    except ImportError:
        pass  # modules land incrementally; reference queries are the floor
    _LOADED = True
