"""Plan-quality regression tests: the properties that matter at 100 TB,
pinned on the actual physical plans (SURVEY §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import plans, registry
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table


def test_reference_queries_broadcast_the_dim(spark, sf_dir):
    """J1: the movies/part side must broadcast — the facts side never
    shuffles for the join (the reference's DistributedCache replication,
    done right)."""
    for name in ("movie_rank", "movie_rating"):
        df = registry.queries()[name](spark, sf_dir)
        assert plans.uses_broadcast_join(df), name
        assert not plans.uses_sort_merge_join(df), name


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000.0
    )
    pushed = plans.pushed_filters(df)
    assert any("o_totalprice" in p for p in pushed), pushed


def test_column_pruning_shrinks_scan(spark, sf_dir):
    """movie_rank projects 1 column of lineitem and 2 of part — the scans
    must not read anything else."""
    df = registry.queries()["movie_rank"](spark, sf_dir)
    schemas = plans.read_schema_columns(df)
    assert schemas, "no scans found"
    for cols in schemas:
        assert set(cols) <= {"l_partkey", "p_partkey", "p_name"}, cols


def test_topk_plans_as_take_ordered(spark, sf_dir):
    """Global top-k must use per-partition heaps, never a full sort."""
    df = registry.queries()["topk_global"](spark, sf_dir)
    assert plans.uses_take_ordered(df), plans.executed_plan(df)


def test_whole_stage_codegen_covers_reference_query(spark, sf_dir):
    df = registry.queries()["movie_rating"](spark, sf_dir)
    assert plans.whole_stage_codegen_spans(df) >= 2


def test_semi_join_does_not_materialize_payload(spark, sf_dir):
    """left_semi scans only the join key + filter column from orders."""
    df = registry.queries()["join_semi"](spark, sf_dir)
    schemas = plans.read_schema_columns(df)
    for cols in schemas:
        assert set(cols) <= {
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "o_custkey",
            "o_totalprice",
        }, cols


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "true"
    )


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Hive-partitioned sink + partition-pruned scan (the events-by-day
    pattern): reading one partition must not list the others."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import write_table

    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_table(events, path, partition_by=("day",))
    one_day = spark.read.parquet(path).where(F.col("day") == "2024-01-05")
    text = plans.explain_formatted(one_day)
    assert "PartitionFilters" in text
    n_total = events.count()
    n_day = one_day.count()
    assert 0 < n_day < n_total


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with ZERO Exchange operators — the write-once/join-many layout
    for recurring fact-fact joins at 100 TB."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        write_bucketed,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "orders_b", ("o_orderkey",), 4,
                   sort_by=("o_orderkey",))
    write_bucketed(lineitem, "lineitem_b", ("l_orderkey",), 4,
                   sort_by=("l_orderkey",))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("orders_b").join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = plans.executed_plan(joined)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            assert "Bucketed: true" in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _exchanges(plan: str) -> int:
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )


def test_single_exchange_series_kernels(spark, sf_dir):
    """The round-4h/4j design claim, pinned: CUSUM, the MAD profile, and
    the winsorized mean each move data exactly ONCE — ordered windows,
    unordered totals windows, and the final aggregate all share one hash
    partitioning on the series/group key. A refactor that re-introduces
    the totals-join-back shape fails here before any probe sees it."""
    for name in (
        "cusum_user_value",
        "mad_outliers_by_type",
        "winsorized_orders_by_priority",
    ):
        df = registry.queries()[name](spark, sf_dir)
        plan = plans.executed_plan(df)
        assert _exchanges(plan) == 1, (name, _exchanges(plan))
        assert plan.count("FileScan") == 1, name


def test_grid_collapse_kernels_shuffle_domain_not_rows(spark, sf_dir):
    """Time intelligence and the percentile bands collapse the fact to a
    bounded grid in their FIRST aggregate; everything downstream (windows,
    dimension joins) must not add a rows-proportional exchange. Pinned as:
    no SortMergeJoin anywhere (dims broadcast), and the band rollup is a
    single exchange."""
    ti = registry.queries()["time_intelligence_nation"](spark, sf_dir)
    assert not plans.uses_sort_merge_join(ti)
    bands = registry.queries()["percentile_bands_type_hod"](spark, sf_dir)
    assert _exchanges(plans.executed_plan(bands)) == 1


def test_text_never_shuffles_in_dedup_and_retrieval(spark, sf_dir):
    """The text families' 100 TB posture, pinned from the plan: raw
    document ``text`` must never appear in any Exchange's input — the
    map-side pass fingerprints/shingles/tokenizes, and only ids,
    hashes, signatures, terms, and integer stats may shuffle.  Letting
    the text column reach an exchange multiplies shuffle volume by the
    document size (the difference between shuffling 16-byte
    fingerprints and shuffling the corpus).  Same pin shape as the
    multimodal payload test (tests/test_multimodal_properties.py)."""
    qs = registry.queries()
    for name in (
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_jaccard",
        "containment_pairs",
        "lsh_band_collision_stats",
        "bm25_rank",
        "decontaminate_batch",
        "duplicate_passages",
    ):
        for cols in plans.exchange_input_columns(qs[name](spark, sf_dir)):
            assert "text" not in cols, (name, cols)
    # non-vacuity: the helper must see real shuffles in these plans
    found = plans.exchange_input_columns(
        qs["dedup_minhash_lsh"](spark, sf_dir)
    )
    assert found


def test_store_consumers_never_rescan_the_facts(spark, sf_dir):
    """The incremental-store contract, pinned from the plan: once the
    store exists (the warm-up call builds it), a consumer's plan must
    scan ONLY store paths — no fact-table parquet under the testdata
    dir may appear anywhere in its formatted plan.  A consumer that
    quietly falls back to re-deriving from facts keeps passing its
    oracle while throwing away the store's entire 100 TB advantage
    (partials instead of a corpus re-scan); this fails it at CI time.
    Non-vacuity: a fact query's plan DOES carry the testdata path."""
    qs = registry.queries()
    for name in (
        "incremental_graph_edges",
        "stored_graph_triangles",
        "incremental_distinct_users",
        "incremental_source_overlap",
        "search_bm25_stored_index",
        "incremental_minhash_dedup",
    ):
        df = qs[name](spark, sf_dir)  # build-if-absent runs here
        plan = plans.explain_formatted(df)
        assert sf_dir not in plan, name
    control = plans.explain_formatted(qs["movie_rank"](spark, sf_dir))
    assert sf_dir in control
