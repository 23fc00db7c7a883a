"""Round-4e tests: oracle diffs plus the stochastic-matrix and
histogram-mass invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from tests.oracle import assert_matches_oracle

ROUND4E = ("event_transition_matrix", "histogram2d_price_qty")


@pytest.mark.parametrize("name", ROUND4E)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4E)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


def test_transition_matrix_is_row_stochastic(spark, sf_dir):
    """Each row's counts sum to the row total (milli probabilities sum to
    ~1000 up to truncation), and total transitions = total events minus
    one per active user (a length-L sequence has L-1 transitions)."""
    out = registry.queries()["event_transition_matrix"](
        spark, sf_dir
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    for src, rows in by_src.items():
        p_sum = sum(r["p_milli"] for r in rows)
        assert 1000 - len(rows) <= p_sum <= 1000, src
    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in out) == n_events - n_users


def test_histogram2d_mass_conservation(spark, sf_dir):
    """Total histogram mass equals the join cardinality (= lineitem rows,
    every line has exactly one order), and bins are non-negative."""
    out = registry.queries()["histogram2d_price_qty"](
        spark, sf_dir
    ).collect()
    n_lines = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n"] for r in out) == n_lines
    for r in out:
        assert r["n"] > 0
        assert r["price_bin"] >= 0 and r["qty_bin"] >= 0


ROUND4E_B = ("drop_repeated_segments", "target_encode_segment")


@pytest.mark.parametrize("name", ROUND4E_B)
def test_matches_oracle_small_b(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4E_B)
def test_matches_oracle_sf001_b(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


def test_drop_repeated_segments_semantics(spark):
    """A crafted doc with an exact repeated segment loses the SECOND
    occurrence only; a repeat-free doc passes through identical."""
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd aa bb ee ff"),  # segment 'aa bb' repeats
            (2, "gg hh ii jj"),
        ],
        "doc_id LONG, text STRING",
    )
    from pyspark.sql import functions as FF

    t = docs.select(
        "doc_id", FF.expr(r"split(trim(text), '\\s+')").alias("w")
    )
    out = {
        r["doc_id"]: (r["cleaned"], r["n_kept"], r["n_dropped"])
        for r in _run_segment_dedup(spark, t).collect()
    }
    assert out[1] == ("aa bb cc dd ee ff", 3, 1)
    assert out[2] == ("gg hh ii jj", 2, 0)


def _run_segment_dedup(spark, t):
    """Inline copy of the segment-dedup pipeline over a prepared (doc_id,
    w) frame, sharing the query's constants."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as FF

    from mapreducemovieanalysis_cloud_spark.queries.round4e_queries import (
        _SEG_WORDS as w,
    )

    segs = t.select(
        "doc_id",
        FF.explode(
            FF.expr(
                f"transform(sequence(1, CAST(ceil(size(w) / {w}.0D) AS INT)),"
                f" i -> struct(i AS i,"
                f"  array_join(slice(w, (i - 1) * {w} + 1, {w}), ' ')"
                f"  AS seg))"
            )
        ).alias("s"),
    ).select("doc_id", FF.col("s.i").alias("i"), FF.col("s.seg").alias("seg"))
    keep = segs.withColumn(
        "rn",
        FF.row_number().over(W.partitionBy("doc_id", "seg").orderBy("i")),
    )
    return keep.groupBy("doc_id").agg(
        FF.array_join(
            FF.transform(
                FF.array_sort(
                    FF.collect_list(
                        FF.when(FF.col("rn") == 1, FF.struct("i", "seg"))
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("cleaned"),
        FF.sum((FF.col("rn") == 1).cast("long")).alias("n_kept"),
        FF.sum((FF.col("rn") > 1).cast("long")).alias("n_dropped"),
    )


def test_drop_repeated_segments_fires_on_corpus(spark, oracle_sf_dir):
    """The corpus actually contains within-doc repeats — the transform
    must drop something somewhere (else the test proves nothing)."""
    out = registry.queries()["drop_repeated_segments"](
        spark, oracle_sf_dir
    )
    total_dropped = out.agg(F.sum("n_dropped")).collect()[0][0]
    assert total_dropped > 0


def test_target_encoding_shrinks_toward_prior(spark, sf_dir):
    """Every encoded value sits between the raw category mean and the
    global mean — the defining property of additive smoothing."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    j = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .join(
            load_table(spark, sf_dir, "orders").select(
                "o_custkey", "o_totalprice"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    raw = {
        r["seg"]: r["s"] / r["n"]
        for r in j.groupBy("seg")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tot = j.agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    trow = tot.collect()[0]
    prior = trow["s"] / trow["n"]
    out = registry.queries()["target_encode_segment"](spark, sf_dir)
    for r in out.collect():
        lo, hi = sorted((raw[r["segment"]], prior))
        assert lo - 1 <= r["encoded_cents"] <= hi + 1, r


def test_transition_matrix_single_event_shuffle(spark, sf_dir):
    """Events shuffle once (user-keyed window); the normalizing join
    runs on the checkpointed event-type-squared matrix."""
    from mapreducemovieanalysis_cloud_spark import plans

    df = registry.queries()["event_transition_matrix"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "CartesianProduct" not in plan


def test_profile_approx_within_hll_tolerance(spark, oracle_sf_dir):
    """The HLL profile tier agrees with the exact profile on every
    metric except n_distinct, and its distinct estimates sit within
    3x the configured relative error. NEITHER plan may contain an
    Expand: the approx tier never had one, and the exact tier's
    union-of-pruned-scans shape exists precisely to avoid the N-fold
    row amplification a mixed count_distinct aggregate plans into."""
    from mapreducemovieanalysis_cloud_spark import plans
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        profile_columns,
        profile_columns_approx,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    orders = load_table(spark, oracle_sf_dir, "orders")
    exact = {
        r["column_name"]: r
        for r in profile_columns(orders, cols).collect()
    }
    approx_df = profile_columns_approx(orders, cols, rsd=0.05)
    assert "Expand" not in plans.executed_plan(approx_df)
    assert "Expand" not in plans.executed_plan(
        profile_columns(orders, cols)
    )
    for r in approx_df.collect():
        e = exact[r["column_name"]]
        assert r["n_rows"] == e["n_rows"]
        assert r["n_nulls"] == e["n_nulls"]
        assert r["min_value"] == e["min_value"]
        assert r["max_value"] == e["max_value"]
        rel = abs(r["n_distinct"] - e["n_distinct"]) / max(
            e["n_distinct"], 1
        )
        assert rel <= 0.15, (r["column_name"], rel)


def test_ann_multiband_matches_oracle_both_sf(spark, sf_dir, oracle_sf_dir):
    sql = registry.oracle_sql()["ann_lsh_multiband"]
    q = registry.queries()["ann_lsh_multiband"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_multiband_recall_beats_single_band(spark, oracle_sf_dir):
    """The point of banding, measured: at the SAME plane count, OR-ing 6
    bands must strictly beat one band's recall@10 against brute-force
    ground truth."""
    from mapreducemovieanalysis_cloud_spark.operators import similarity
    from mapreducemovieanalysis_cloud_spark.operators.evaluation import (
        recall_at_k,
    )

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, qs, k=10).localCheckpoint()

    def mean_recall(approx):
        rows = recall_at_k(approx, exact, k=10).collect()
        return sum(r["recall_micro"] for r in rows) / len(rows)

    single = mean_recall(
        similarity.ann_lsh_topk(emb, qs, k=10, num_planes=6, dim=64)
    )
    multi = mean_recall(
        similarity.ann_lsh_multiband_topk(
            emb, qs, k=10, num_planes=6, num_bands=6
        )
    )
    assert multi >= 3 * single  # banding is a multiple, not a nudge
    assert multi >= 150_000  # and absolutely non-trivial on this corpus


def test_corr_matrix_matches_oracle_both_sf(spark, sf_dir, oracle_sf_dir):
    sql = registry.oracle_sql()["corr_matrix_lineitem"]
    q = registry.queries()["corr_matrix_lineitem"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_corr_matrix_matches_numpy(spark, sf_dir):
    """The exact-sum closed form equals numpy's corrcoef on the same
    quantized measures, for every pair, to micro precision."""
    import numpy as np

    from mapreducemovieanalysis_cloud_spark.queries.round4e_queries import (
        _CORR_MEASURES,
    )

    m = load_table(spark, sf_dir, "lineitem").select(
        *[F.expr(expr).alias(name) for name, expr in _CORR_MEASURES]
    )
    names = [n for n, _ in _CORR_MEASURES]
    data = np.array(
        [[r[n] for n in names] for r in m.collect()], dtype=np.float64
    )
    cc = np.corrcoef(data.T)
    got = {
        (r["x_col"], r["y_col"]): r["corr_micro"]
        for r in registry.queries()["corr_matrix_lineitem"](
            spark, sf_dir
        ).collect()
    }
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            b = names[j]
            assert abs(got[(a, b)] - round(cc[i, j] * 1e6)) <= 1, (a, b)
    # plan: one aggregate, no Expand
    from mapreducemovieanalysis_cloud_spark import plans

    plan = plans.executed_plan(
        registry.queries()["corr_matrix_lineitem"](spark, sf_dir)
    )
    assert "Expand" not in plan
    assert plan.count("Exchange SinglePartition") == 1


def test_mv_incremental_matches_oracle_both_sf(spark, sf_dir, oracle_sf_dir):
    sql = registry.oracle_sql()["mv_incremental_sales"]
    q = registry.queries()["mv_incremental_sales"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_mv_merge_is_associative(spark, sf_dir):
    """Applying a delta in two half-batches (in either order) equals
    applying it whole — the property that makes out-of-order batch
    arrival safe."""
    from mapreducemovieanalysis_cloud_spark.operators import matview
    from mapreducemovieanalysis_cloud_spark.queries.round4e_queries import (
        _MV_KEYS,
        ensure_sales_mv,
    )

    stored = spark.read.parquet(ensure_sales_mv(spark, sf_dir))
    delta = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 97 == 0)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            (
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)") * 2
            ).alias("cents"),
        )
    )
    half1 = delta.where(F.col("priority") < "3")
    half2 = delta.where(~(F.col("priority") < "3"))

    def agg(d):
        return matview.aggregate_mv(d, _MV_KEYS, F.col("cents"))

    whole = matview.merge_mv(stored, agg(delta), _MV_KEYS)
    staged = matview.merge_mv(
        matview.merge_mv(stored, agg(half2), _MV_KEYS),
        agg(half1),
        _MV_KEYS,
    )
    canon = lambda df: sorted(
        (r["priority"], r["month"], r["revenue_cents"], r["n_rows"])
        for r in df.collect()
    )
    assert canon(whole) == canon(staged)


def test_mv_refresh_never_rescans_base_facts(spark, sf_dir):
    """The refresh plan contains exactly two scans: the stored MV
    parquet and the delta-filtered orders scan — the base facts are
    never re-aggregated, which is the entire point of IVM."""
    from mapreducemovieanalysis_cloud_spark import plans

    df = registry.queries()["mv_incremental_sales"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("Scan parquet") == 2, plan


def test_stratified_weighted_sample(spark, sf_dir, oracle_sf_dir):
    """Oracle diff at both SFs, plus the consistency property: the
    stratified sample of a language equals the global priority order
    restricted to that language (same priority function)."""
    sql = registry.oracle_sql()["weighted_sample_per_lang"]
    q = registry.queries()["weighted_sample_per_lang"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)

    from mapreducemovieanalysis_cloud_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    global_pri = {
        r["doc_id"]: r["priority_micro"]
        for r in curation.weighted_sample(
            docs, k=10_000, weight_col="n_chars"
        ).collect()
    }
    for r in q(spark, sf_dir).collect():
        assert global_pri[r["doc_id"]] == r["priority_micro"]


def test_auc_by_source_oracle_and_slice_consistency(
    spark, sf_dir, oracle_sf_dir
):
    """Oracle diff at both SFs, plus the slicing property: each source's
    sliced AUC equals the global kernel run on that source's rows alone,
    and a single-class crafted slice yields NULL."""
    from mapreducemovieanalysis_cloud_spark.operators.evaluation import (
        auc_by_group,
        auc_by_ranksum,
    )
    from mapreducemovieanalysis_cloud_spark.queries.round3_queries import (
        SPARK_LOGIT,
    )

    sql = registry.oracle_sql()["classifier_auc_by_source"]
    q = registry.queries()["classifier_auc_by_source"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.expr(f"CAST({SPARK_LOGIT} AS BIGINT)").alias("score"),
        (F.col("lang") == "en").cast("long").alias("label"),
    )
    sliced = {
        r["source"]: (r["n_pos"], r["n_neg"], r["auc_micro"])
        for r in auc_by_group(docs, "source", "score", "label").collect()
    }
    for src in list(sliced)[:3]:
        solo = auc_by_ranksum(
            docs.where(F.col("source") == src), "score", "label"
        ).collect()[0]
        assert sliced[src] == (
            solo["n_pos"],
            solo["n_neg"],
            solo["auc_micro"],
        ), src

    one_class = spark.createDataFrame(
        [("s", 1, 1), ("s", 2, 1)], "g STRING, score LONG, label LONG"
    )
    row = auc_by_group(one_class, "g", "score", "label").collect()[0]
    assert row["auc_micro"] is None


def test_psi_oracle_and_properties(spark, sf_dir, oracle_sf_dir):
    """Oracle diff at both SFs, plus PSI's defining properties:
    non-negativity (each (p-q)ln(p/q) term is sign-aligned) and actual
    discrimination — the corpus's sources differ in quality by
    construction (that is why source_quality_filter exists), so at
    least one source must register meaningful drift."""
    from mapreducemovieanalysis_cloud_spark.queries.round4e_queries import (
        quality_psi_by_source,
    )

    sql = registry.oracle_sql()["quality_psi_by_source"]
    q = registry.queries()["quality_psi_by_source"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)

    out = {r["source"]: r["psi_micro"] for r in q(spark, sf_dir).collect()}
    assert out, "no sources"
    for src, psi in out.items():
        assert psi >= 0, (src, psi)  # PSI is a divergence
    assert max(out.values()) > 10_000  # sources DO differ, by design
