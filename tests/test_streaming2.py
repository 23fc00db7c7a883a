"""Round-4 streaming additions: the continuous EWMA converges to the
batch fold across micro-batch boundaries, and the DQ gate routes every
row to exactly one sink with the right violation names."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import timeseries
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from mapreducemovieanalysis_cloud_spark.streaming import dq, ewma


def test_streaming_ewma_converges_to_batch(spark, sf_dir, tmp_path):
    """Two in-order (chronological) micro-batches: the final streaming
    state per user equals ewma_per_key over the full events table — the
    stream/batch parity the shared fold semantics promise."""
    events = load_table(spark, sf_dir, "events")
    cut = events.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)")
    ).collect()[0][0]
    early = events.where(F.unix_micros("ts") <= cut)
    late = events.where(F.unix_micros("ts") > cut)
    src = tmp_path / "ewma_src"
    early.write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(events.schema).parquet(str(src / "*"))
    out = ewma.running_ewma(stream, alpha=0.2)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        late.write.parquet(str(src / "b2"))
        q.processAllAvailable()
        final = {
            r.user_id: (r.n_events, r.ewma_micro)
            for r in spark.sql(
                """SELECT user_id, n_events, ewma_micro FROM (
                     SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n_events DESC) rn
                     FROM ewma_test)
                   WHERE rn = 1"""
            ).collect()
        }
    finally:
        q.stop()
    expected = {
        r["user_id"]: (r["n_events"], r["ewma_micro"])
        for r in timeseries.ewma_per_key(events, alpha=0.2).collect()
    }
    assert final == expected


def test_dq_gate_routes_rows_exactly_once(spark, tmp_path):
    """Every input row lands in exactly one sink; quarantined rows name
    every violated constraint; NULL predicate results quarantine (a gate
    must treat unknown as failure)."""
    rows = [
        (1, 10.0, "A"),
        (2, -5.0, "A"),  # range violation
        (3, 7.0, "X"),  # domain violation
        (4, -1.0, "X"),  # both
        (5, None, "B"),  # NULL -> range unknown -> quarantined
    ]
    src = tmp_path / "dq_src"
    spark.createDataFrame(
        rows, "id LONG, price DOUBLE, status STRING"
    ).write.parquet(str(src / "b1"))

    preds = [
        ("price_positive", "price > 0"),
        ("status_known", "status IN ('A', 'B')"),
    ]
    stream = spark.readStream.schema(
        "id LONG, price DOUBLE, status STRING"
    ).parquet(str(src / "*"))
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    q = dq.dq_gate_sink(
        stream, preds, good, quar, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        # second micro-batch: all clean
        spark.createDataFrame(
            [(6, 1.0, "B")], "id LONG, price DOUBLE, status STRING"
        ).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    good_ids = {
        r["id"] for r in spark.read.parquet(good).collect()
    }
    quarantined = {
        r["id"]: r["violations"]
        for r in spark.read.parquet(quar).collect()
    }
    assert good_ids == {1, 6}
    assert quarantined == {
        2: "price_positive",
        3: "status_known",
        4: "price_positive,status_known",
        5: "price_positive",
    }


def test_violations_column_is_pure_projection(spark, sf_dir):
    """The violation tagging is a map-side projection — applying it to a
    batch frame adds zero exchanges."""
    from mapreducemovieanalysis_cloud_spark import plans

    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.withColumn(
        "__v",
        dq.violations_column(
            [
                ("price_positive", "o_totalprice > 0"),
                ("status_known", "o_orderstatus IN ('F','O','P')"),
            ]
        ),
    )
    assert "Exchange" not in plans.executed_plan(tagged)


def test_streaming_mv_exactly_once_and_compaction(spark, sf_dir, tmp_path):
    """Streaming IVM: two micro-batches of order facts maintain the MV
    to exactly the full-recompute state; re-writing an epoch (the retry
    case) changes nothing (idempotent-by-path); compaction folds deltas
    into base without changing the view."""
    from mapreducemovieanalysis_cloud_spark.operators import matview
    from mapreducemovieanalysis_cloud_spark.streaming import mv as smv

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    keys = ["priority", "month"]
    base_facts = orders.where(F.col("k") % 3 == 0)
    b1 = orders.where(F.col("k") % 3 == 1)
    b2 = orders.where(F.col("k") % 3 == 2)

    path = str(tmp_path / "mv")
    smv.write_base(
        matview.aggregate_mv(base_facts, keys, F.col("cents")), path
    )

    src = tmp_path / "facts"
    b1.write.parquet(str(src / "f1"))
    stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
    q = smv.apply_stream_deltas(
        stream, path, keys, "cents", str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        b2.write.parquet(str(src / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()

    def canon(df):
        return sorted(
            (r["priority"], r["month"], r["revenue_cents"], r["n_rows"])
            for r in df.collect()
        )

    expected = canon(matview.aggregate_mv(orders, keys, F.col("cents")))
    assert canon(smv.read_current_mv(spark, path, keys)) == expected

    # retry: re-write epoch 0's delta directory with the same content
    matview.aggregate_mv(b1, keys, F.col("cents")).write.mode(
        "overwrite"
    ).parquet(f"{path}/deltas/batch=0")
    assert canon(smv.read_current_mv(spark, path, keys)) == expected

    # compaction folds deltas into base; the view is unchanged
    smv.compact(spark, path, keys)
    import os

    assert not os.path.isdir(f"{path}/deltas")
    assert canon(smv.read_current_mv(spark, path, keys)) == expected


def test_mv_time_travel_reads_log_prefix(spark, sf_dir, tmp_path):
    """as-of epoch 0 sees base+batch0 only; as-of a later epoch sees
    everything; both equal the corresponding batch recomputes."""
    from mapreducemovieanalysis_cloud_spark.operators import matview
    from mapreducemovieanalysis_cloud_spark.streaming import mv as smv

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    keys = ["priority", "month"]
    base_facts = orders.where(F.col("k") % 3 == 0)
    b1 = orders.where(F.col("k") % 3 == 1)
    b2 = orders.where(F.col("k") % 3 == 2)
    path = str(tmp_path / "mv")
    smv.write_base(
        matview.aggregate_mv(base_facts, keys, F.col("cents")), path
    )
    for epoch, batch in ((0, b1), (1, b2)):
        matview.aggregate_mv(batch, keys, F.col("cents")).write.mode(
            "overwrite"
        ).parquet(f"{path}/deltas/batch={epoch}")

    def canon(df):
        return sorted(
            (r["priority"], r["month"], r["revenue_cents"], r["n_rows"])
            for r in df.collect()
        )

    upto0 = matview.aggregate_mv(
        base_facts.unionByName(b1), keys, F.col("cents")
    )
    assert canon(smv.read_mv_asof(spark, path, keys, 0)) == canon(upto0)
    assert canon(smv.read_mv_asof(spark, path, keys, 5)) == canon(
        matview.aggregate_mv(orders, keys, F.col("cents"))
    )


def test_streaming_sliding_reach_converges_to_batch(spark, sf_dir, tmp_path):
    """Two chronological micro-batches + a far-future sentinel to push
    the watermark past every real window: the append-mode emissions
    equal the batch twin's exact distinct counts per (window, type)."""
    from mapreducemovieanalysis_cloud_spark.streaming import windows as SW

    events = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "user_id"
    )
    cut = events.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)")
    ).collect()[0][0]
    src = tmp_path / "reach_src"
    events.where(F.unix_micros("ts") <= cut).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(events.schema).parquet(str(src / "*"))
    out = SW.streaming_sliding_reach(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("reach_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "reach_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        events.where(F.unix_micros("ts") > cut).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        # sentinel: a lone far-future event closes every real window
        spark.createDataFrame(
            [("2030-01-01 00:00:00", "zz_sentinel", -1)],
            "ts string, event_type string, user_id long",
        ).withColumn("ts", F.to_timestamp("ts")).write.parquet(
            str(src / "b3")
        )
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): r.reach
            for r in spark.sql(
                "SELECT * FROM reach_test"
                " WHERE event_type <> 'zz_sentinel'"
            ).collect()
        }
    finally:
        q.stop()
    expected = {
        (r.window_start, r.event_type): r.reach
        for r in SW.sliding_reach_windows(events).collect()
    }
    assert got == expected


def test_dq_route_batch_retry_is_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch_id) overwrites its own epoch
    directories — re-running route_batch must not duplicate rows in
    either sink (the foreachBatch retry case the plain-append layout
    gets wrong)."""
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A")],
        "id LONG, price DOUBLE, status STRING",
    )
    preds = [("price_positive", "price > 0")]
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    for _ in range(3):  # original run + two retries
        dq.route_batch(df, preds, good, quar, batch_id=7)
    assert [r["id"] for r in spark.read.parquet(good).collect()] == [1]
    assert [r["id"] for r in spark.read.parquet(quar).collect()] == [2]
    # and a later epoch lands beside it, not over it
    dq.route_batch(
        spark.createDataFrame(
            [(3, 1.0, "A")], "id LONG, price DOUBLE, status STRING"
        ),
        preds, good, quar, batch_id=8,
    )
    assert {r["id"] for r in spark.read.parquet(good).collect()} == {1, 3}


def test_mv_compaction_crash_recovery_converges(spark, tmp_path):
    """Every crash point of the rename-aside compaction protocol leaves a
    state from which the next read (or compact rerun) restores exactly
    the pre-compaction view — in particular the old delete-deltas-first
    data-loss window (old base live, deltas gone forever) cannot occur:
    the delta log only moves ASIDE until the folded base is live."""
    import os
    import shutil

    from mapreducemovieanalysis_cloud_spark.operators import matview
    from mapreducemovieanalysis_cloud_spark.streaming import mv as smv

    keys = ["g"]

    def mk(rows):
        return spark.createDataFrame(rows, "g string, cents long")

    def canon(df):
        return sorted(
            (r["g"], r["revenue_cents"], r["n_rows"]) for r in df.collect()
        )

    def fresh(path):
        smv.write_base(
            matview.aggregate_mv(mk([("a", 10), ("b", 5)]), keys,
                                 F.col("cents")), path)
        matview.aggregate_mv(mk([("a", 7), ("c", 1)]), keys, F.col("cents")
                             ).write.mode("overwrite").parquet(
            f"{path}/deltas/batch=0")

    expected = canon(matview.aggregate_mv(
        mk([("a", 10), ("b", 5), ("a", 7), ("c", 1)]), keys, F.col("cents")))

    # crash point A: base_next written, nothing moved yet
    pa = str(tmp_path / "mv_a")
    fresh(pa)
    smv.read_current_mv(spark, pa, keys).write.mode("overwrite").parquet(
        f"{pa}/base_next")
    assert canon(smv.read_current_mv(spark, pa, keys)) == expected

    # crash point B: deltas moved aside, swap not started
    pb = str(tmp_path / "mv_b")
    fresh(pb)
    smv.read_current_mv(spark, pb, keys).write.mode("overwrite").parquet(
        f"{pb}/base_next")
    shutil.move(f"{pb}/deltas", f"{pb}/deltas__folding")
    assert canon(smv.read_current_mv(spark, pb, keys)) == expected

    # crash point C: old base moved aside, new base not yet live
    pc = str(tmp_path / "mv_c")
    fresh(pc)
    smv.read_current_mv(spark, pc, keys).write.mode("overwrite").parquet(
        f"{pc}/base_next")
    shutil.move(f"{pc}/deltas", f"{pc}/deltas__folding")
    shutil.move(f"{pc}/base", f"{pc}/base__old")
    assert canon(smv.read_current_mv(spark, pc, keys)) == expected

    # crash point D: new base live, aside copies not yet deleted
    pd = str(tmp_path / "mv_d")
    fresh(pd)
    smv.read_current_mv(spark, pd, keys).write.mode("overwrite").parquet(
        f"{pd}/base_next")
    shutil.move(f"{pd}/deltas", f"{pd}/deltas__folding")
    shutil.move(f"{pd}/base", f"{pd}/base__old")
    shutil.move(f"{pd}/base_next", f"{pd}/base")
    assert canon(smv.read_current_mv(spark, pd, keys)) == expected
    # the aside delta copy must NOT be restored (it is already folded in)
    assert not os.path.isdir(f"{pd}/deltas")

    # interrupted fold (no _SUCCESS): roll back, then a compact converges
    pe = str(tmp_path / "mv_e")
    fresh(pe)
    os.makedirs(f"{pe}/base_next")  # partial write, no _SUCCESS
    shutil.move(f"{pe}/deltas", f"{pe}/deltas__folding")
    assert canon(smv.read_current_mv(spark, pe, keys)) == expected
    smv.compact(spark, pe, keys)
    assert canon(smv.read_current_mv(spark, pe, keys)) == expected
    assert not os.path.isdir(f"{pe}/deltas__folding")
    assert not os.path.isdir(f"{pe}/base__old")


def test_dq_epoch_mode_refuses_flat_sink(spark, tmp_path):
    """Writing epoch directories into a sink already holding flat
    appended files would brick partition discovery for every reader —
    route_batch must fail the batch with a migration message instead."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10.0, "A")], "id LONG, price DOUBLE, status STRING"
    )
    preds = [("price_positive", "price > 0")]
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quarantine")
    # old layout: flat append
    dq.route_batch(df, preds, good, quar)
    with pytest.raises(ValueError, match="flat-appended"):
        dq.route_batch(df, preds, good, quar, batch_id=0)


def test_kmv_streaming_sink_matches_batch(spark, tmp_path):
    """The streaming appender (streaming/kmv.kmv_sketch_sink) must leave
    the store in a state whose merged sketches equal a one-shot batch
    ``bottomk_sketches`` over the same rows — after the first
    micro-batch AND after a late second file arrives (bottom-k's
    union-then-re-rank merge makes any micro-batch partitioning
    equivalent).  Closes the incremental-store roster: FM and CMS have
    this pin already (test_round12_staged / test_round13_staged)."""
    from mapreducemovieanalysis_cloud_spark.operators import corpus_overlap
    from mapreducemovieanalysis_cloud_spark.streaming import kmv

    rows1 = [
        ("s0", f"alpha beta gamma delta doc{i} common tail") for i in range(8)
    ] + [("s1", f"alpha beta gamma shared{i % 3} epsilon") for i in range(6)]
    rows2 = [
        ("s0", f"late arrival text body doc{i} common tail") for i in range(5)
    ] + [("s1", "alpha beta gamma delta doc0 common tail")]
    schema = "source string, text string"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)
    src = tmp_path / "src"
    b1.write.parquet(str(src / "f1"))

    store = str(tmp_path / "store")
    stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
    q = kmv.kmv_sketch_sink(
        stream, store, checkpoint_path=str(tmp_path / "ckpt"), k=16
    )

    def merged():
        return sorted(
            map(
                tuple,
                corpus_overlap.incremental_kmv_sketches(
                    spark, store, k=16
                ).collect(),
            )
        )

    def rebuild(df):
        return sorted(
            map(
                tuple,
                corpus_overlap.bottomk_sketches(df, k=16).collect(),
            )
        )

    try:
        q.processAllAvailable()
        got1 = merged()
        assert got1 == rebuild(b1)
        b2.write.parquet(str(src / "f2"))
        q.processAllAvailable()
        got2 = merged()
        assert got2 == rebuild(b1.unionByName(b2))
        assert got1 != got2  # the late file actually moved the sketches
    finally:
        q.stop()


def test_graph_edge_streaming_sinks_match_batch(spark, tmp_path):
    """Both graph edge-store streaming appenders
    (streaming/graph_edges) must leave their stores equal to a one-shot
    batch rebuild over the same rows — after the first micro-batch AND
    after a late second file arrives — provided each file carries
    COMPLETE groups (the module's contract; files are disjoint in group
    id here, mirroring day-closed ingest)."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators import graph
    from mapreducemovieanalysis_cloud_spark.streaming import graph_edges

    rows1 = [(g, 10 + g % 3, 100 + (g * 7) % 4) for g in range(12)] + [
        (g, 13, 100) for g in range(0, 12, 2)
    ]
    rows2 = [(g, 10 + g % 4, 100 + (g * 5) % 3) for g in range(12, 20)]
    schema = "g long, c long, s long"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)
    src = tmp_path / "src"
    b1.write.parquet(str(src / "f1"))

    und_store = str(tmp_path / "und")
    dir_store = str(tmp_path / "dir")
    stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
    q_und = graph_edges.cooc_edge_sink(
        stream, und_store, str(tmp_path / "ck1"),
        group_col="g", node_col="c",
    )
    q_dir = graph_edges.directed_edge_sink(
        stream, dir_store, str(tmp_path / "ck2"),
        group_col="g", src_col="c", dst_col="s",
    )

    def und_merged():
        return sorted(
            map(
                tuple,
                graph.incremental_cooccurrence_edges(
                    spark, und_store
                ).collect(),
            )
        )

    def und_rebuild(df):
        g = df.select("g", F.col("c").alias("u")).distinct()
        return sorted(
            map(
                tuple,
                g.join(g.select("g", F.col("u").alias("v")), "g")
                .where(F.col("u") < F.col("v"))
                .groupBy("u", "v")
                .agg(F.count(F.lit(1)).cast("long").alias("shared"))
                .collect(),
            )
        )

    def dir_merged():
        return sorted(
            map(
                tuple,
                graph.incremental_directed_edges(
                    spark, dir_store
                ).collect(),
            )
        )

    def dir_rebuild(df):
        e = df.select("g", "c", "s").distinct()
        return sorted(
            map(
                tuple,
                e.groupBy("c", "s")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .collect(),
            )
        )

    try:
        q_und.processAllAvailable()
        q_dir.processAllAvailable()
        got_u1, got_d1 = und_merged(), dir_merged()
        assert got_u1 == und_rebuild(b1)
        assert got_d1 == dir_rebuild(b1)
        b2.write.parquet(str(src / "f2"))
        q_und.processAllAvailable()
        q_dir.processAllAvailable()
        both = b1.unionByName(b2)
        assert und_merged() == und_rebuild(both)
        got_d2 = dir_merged()
        assert got_d2 == dir_rebuild(both)
        assert got_d2 != got_d1  # the late file actually moved the store
    finally:
        q_und.stop()
        q_dir.stop()


def test_lm_streaming_sink_matches_batch(spark, tmp_path):
    """The streaming LM appender (streaming/lm.ngram_count_sink) must
    leave the store's merged model equal to a one-shot ngram_model
    rebuild over the same rows — after the first micro-batch AND after
    a late second file (counts add, vocab unions; document-grain rows
    make any micro-batch assignment safe)."""
    from mapreducemovieanalysis_cloud_spark.operators import ngram_lm
    from mapreducemovieanalysis_cloud_spark.streaming import lm

    b1 = spark.createDataFrame(
        [(0, "a b c a b"), (1, "b c d")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(2, "a b c"), (3, "d e")], "doc_id long, text string"
    )
    src = tmp_path / "src"
    b1.write.parquet(str(src / "f1"))

    store = str(tmp_path / "store")
    stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
    q = lm.ngram_count_sink(stream, store, str(tmp_path / "ckpt"))

    def tbl(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    def assert_equal_to_rebuild(docs):
        inc_ng, inc_ctx, inc_v = ngram_lm.incremental_ngram_model(
            spark, store
        )
        full_ng, full_ctx, full_v = ngram_lm.ngram_model(docs)
        assert tbl(inc_ng, ["ngram", "c"]) == tbl(full_ng, ["ngram", "c"])
        assert tbl(inc_ctx, ["context", "ctx"]) == tbl(
            full_ctx, ["context", "ctx"]
        )
        assert inc_v.collect()[0].v == full_v.collect()[0].v

    try:
        q.processAllAvailable()
        assert_equal_to_rebuild(b1)
        b2.write.parquet(str(src / "f2"))
        q.processAllAvailable()
        assert_equal_to_rebuild(b1.unionByName(b2))
    finally:
        q.stop()


def test_hist_streaming_sink_matches_batch(spark, tmp_path):
    """The streaming histogram appender (streaming/hist.hist_bin_sink)
    must leave the store's percentile answers equal to a one-shot
    hist_bins rebuild — after the first micro-batch AND after a late
    second file (bin counts add at row grain)."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators import sketches
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        read_epochs,
    )
    from mapreducemovieanalysis_cloud_spark.streaming import hist

    b1 = spark.createDataFrame(
        [("a", c * 100) for c in range(1, 30)]
        + [("b", 500), ("b", 900)],
        "grp string, cents long",
    )
    b2 = spark.createDataFrame(
        [("a", 5000), ("b", 100), ("b", 101)], "grp string, cents long"
    )
    src = tmp_path / "src"
    b1.write.parquet(str(src / "f1"))

    store = str(tmp_path / "store")
    stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
    q = hist.hist_bin_sink(
        stream, store, str(tmp_path / "ckpt"),
        group_col="grp", cents_col="cents", bin_width_cents=250,
    )

    def merged():
        return sorted(
            map(
                tuple,
                read_epochs(spark, f"{store}/bins")
                .groupBy("grp", "bin")
                .agg(F.sum("n").cast("long").alias("n"))
                .collect(),
            )
        )

    def rebuild(df):
        return sorted(
            map(
                tuple,
                sketches.hist_bins(df, "grp", "cents", 250)
                .select("grp", "bin", F.col("n").cast("long"))
                .collect(),
            )
        )

    try:
        q.processAllAvailable()
        got1 = merged()
        assert got1 == rebuild(b1)
        b2.write.parquet(str(src / "f2"))
        q.processAllAvailable()
        got2 = merged()
        assert got2 == rebuild(b1.unionByName(b2))
        assert got1 != got2  # the late file actually moved the bins
    finally:
        q.stop()


def test_ivf_streaming_sink_matches_full_build(spark, oracle_sf_dir, tmp_path):
    """The streaming IVF appender (streaming/ivf.ivf_delta_sink) must
    leave the index probing exactly like a single full build — after
    the first micro-batch's vectors AND after a late second file
    (fixed stored centroids make assignment per-vector; the base
    prefix covers the deterministic centroid seeds, mirroring
    test_pipeline.test_ivf_append_equals_full_build)."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators.similarity import (
        ivf_probe_index,
        ivf_write_index,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
    from mapreducemovieanalysis_cloud_spark.streaming import ivf

    corpus = load_table(spark, oracle_sf_dir, "embeddings")
    queries = (
        corpus.where(F.col("vec_id") % 97 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .limit(5)
    )
    inc_path = str(tmp_path / "ivf_inc")
    ivf_write_index(
        corpus.where(F.col("vec_id") < 200), inc_path, n_centroids=8
    )

    src = tmp_path / "src"
    b1 = corpus.where(
        (F.col("vec_id") >= 200) & (F.col("vec_id") % 2 == 0)
    ).select("vec_id", "embedding")
    b2 = corpus.where(
        (F.col("vec_id") >= 200) & (F.col("vec_id") % 2 == 1)
    ).select("vec_id", "embedding")
    b1.write.parquet(str(src / "f1"))

    stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
    q = ivf.ivf_delta_sink(stream, inc_path, str(tmp_path / "ckpt"))

    def probe(path):
        return sorted(
            map(
                tuple,
                ivf_probe_index(
                    spark, path, queries, k=5, nprobe=2
                ).collect(),
            )
        )

    try:
        q.processAllAvailable()
        b1_path = str(tmp_path / "ivf_b1")
        ivf_write_index(
            corpus.where(
                (F.col("vec_id") < 200)
                | ((F.col("vec_id") >= 200) & (F.col("vec_id") % 2 == 0))
            ),
            b1_path,
            n_centroids=8,
        )
        assert probe(inc_path) == probe(b1_path)
        b2.write.parquet(str(src / "f2"))
        q.processAllAvailable()
        full_path = str(tmp_path / "ivf_full")
        ivf_write_index(corpus, full_path, n_centroids=8)
        assert probe(inc_path) == probe(full_path)
    finally:
        q.stop()
