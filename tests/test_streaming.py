"""Structured Streaming tests: incremental execution must converge to the
batch semantics the oracles verify, watermarks must drop late data, and
custom state must accumulate across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from mapreducemovieanalysis_cloud_spark.streaming import stateful
from mapreducemovieanalysis_cloud_spark.streaming import windows as W
from tests.oracle import assert_matches_oracle

STREAM_QUERIES = (
    "window_tumbling",
    "window_sliding",
    "window_session",
    "join_interval_events",
)


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_batch_semantics_match_oracle(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_batch_semantics_match_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def _event_stream(spark, sf_dir, tmp_path, subdir="src"):
    """Materialize events (normalized µs timestamps) and open as a file
    stream."""
    src = str(tmp_path / subdir)
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    return events, spark.readStream.schema(schema).parquet(src)


def test_streaming_tumbling_converges_to_batch(spark, sf_dir, tmp_path):
    events, stream = _event_stream(spark, sf_dir, tmp_path)
    out = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_conv")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.n_events)
            for r in spark.sql("SELECT * FROM tumbling_conv").collect()
        }
    finally:
        q.stop()
    expected = {
        (r.w.start, r.n_events)
        for r in events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("w", "n_events")
        .collect()
    }
    assert got == expected


def test_watermark_drops_late_data(spark, sf_dir, tmp_path):
    """Late rows behind the watermark must NOT update finalized windows."""
    events = load_table(spark, sf_dir, "events").select("ts", "user_id")
    src = tmp_path / "wm"
    on_time = events.where(F.col("ts") >= F.lit("2024-01-10"))
    late = events.where(F.col("ts") < F.lit("2024-01-05"))
    on_time.write.parquet(str(src / "batch1"))

    schema = on_time.schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1000"
    ).parquet(str(src / "*"))
    out = W.streaming_tumbling_counts(stream, "1 hour", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        n_before = spark.sql("SELECT COUNT(*) c FROM wm_test").first().c
        # second micro-batch: all rows are days behind the watermark
        late.write.parquet(str(src / "batch2"))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT DISTINCT window_start FROM wm_test"
        ).collect()
        starts = {r.window_start for r in rows}
    finally:
        q.stop()
    assert n_before > 0
    # no window earlier than 2024-01-05 may appear: late rows were dropped
    import datetime

    assert all(s >= datetime.datetime(2024, 1, 10) for s in starts), starts


def test_stateful_running_counts(spark, sf_dir, tmp_path):
    """applyInPandasWithState accumulates across micro-batches to the batch
    totals."""
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "state"
    half1 = events.where(F.col("event_id") % 2 == 0)
    half2 = events.where(F.col("event_id") % 2 == 1)
    half1.write.parquet(str(src / "b1"))

    schema = events.schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    out = stateful.running_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        half2.write.parquet(str(src / "b2"))
        q.processAllAvailable()
        # last update per user wins
        final = {
            r.user_id: (r.n_events, r.sum_cents)
            for r in spark.sql(
                """SELECT user_id, n_events, sum_cents FROM (
                     SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n_events DESC) rn FROM state_test)
                   WHERE rn = 1"""
            ).collect()
        }
    finally:
        q.stop()
    expected = {
        r.user_id: (r.n, r.cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert final == expected


def test_stream_stream_interval_join_converges(spark, sf_dir, tmp_path):
    """The stream-stream interval join (watermarked both sides) must produce
    exactly the batch join's pairs once all files are processed."""
    from mapreducemovieanalysis_cloud_spark.streaming.joins import (
        clicks_before_purchases,
    )

    events, stream = _event_stream(spark, sf_dir, tmp_path, subdir="ssj")
    out = clicks_before_purchases(
        stream.where(F.col("event_type") == "purchase"),
        stream.where(F.col("event_type") == "click"),
        interval="30 minutes",
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_conv")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.purchase_id, r.click_id, r.delay_us)
            for r in spark.sql("SELECT * FROM ssj_conv").collect()
        }
    finally:
        q.stop()
    expected = {
        (r.purchase_id, r.click_id, r.delay_us)
        for r in clicks_before_purchases(
            events.where(F.col("event_type") == "purchase"),
            events.where(F.col("event_type") == "click"),
            interval="30 minutes",
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_streaming_exact_dedup_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: re-delivered events inside the
    watermark horizon are suppressed (streaming exact-dedup — the
    at-least-once -> effectively-once repair for 100 TB ingest)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    src = tmp_path / "dedup"
    events.write.parquet(str(src / "b1"))
    events.write.parquet(str(src / "b2"))  # full duplicate delivery

    stream = spark.readStream.schema(events.schema).parquet(str(src / "*"))
    out = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT COUNT(*) c FROM sdedup").first().c
        n_distinct = spark.sql(
            "SELECT COUNT(DISTINCT event_id) c FROM sdedup"
        ).first().c
    finally:
        q.stop()
    assert n == n_distinct, f"duplicates leaked: {n} rows vs {n_distinct} ids"
    assert n_distinct == events.count()


def test_checkpoint_recovery_no_duplicates(spark, sf_dir, tmp_path):
    """Stop/restart with a checkpoint must resume exactly where the first
    run left off — file-sink output stays exactly-once across the restart
    (the fault-tolerance contract a 100 TB ingest job relies on)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value"
    )
    src, ckpt, sink = (
        str(tmp_path / "ck_src"),
        str(tmp_path / "ck_ckpt"),
        str(tmp_path / "ck_sink"),
    )
    half1 = events.where(F.col("event_id") % 2 == 0)
    half2 = events.where(F.col("event_id") % 2 == 1)
    half1.write.parquet(src + "/b1")

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src + "/*")
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()                      # first incarnation: half1
    half2.write.parquet(src + "/b2")
    run_once()                      # restart from checkpoint: only half2

    out = spark.read.parquet(sink)
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()


def test_foreach_batch_partition_upsert_sink(spark, sf_dir, tmp_path):
    """Streaming ingest through foreachBatch + dynamic partition upsert:
    each micro-batch replaces only the day partitions it carries — the
    exactly-once-per-partition sink a continuous 100 TB ingest uses when
    the target is a plain partitioned parquet table."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        upsert_partitions,
    )

    events, stream = _event_stream(spark, sf_dir, tmp_path)
    dest = str(tmp_path / "ingested")

    def sink(batch_df, batch_id):
        upsert_partitions(
            spark,
            batch_df.withColumn("day", F.date_format("ts", "yyyy-MM-dd")),
            dest,
            ("day",),
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(dest)
    assert got.count() == events.count()
    days_in = {
        r.day
        for r in events.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).distinct().collect()
    }
    # hive partition values round-trip through directory names; Spark's
    # partition-column inference reads day=2024-01-01 back as DATE
    days_out = {
        r.day
        for r in got.select(
            F.col("day").cast("string").alias("day")
        ).distinct().collect()
    }
    assert days_out == days_in


def test_stream_static_broadcast_join_converges(spark, sf_dir, tmp_path):
    """Stream-static join: each micro-batch joins against a broadcast static
    dimension (re-read per batch in real pipelines — here a derived cohort
    dim). Result must equal the batch join byte-for-byte."""
    events, stream = _event_stream(spark, sf_dir, tmp_path, "ss_join")
    cohorts = (
        events.select("user_id")
        .distinct()
        .withColumn("cohort", (F.col("user_id") % 5).cast("long"))
    )

    def pipeline(df):
        return (
            df.join(F.broadcast(cohorts), "user_id")
            .groupBy("cohort")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "value_cents"
                ),
            )
        )

    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName("ss_join_conv")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.cohort, r.n_events, r.value_cents)
            for r in spark.sql("SELECT * FROM ss_join_conv").collect()
        }
    finally:
        q.stop()
    expected = {
        (r.cohort, r.n_events, r.value_cents)
        for r in pipeline(events).collect()
    }
    assert got == expected


def test_streaming_curation_gates_match_batch(spark, sf_dir, tmp_path):
    """The curation column expressions (quality score, language ID, PII
    counts) are engine-pure projections, so the SAME code runs over a
    document stream unchanged — batch/streaming unification for the
    curation pipeline."""
    from mapreducemovieanalysis_cloud_spark.functions import text as T
    from mapreducemovieanalysis_cloud_spark.operators.curation import EMAIL_RE

    src = str(tmp_path / "docs_stream")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)

    def gates(df):
        toks = df.select("doc_id", "text", T.tokens("text").alias("toks"))
        return toks.select(
            "doc_id",
            T.quality_score("text").alias("quality"),
            T.predicted_lang_from_scores(
                T.lang_scores_from_tokens(F.col("toks"))
            ).alias("lang"),
            F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias(
                "n_emails"
            ),
        ).where(F.col("quality") >= 0.5)

    q = (
        gates(stream)
        .writeStream.format("memory")
        .queryName("curation_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            tuple(r)
            for r in spark.sql("SELECT * FROM curation_stream").collect()
        }
    finally:
        q.stop()
    expected = {tuple(r) for r in gates(docs).collect()}
    assert got == expected and got


def test_streaming_incremental_dedup_foreach_batch(spark, sf_dir, tmp_path):
    """Streaming ingest dedup: each micro-batch runs incremental exact
    dedup against the persistent fingerprint store via foreachBatch — docs
    re-sent in ANY later batch are dropped without rescanning history.
    maxFilesPerTrigger=1 forces multiple micro-batches so the cross-batch
    path actually executes."""
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    # batch files written separately => separate micro-batches; file 2
    # re-sends file 1's texts under shifted ids
    docs.where(F.col("doc_id") < 60).coalesce(1).write.parquet(src + "/b1")
    docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    ).coalesce(1).write.parquet(src + "/b2")

    store = str(tmp_path / "fp_store")
    survivors_path = str(tmp_path / "survivors")
    schema = spark.read.parquet(src + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )

    def sink(batch_df, batch_id):
        # epoch-id mode: a retried batch overwrites its own batch=<id>
        # directories — exactly-once (see the operator docstring)
        incremental_exact_dedup(
            batch_df, store, survivors_path=survivors_path,
            batch_id=batch_id,
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    surv = spark.read.parquet(survivors_path)
    n_texts = docs.where(F.col("doc_id") < 60).select("text").distinct().count()
    assert surv.count() == n_texts
    # nothing from the re-sent range survived
    assert surv.where(F.col("doc_id") >= 500000).count() == 0


def test_first_seen_apws_emits_each_type_once(spark, sf_dir, tmp_path):
    """The first-seen stateful emitter yields every (user, event_type)
    exactly once across micro-batches, at its first-seen batch."""
    from mapreducemovieanalysis_cloud_spark.streaming.tws import (
        first_seen_types_apws,
    )

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "fs"
    half1 = events.where(F.col("event_type") == "click")
    half2 = events.where(F.col("event_type") != "click")
    half1.write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(events.schema).parquet(str(src / "*"))
    out = first_seen_types_apws(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_test")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        n_after_b1 = spark.sql(
            "SELECT COUNT(*) n FROM first_seen_test"
        ).collect()[0].n
        half2.write.parquet(str(src / "b2"))
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT user_id, event_type, COUNT(*) AS n "
            "FROM first_seen_test GROUP BY 1, 2"
        ).collect()
    finally:
        q.stop()
    # exactly-once per pair, and batch 2 only added pairs unseen in batch 1
    assert all(r.n == 1 for r in emitted)
    want_pairs = {
        (r.user_id, r.event_type)
        for r in events.select("user_id", "event_type").distinct().collect()
    }
    assert {(r.user_id, r.event_type) for r in emitted} == want_pairs
    assert n_after_b1 < len(want_pairs)  # second batch contributed


def test_first_seen_tws_batch_mode(spark, sf_dir):
    """transformWithState (gated: needs protobuf) in BATCH mode equals the
    grouped-MIN oracle semantics."""
    from mapreducemovieanalysis_cloud_spark.streaming import tws

    if not tws.TWS_AVAILABLE:
        pytest.skip("google.protobuf not available in this environment")
    _ = spark.streams.active  # force StateStoreCoordinator registration
    events = load_table(spark, sf_dir, "events")
    got = {
        (r.user_id, r.event_type): r.first_ts
        for r in tws.first_seen_types(events).collect()
    }
    want = {
        (r.user_id, r.event_type): r.first_ts
        for r in tws.first_seen_batch(events).collect()
    }
    assert got == want


def test_stream_stream_outer_join_converges(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join: matched rows equal the batch join,
    and NULL (unattributed) rows appear for purchases whose watermark
    horizon closed — a flush batch far in the future closes every
    purchase, after which the streamed output equals the batch left join
    exactly."""
    from mapreducemovieanalysis_cloud_spark.streaming.joins import (
        purchases_with_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "ssjo"
    events.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(events.schema).parquet(str(src / "*"))
    out = purchases_with_attribution(
        stream.where(F.col("event_type") == "purchase"),
        stream.where(F.col("event_type") == "click"),
        interval="30 minutes",
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssjo_conv")
        .outputMode("append")
        .start()
    )
    def flush_pair(offset_h):
        # each side's watermark sees only ITS event type post-filter, so a
        # flush must contain BOTH a purchase and a click to advance both
        return events.limit(2).select(
            (F.col("event_id") + 10_000_000 + offset_h).alias("event_id"),
            (
                F.col("ts")
                + F.expr(f"INTERVAL 365 DAYS")
                + F.expr(f"INTERVAL {offset_h} HOURS")
            ).alias("ts"),
            "user_id",
            F.when(F.col("event_id") % 2 == 0, "purchase")
            .otherwise("click")
            .alias("event_type"),
            "value",
            "props",
        ).select(events.columns)

    try:
        q.processAllAvailable()
        flush_pair(0).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        # a second flush batch forces a further micro-batch AFTER the
        # watermark advanced, so state eviction emits the last NULL rows
        flush_pair(2).write.parquet(str(src / "b3"))
        q.processAllAvailable()
        got = {
            (r.purchase_id, r.click_id, r.delay_us)
            for r in spark.sql("SELECT * FROM ssjo_conv").collect()
            if r.purchase_id < 10_000_000  # drop flush-derived rows
        }
    finally:
        q.stop()
    batch = purchases_with_attribution(
        events.where(F.col("event_type") == "purchase"),
        events.where(F.col("event_type") == "click"),
        interval="30 minutes",
    )
    expected = {
        (r.purchase_id, r.click_id, r.delay_us) for r in batch.collect()
    }
    # the flush click may legitimately attribute nothing (it is alone in
    # the far future), so streamed == batch exactly
    assert got == expected
    assert any(c is None for (_, c, _) in got)  # outer rows exist
