"""Round-4c tests: oracle diffs plus the semantic invariants — EWMA
against pandas' reference recursion, A-Res stability under append, the
DQ gate against hand-built violations, AUC against a serial mid-rank
computation and its degenerate extremes."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import (
    curation,
    dataquality,
    evaluation,
    timeseries,
)
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from tests.oracle import assert_matches_oracle

ROUND4C = (
    "ewma_user_value",
    "weighted_sample_docs",
    "dq_orders_gate",
    "classifier_auc",
)


@pytest.mark.parametrize("name", ROUND4C)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", ROUND4C)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


# ---- EWMA --------------------------------------------------------------------


def test_ewma_matches_pandas_recursion(spark, sf_dir):
    """The fold equals pandas' ewm(adjust=False) recursion — the
    textbook s' = (1-a)s + a*x definition — for every user."""
    events = load_table(spark, sf_dir, "events")
    got = {
        r["user_id"]: r["ewma_micro"]
        for r in timeseries.ewma_per_key(events, alpha=0.2).collect()
    }
    pdf = (
        events.select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, g in pdf.groupby("user_id"):
        ref = g["value"].ewm(alpha=0.2, adjust=False).mean().iloc[-1]
        assert got[uid] == round(ref * 1_000_000), uid


# ---- A-Res weighted sampling -------------------------------------------------


def test_weighted_sample_stable_under_append(spark, sf_dir):
    """Priorities are a pure function of the id: appending new documents
    never changes an existing document's priority, and the sample of a
    subset is the subset's own top-k (no cross-row coupling)."""
    docs = load_table(spark, sf_dir, "documents")
    half = docs.where(F.col("doc_id") % 2 == 0)
    full = {
        r["doc_id"]: r["priority_micro"]
        for r in curation.weighted_sample(
            docs, k=10_000, weight_col="n_chars"
        ).collect()
    }
    half_sample = curation.weighted_sample(
        half, k=20, weight_col="n_chars"
    ).collect()
    for r in half_sample:
        assert full[r["doc_id"]] == r["priority_micro"]
    expected_top = sorted(
        ((p, -i) for i, p in full.items() if i % 2 == 0), reverse=True
    )[:20]
    assert {(-i) for _, i in expected_top} == {
        r["doc_id"] for r in half_sample
    }


def test_weighted_sample_prefers_heavy_rows(spark):
    """With overwhelming weight ratios the heavy rows dominate the
    sample: u^(1/w) -> 1 as w grows, so a 10^6x-weight row loses to a
    weight-1 row only with vanishing probability."""
    rows = [(i, 1_000_000) for i in range(10)] + [
        (i, 1) for i in range(10, 200)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    top = curation.weighted_sample(df, k=10, weight_col="w").collect()
    heavy = sum(1 for r in top if r["weight"] == 1_000_000)
    assert heavy == 10


# ---- data-quality gate -------------------------------------------------------


def test_dq_gate_detects_violations(spark):
    """Each constraint family actually fires: nulls cut completeness,
    duplicates cut uniqueness, out-of-range and out-of-domain rows cut
    their fractions, and a dangling key cuts referential integrity —
    with exact integer metrics."""
    rows = [
        (1, 10, "A", 5.0),
        (2, 20, "A", -1.0),  # range violation
        (2, 30, "B", 3.0),  # duplicate key
        (3, None, "C", 2.0),  # null custkey + bad domain
    ]
    df = spark.createDataFrame(
        rows, "k LONG, fk LONG, status STRING, price DOUBLE"
    )
    out = {
        r["constraint"]: (r["metric_micro"], r["passed"])
        for r in dataquality.check_constraints(
            df,
            completeness_cols=["fk"],
            unique_col="k",
            range_checks=[("price_positive", "price > 0")],
            domain_checks=[("status", ["A", "B"])],
        ).collect()
    }
    assert out["completeness_fk"] == (750_000, 0)
    assert out["uniqueness_k"] == (750_000, 0)
    assert out["range_price_positive"] == (750_000, 0)
    assert out["domain_status"] == (750_000, 0)

    dim = spark.createDataFrame([(10,), (20,), (30,)], "dk LONG")
    ref = dataquality.referential_integrity(
        df.where(F.col("fk").isNotNull()), "fk", dim, "dk"
    ).collect()[0]
    assert ref["constraint"] == "referential_fk"
    assert (ref["metric_micro"], ref["passed"]) == (1_000_000, 1)

    dim_missing = spark.createDataFrame([(10,)], "dk LONG")
    ref2 = dataquality.referential_integrity(
        df.where(F.col("fk").isNotNull()), "fk", dim_missing, "dk"
    ).collect()[0]
    assert (ref2["metric_micro"], ref2["passed"]) == (333_333, 0)


def test_dq_gate_passes_clean_table(spark, sf_dir):
    """The real orders table satisfies its contract end-to-end."""
    out = registry.queries()["dq_orders_gate"](spark, sf_dir).collect()
    assert len(out) == 6
    for r in out:
        assert r["passed"] == 1, r
        assert r["metric_micro"] == 1_000_000, r


# ---- AUC ---------------------------------------------------------------------


def _serial_auc_micro(pairs: list[tuple[int, int]]) -> tuple[int, int, int]:
    scores = sorted({s for s, _ in pairs})
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    cum = 0
    two_mid = 0
    for s in scores:
        n = sum(1 for x, _ in pairs if x == s)
        np_ = sum(y for x, y in pairs if x == s)
        two_mid += np_ * (2 * cum + n + 1)
        cum += n
    two_u = two_mid - n_pos * (n_pos + 1)
    return n_pos, n_neg, (two_u * 1_000_000) // (2 * n_pos * n_neg)


def test_auc_matches_serial_midrank(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        F.length("text").cast("long").alias("score"),
        (F.col("lang") == "en").cast("long").alias("label"),
    )
    got = evaluation.auc_by_ranksum(docs, "score", "label").collect()[0]
    pairs = [(r["score"], r["label"]) for r in docs.collect()]
    assert (
        got["n_pos"],
        got["n_neg"],
        got["auc_micro"],
    ) == _serial_auc_micro(pairs)


def test_auc_extremes_and_ties(spark):
    """Perfect separation = 1.0; inverted = 0.0; all-tied = 0.5 — the
    mid-rank handling is what makes the last one exact."""
    sep = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "score LONG, label LONG"
    )
    assert (
        evaluation.auc_by_ranksum(sep, "score", "label").collect()[0][
            "auc_micro"
        ]
        == 1_000_000
    )
    inv = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 0), (10, 0)], "score LONG, label LONG"
    )
    assert (
        evaluation.auc_by_ranksum(inv, "score", "label").collect()[0][
            "auc_micro"
        ]
        == 0
    )
    tied = spark.createDataFrame(
        [(5, 1), (5, 1), (5, 0), (5, 0)], "score LONG, label LONG"
    )
    assert (
        evaluation.auc_by_ranksum(tied, "score", "label").collect()[0][
            "auc_micro"
        ]
        == 500_000
    )


# ---- plan pins ---------------------------------------------------------------


def test_weighted_sample_plans_as_take_ordered(spark, sf_dir):
    """The A-Res draw must be per-partition heaps of k — a global sort of
    priorities would funnel the corpus through one task."""
    from mapreducemovieanalysis_cloud_spark import plans

    df = registry.queries()["weighted_sample_docs"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plans.uses_take_ordered(df), plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_auc_never_sorts_the_corpus(spark, sf_dir):
    """AUC's only ordered window runs over the score-bucket table: the
    plan may contain exactly one single-partition exchange (the bucket
    window) and one hash exchange (the bucket aggregate) — nothing that
    moves corpus rows into one task."""
    from mapreducemovieanalysis_cloud_spark import plans

    df = registry.queries()["classifier_auc"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
