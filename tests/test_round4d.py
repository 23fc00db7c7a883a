"""Round-4d tests: oracle diffs plus serial references — kappa against a
hand-computed contingency, calibration bin algebra, temperature-mix
normalization, and the distributed BPE corpus encoder against the
per-word reference encoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import bpe
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from tests.oracle import assert_matches_oracle

ROUND4D = (
    "langid_kappa",
    "classifier_calibration",
    "lang_temperature_mix",
)


@pytest.mark.parametrize("name", ROUND4D)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", ROUND4D)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


# ---- kappa -------------------------------------------------------------------


def test_kappa_against_hand_contingency(spark, sf_dir):
    """Recompute kappa serially from the collected (label, pred)
    contingency and compare every output field."""
    from mapreducemovieanalysis_cloud_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    scores = T.lang_scores_from_tokens(T.tokens("text"))
    pairs = [
        (r["label"], r["pred"])
        for r in docs.select(
            F.col("lang").alias("label"),
            T.predicted_lang_from_scores(scores).alias("pred"),
        ).collect()
    ]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for a, b in pairs:
        rows[a] = rows.get(a, 0) + 1
        cols[b] = cols.get(b, 0) + 1
    pe_sum = sum(rc * cols.get(c, 0) for c, rc in rows.items())
    got = registry.queries()["langid_kappa"](spark, sf_dir).collect()[0]
    assert got["n_docs"] == n
    assert got["n_agree"] == agree
    assert got["accuracy_micro"] == (agree * 1_000_000) // n
    num, den = (n * agree - pe_sum) * 1_000_000, n * n - pe_sum
    # both engines truncate integer division toward zero
    expected_kappa = abs(num) // den * (1 if num >= 0 else -1)
    assert got["kappa_micro"] == expected_kappa
    # chance correction must cut below raw accuracy; on this synthetic
    # corpus the stopword heuristic sits near chance (kappa ~ 0, and may
    # dip slightly negative), which is exactly what the metric is for
    assert -1_000_000 <= got["kappa_micro"] < got["accuracy_micro"]


def test_kappa_degenerate_majority_parrot(spark):
    """A constant predictor earns kappa = 0 even at high accuracy — the
    property that justifies the metric."""
    rows = [("en", "en")] * 90 + [("de", "en")] * 10
    df = spark.createDataFrame(rows, "lang STRING, pred STRING")
    conf = df.groupBy(F.col("lang").alias("label"), "pred").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n = 100
    agree = 90
    pe_sum = 100 * 90 + 0  # row_en*col_en = 90*100? labels: en=90, de=10
    # serial: rows en=90 de=10; cols en=100 -> pe = 90*100 + 10*0 = 9000
    pe_sum = 9000
    kappa_micro = ((n * agree - pe_sum) * 1_000_000) // (n * n - pe_sum)
    assert kappa_micro == 0
    assert conf.count() == 2


# ---- calibration -------------------------------------------------------------


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    """Bins tile the logit domain: every document lands in exactly one
    bin, per-bin positives never exceed the bin count, and the positive
    fractions are exact integer ratios."""
    out = registry.queries()["classifier_calibration"](
        spark, sf_dir
    ).collect()
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_total
    for r in out:
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert (
            r["pos_rate_micro"]
            == (r["n_pos"] * 1_000_000) // r["n_docs"]
        )
        assert 0 <= r["bin"] <= 10


def test_calibration_monotone_with_auc(spark, sf_dir):
    """Sanity cross-check between the two eval queries: if AUC > 0.5 the
    top calibration bin must have a higher positive rate than the bottom
    bin (both statements say 'score separates the classes')."""
    auc = registry.queries()["classifier_auc"](spark, sf_dir).collect()[
        0
    ]["auc_micro"]
    bins = sorted(
        registry.queries()["classifier_calibration"](
            spark, sf_dir
        ).collect(),
        key=lambda r: r["bin"],
    )
    populated = [b for b in bins if b["n_docs"] >= 10]
    if auc > 550_000 and len(populated) >= 2:
        assert (
            populated[-1]["pos_rate_micro"]
            > populated[0]["pos_rate_micro"]
        )


# ---- temperature mix ---------------------------------------------------------


def test_temperature_mix_normalizes_and_flattens(spark, sf_dir):
    """Weights sum to ~1 and are FLATTER than raw frequencies: the
    largest language's weight share is below its count share, the
    smallest language's above — the point of temperature sampling."""
    out = registry.queries()["lang_temperature_mix"](
        spark, sf_dir
    ).collect()
    total_w = sum(r["weight_micro"] for r in out)
    assert abs(total_w - 1_000_000) <= len(out)  # rounding slack
    n = sum(r["n_docs"] for r in out)
    big = max(out, key=lambda r: r["n_docs"])
    small = min(out, key=lambda r: r["n_docs"])
    assert big["weight_micro"] < big["n_docs"] * 1_000_000 / n
    assert small["weight_micro"] > small["n_docs"] * 1_000_000 / n


# ---- distributed BPE encode --------------------------------------------------


def test_bpe_encode_corpus_matches_word_reference(spark, sf_dir):
    """Every document's distributed encoding equals the serial per-word
    reference encoder applied to its whitespace words, in order — across
    a checkpoint boundary (12 merges > checkpoint_every=8)."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe.bpe_train(bpe.word_freq(docs), n_merges=12)
    assert len(merges) == 12
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe.bpe_encode_corpus(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        words = [w for w in r["text"].strip().split() if w]
        expected: list[str] = []
        for w in words:
            expected.extend(bpe.bpe_encode_word(list(w), merges))
        assert got[r["doc_id"]] == expected, r["doc_id"]


def test_bpe_encode_corpus_compresses(spark, sf_dir):
    """Encoding with learned merges strictly reduces total token count
    vs character-level — merges actually fire on the corpus they were
    trained on."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe.bpe_train(bpe.word_freq(docs), n_merges=12)
    enc = bpe.bpe_encode_corpus(docs, merges)
    n_sym = enc.agg(F.sum(F.size("tokens"))).collect()[0][0]
    n_char = docs.agg(
        F.sum(
            F.length(F.regexp_replace(F.trim("text"), r"\s+", ""))
        )
    ).collect()[0][0]
    assert n_sym < n_char


def test_bpe_model_roundtrip(spark, sf_dir, tmp_path):
    """Train -> save -> load -> encode equals encoding with the in-memory
    merges: the tokenizer artifact survives its storage format."""
    docs = load_table(spark, sf_dir, "documents").limit(30)
    merges = bpe.bpe_train(bpe.word_freq(docs), n_merges=6)
    path = str(tmp_path / "bpe_model")
    bpe.save_merges(spark, merges, path)
    reloaded = bpe.load_merges(spark, path)
    assert reloaded == merges
    a = bpe.bpe_encode_corpus(docs, merges).collect()
    b = bpe.bpe_encode_corpus(docs, reloaded).collect()
    assert sorted((r["doc_id"], tuple(r["tokens"])) for r in a) == sorted(
        (r["doc_id"], tuple(r["tokens"])) for r in b
    )


# ---- ANN recall --------------------------------------------------------------


def test_ann_recall_matches_oracle_both_sf(spark, sf_dir, oracle_sf_dir):
    sql = registry.oracle_sql()["ann_recall_ivf"]
    q = registry.queries()["ann_recall_ivf"]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_recall_at_k_keeps_zero_hit_queries(spark):
    """A query whose approximate set misses everything still appears,
    with recall 0 — the failing queries are the ones worth seeing."""
    from mapreducemovieanalysis_cloud_spark.operators.evaluation import (
        recall_at_k,
    )

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)],
        "query_id LONG, neighbor_id LONG",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 98), (2, 99)],
        "query_id LONG, neighbor_id LONG",
    )
    out = {
        r["query_id"]: (r["n_hits"], r["recall_micro"])
        for r in recall_at_k(approx, exact, k=2).collect()
    }
    assert out == {1: (1, 500_000), 2: (0, 0)}
