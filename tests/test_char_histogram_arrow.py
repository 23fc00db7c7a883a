"""Pins for operators/arrowops.char_histogram_arrow — the round-13
rewrite of char_entropy_docs' per-row histogram from an interpreted
Catalyst fold to a vectorized numpy kernel (guide §4.2, 5.4x measured).
The kernel must stay value-identical to an independent per-doc
reference after micro-rounding: exact integer counts, bit-identical
per-term IEEE ops in codepoint-ascending order, summation-order ulp
absorbed by the micro-rounding (the tolerance the query already grants
the DuckDB oracle's arbitrary-order SUM)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators.arrowops import (
    char_histogram_arrow,
)

_DOCS = [
    (1, "a"),  # single char: acc exactly -1*ln(1) = 0.0
    (2, "aaaa"),  # one run
    (3, "abab"),  # interleaved runs — sort order matters
    (4, "zyxw"),  # all-distinct, reverse-ordered input
    (5, "mississippi"),
    (6, "naïve café"),  # non-ASCII codepoints
    (7, "ああい"),  # multi-byte (hiragana)
    (8, "0123456789" * 40),  # long uniform doc
    (9, " leading and trailing "),
]


def _reference(text: str) -> tuple[int, int, float]:
    n = len(text)
    counts: dict[str, int] = {}
    for ch in text:
        counts[ch] = counts.get(ch, 0) + 1
    acc = 0.0
    for ch in sorted(counts):  # codepoint-ascending, sequential
        kp = counts[ch] / n
        acc += -kp * math.log(kp)
    return n, len(counts), acc


def test_kernel_matches_reference(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"], r["acc"])
        for r in char_histogram_arrow(df).collect()
    }
    assert set(rows) == {d for d, _ in _DOCS}
    for doc_id, text in _DOCS:
        n, ndist, acc = _reference(text)
        got = rows[doc_id]
        assert got[0] == n, (doc_id, got)
        assert got[1] == ndist, (doc_id, got)
        # terms are bit-identical IEEE ops; the per-doc sum may differ
        # from a sequential reference in the last ulp (numpy pairwise
        # summation) — the contract is micro-rounded equality, the same
        # tolerance the query grants the DuckDB oracle's arbitrary-order
        # SUM (see the kernel docstring)
        assert got[2] == pytest.approx(acc, rel=1e-12, abs=1e-12)
        assert round(got[2] * 1_000_000) == round(acc * 1_000_000), (
            doc_id,
            got[2],
            acc,
        )


def test_kernel_matches_catalyst_fold_on_driver_docs(spark, sf_dir):
    """Value-equality against the pre-rewrite Catalyst fold on the real
    documents table — the exact equivalence the round-13 swap claims."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.length("text") > 0
    )
    s = F.array_sort(F.split(F.col("text"), ""))
    n = F.length("text").cast("double")

    def term(k):
        kp = k.cast("double") / n
        return -kp * F.log(kp)

    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0.0).alias("acc"),
    )

    def fold(a, c):
        return F.when(
            a["prev"] == c,
            F.struct(
                a["prev"].alias("prev"),
                (a["run"] + 1).alias("run"),
                a["cnt"].alias("cnt"),
                a["acc"].alias("acc"),
            ),
        ).otherwise(
            F.struct(
                c.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (a["cnt"] + 1).alias("cnt"),
                (
                    a["acc"]
                    + F.when(a["run"] > 0, term(a["run"])).otherwise(
                        F.lit(0.0)
                    )
                ).alias("acc"),
            )
        )

    hist = F.aggregate(
        s,
        zero,
        fold,
        lambda a: F.struct(
            a["cnt"].alias("cnt"), (a["acc"] + term(a["run"])).alias("acc")
        ),
    )
    def micro(acc: float) -> int:
        return round(acc * 1_000_000)

    want = {
        r["doc_id"]: (r["n"], r["cnt"], micro(r["acc"]))
        for r in docs.select(
            "doc_id",
            F.length("text").cast("long").alias("n"),
            hist["cnt"].alias("cnt"),
            hist["acc"].alias("acc"),
        ).collect()
    }
    got = {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"], micro(r["acc"]))
        for r in char_histogram_arrow(docs).collect()
    }
    assert want == got
