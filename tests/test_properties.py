"""Property-based tests (hypothesis) for the algorithmic guarantees the
fixed-fixture tests can only spot-check: winnowing's shared-substring
guarantee and salting's exactness for algebraic aggregates.

Each example costs a Spark job, so example counts are deliberately small —
the value is randomized structure (run placement, key skew, value signs),
not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


@given(
    pre_a=st.integers(0, 12),
    suf_a=st.integers(0, 12),
    pre_b=st.integers(0, 12),
    suf_b=st.integers(0, 12),
    run_len=st.integers(6, 15),
)
@settings(**_SETTINGS)
def test_winnowing_shared_run_guarantee(
    spark, pre_a, suf_a, pre_b, suf_b, run_len
):
    """Schleimer et al.'s guarantee: any shared token run of length
    >= n + window - 1 (= 6 here) produces at least one shared fingerprint,
    wherever the run sits in either document."""
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        winnow_fingerprints,
    )

    common = _words("c", run_len)
    doc_a = " ".join(_words("a", pre_a) + common + _words("x", suf_a))
    doc_b = " ".join(_words("b", pre_b) + common + _words("y", suf_b))
    docs = spark.createDataFrame(
        [(0, doc_a), (1, doc_b)], ["doc_id", "text"]
    )
    fps = winnow_fingerprints(docs, n=3, window=4).collect()
    a = {r.fp for r in fps if r.doc_id == 0}
    b = {r.fp for r in fps if r.doc_id == 1}
    assert a & b, (doc_a, doc_b)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["hot", "hot", "hot", "warm", "cold"]),
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    buckets=st.integers(2, 7),
)
@settings(**_SETTINGS)
def test_salted_agg_equals_direct_agg(spark, rows, buckets):
    """Salting must be invisible to algebraic aggregates under the cents
    convention, for any key skew, value mix, and bucket count."""
    from mapreducemovieanalysis_cloud_spark.operators.skew import (
        salted_count_sum_cents,
    )

    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: (r.n, r.sum_cents)
        for r in salted_count_sum_cents(
            df, ["k"], "v", salt_buckets=buckets
        ).collect()
    }
    want = {
        r.k: (r.n, r.sum_cents)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("v") * 100).cast("long")).alias("sum_cents"),
        )
        .collect()
    }
    assert got == want
