"""Property-based tests (hypothesis) for the retrieval / dedup / graph
FOUNDATIONS — the kernels dozens of registered queries compose —
against exact python replays on random corpora and graphs:

* bm25_scores == the per-term float score tree replayed in python with
  IDENTICAL operation order and BigDecimal-half-up rounding (both
  engines are IEEE-754 binary64, so same ops in same order are
  bit-identical; the per-term micro-rounding BEFORE summation is what
  makes the document score partition-order-proof);
* minhash_signatures == the md5-chunk min replay (the LSH tier's
  ground truth: every band key and collision stat derives from these
  16 hex chunks);
* k_core == the python peel to fixpoint (the k-core is unique, so the
  iterative Spark peel must land on exactly the brute-force set).

Each example costs Spark jobs, so example counts stay small (the
test_properties.py convention)."""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ["join", "vector", "stream", "filler", "pad"]


def _round_half_up(x: float) -> int:
    # Spark's ROUND on DOUBLE: exact BigDecimal of the binary64 value,
    # then HALF_UP — Decimal(float) replicates the exact expansion.
    return int(Decimal(x).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_bm25_scores_match_python_replay(spark, docs):
    from mapreducemovieanalysis_cloud_spark.operators.ranking import (
        B,
        K1,
        K1_PLUS_1,
        ONE_MINUS_B,
        bm25_scores,
    )

    terms = ["join", "vector", "stream"]
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.bm25_micro, r.n_terms_hit)
        for r in bm25_scores(df, terms, topk=1000).collect()
    )

    n_total = len(docs)
    sum_dl = sum(len(w) for w in docs)
    df_count = {
        t: sum(1 for w in docs if t in w) for t in terms
    }
    want = []
    for i, words in enumerate(docs):
        dl = len(words)
        score, hits = 0, 0
        for t in terms:
            tf = words.count(t)
            if not tf:
                continue
            idf_odds = (n_total - df_count[t] + 0.5) / (df_count[t] + 0.5)
            denom = tf + K1 * (ONE_MINUS_B + (B * dl) / (sum_dl / n_total))
            score += _round_half_up(
                (idf_odds * ((tf * K1_PLUS_1) / denom)) * 1000000.0
            )
            hits += 1
        if hits:
            want.append((i, score, hits))
    assert got == sorted(want)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcde")), min_size=3, max_size=9),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_minhash_signatures_match_md5_chunk_replay(spark, docs):
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        minhash_signatures,
    )

    n, k = 3, 16
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: tuple(r[f"h{i}"] for i in range(k))
        for r in minhash_signatures(df, n=n, num_hashes=k).collect()
    }
    want = {}
    for i, words in enumerate(docs):
        shingles = {
            " ".join(words[j : j + n]) for j in range(len(words) - n + 1)
        }
        sig = []
        for h in range(k):
            g, c = divmod(h, 4)
            sig.append(
                min(
                    hashlib.md5(f"{g}:{s}".encode()).hexdigest()[
                        c * 8 : c * 8 + 8
                    ]
                    for s in shingles
                )
            )
        want[i] = tuple(sig)
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    ).map(
        lambda ps: sorted(
            {(min(u, v), max(u, v)) for u, v in ps if u != v}
        )
    ),
    k=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_k_core_matches_python_peel(spark, edges, k):
    from mapreducemovieanalysis_cloud_spark.operators.graph import k_core

    assume(edges)
    df = spark.createDataFrame(edges, ["u", "v"])
    got = sorted(r.node for r in k_core(df, k=k).collect())

    nodes = {n for e in edges for n in e}
    while True:
        deg = {n: 0 for n in nodes}
        for u, v in edges:
            if u in nodes and v in nodes:
                deg[u] += 1
                deg[v] += 1
        drop = {n for n in nodes if deg[n] < k}
        if not drop:
            break
        nodes -= drop
    assert got == sorted(nodes)
