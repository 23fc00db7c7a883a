"""Property-based tests (hypothesis) for the LSH banding and SimHash
foundations against python replays:

* banded_keys == the '|'-joined chunk concatenation per band, for ANY
  signature table (fed synthetic signatures so banding is isolated
  from minhash itself, which test_retrieval_properties pins);
* lsh_candidate_pairs == exactly the distinct pairs sharing at least
  one (band_idx, band_key) — no candidate invented, none dropped;
* simhash16 == the per-occurrence ±1 bit-vote replay (tokens vote per
  OCCURRENCE, not per distinct type — the property a refactor to
  distinct-token voting would silently break).

Signature chunks are drawn from a 3-value pool so band collisions are
dense — the interesting structure for banding is collision, not
uniqueness."""

from __future__ import annotations

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_CHUNKS = ["aaaa0000", "bbbb1111", "cccc2222"]

_SIGS = st.lists(
    st.lists(st.sampled_from(_CHUNKS), min_size=16, max_size=16),
    min_size=1,
    max_size=8,
)


def _sig_df(spark, sigs):
    rows = [tuple([i] + chunks) for i, chunks in enumerate(sigs)]
    return spark.createDataFrame(
        rows, ["doc_id"] + [f"h{i}" for i in range(16)]
    )


def _band_keys(chunks, bands=4):
    rows = 16 // bands
    return [
        (b, "|".join(chunks[b * rows + r] for r in range(rows)))
        for b in range(bands)
    ]


@given(sigs=_SIGS)
@settings(**_SETTINGS)
def test_banded_keys_match_replay(spark, sigs):
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        banded_keys,
    )

    got = sorted(
        (r.doc_id, r.band_idx, r.band_key)
        for r in banded_keys(_sig_df(spark, sigs)).collect()
    )
    want = sorted(
        (i, b, key)
        for i, chunks in enumerate(sigs)
        for b, key in _band_keys(chunks)
    )
    assert got == want


@given(sigs=_SIGS)
@settings(**_SETTINGS)
def test_lsh_candidates_are_exactly_shared_band_pairs(spark, sigs):
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    got = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(_sig_df(spark, sigs)).collect()
    )
    keys = [set(_band_keys(chunks)) for chunks in sigs]
    want = sorted(
        (i, j)
        for i, j in combinations(range(len(sigs)), 2)
        if keys[i] & keys[j]
    )
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdef")), min_size=1, max_size=10),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_simhash16_matches_occurrence_vote_replay(spark, docs):
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        simhash16,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.simhash for r in simhash16(df).collect()}
    want = {}
    for i, words in enumerate(docs):
        votes = [0] * 16
        for tok in words:  # per OCCURRENCE
            hv = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)
            for j in range(16):
                votes[j] += 1 if (hv >> j) & 1 else -1
        want[i] = sum(1 << j for j in range(16) if votes[j] > 0)
    assert got == want
