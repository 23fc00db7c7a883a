"""Property-based tests (hypothesis) for the multimodal frame-dedup
kernel (round-12 registry candidate) and the exact graph-reach tier,
against python replays on random inputs:

* frame_dedup_pairs == the byte-slice/md5/set-intersection replay for
  ANY payload mix (payloads composed from a small block pool so shared
  frames are dense, plus ragged tails to pin the frame-count rule:
  max(len div 64, 1) frames, trailing partial bytes dropped);
* bfs_hops == python multi-source BFS distances;
* two_hop_reach == the <=2-hop distinct-neighbor count, self excluded.

Each example costs Spark jobs, so example counts stay small."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BLOCKS = [bytes([65 + i]) * 64 for i in range(3)]  # 'A'*64, 'B'*64, 'C'*64

_MEDIA = st.lists(
    st.tuples(
        st.lists(st.integers(0, 2), min_size=0, max_size=4),
        st.integers(0, 63),  # ragged tail length
    ),
    min_size=1,
    max_size=6,
)


def _payload(blocks, tail):
    data = b"".join(_BLOCKS[i] for i in blocks) + b"T" * tail
    return data if data else b"x"  # empty payloads out of scope


def _frames(data, n=64):
    count = max(len(data) // n, 1)
    return {
        hashlib.md5(data[i * n : (i + 1) * n]).hexdigest()
        for i in range(count)
    }


@given(media=_MEDIA)
@settings(**_SETTINGS)
def test_frame_dedup_pairs_match_python_replay(spark, media):
    from mapreducemovieanalysis_cloud_spark.operators.multimodal import (
        frame_dedup_pairs,
    )

    rows = [
        (i, bytearray(_payload(blocks, tail)))
        for i, (blocks, tail) in enumerate(media)
    ]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    got = sorted(
        (r.media_a, r.media_b, r.nf_a, r.nf_b, r.n_shared, r.containment_bp)
        for r in frame_dedup_pairs(df).collect()
    )
    fr = {i: _frames(bytes(d)) for i, d in rows}
    want = []
    for a in sorted(fr):
        for b in sorted(fr):
            if a >= b:
                continue
            shared = len(fr[a] & fr[b])
            if shared:
                want.append(
                    (
                        a,
                        b,
                        len(fr[a]),
                        len(fr[b]),
                        shared,
                        shared * 10000 // min(len(fr[a]), len(fr[b])),
                    )
                )
    assert got == sorted(want)


_EDGES = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=20,
).map(
    lambda ps: sorted({(min(u, v), max(u, v)) for u, v in ps if u != v})
)


def _adj(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@given(edges=_EDGES, max_hops=st.integers(1, 3))
@settings(**_SETTINGS)
def test_bfs_hops_matches_python_bfs(spark, edges, max_hops):
    from mapreducemovieanalysis_cloud_spark.operators.graph import bfs_hops

    assume(edges)
    adj = _adj(edges)
    sources = sorted(adj)[:2]
    edf = spark.createDataFrame(edges, ["u", "v"])
    sdf = spark.createDataFrame([(s,) for s in sources], ["node"])
    got = sorted(
        (r.node, r.hops)
        for r in bfs_hops(edf, sdf, max_hops=max_hops).collect()
    )
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        frontier = {
            x for f in frontier for x in adj.get(f, ())
        } - set(dist)
        for x in frontier:
            dist[x] = h
    assert got == sorted(dist.items())


@given(edges=_EDGES)
@settings(**_SETTINGS)
def test_two_hop_reach_matches_bruteforce(spark, edges):
    from mapreducemovieanalysis_cloud_spark.operators.graph import (
        two_hop_reach,
    )

    assume(edges)
    adj = _adj(edges)
    df = spark.createDataFrame(edges, ["u", "v"])
    got = sorted(
        (r.node, r.n_reachable) for r in two_hop_reach(df).collect()
    )
    want = []
    for n, nbrs in adj.items():
        reach = set(nbrs)
        for m in nbrs:
            reach |= adj[m]
        reach.discard(n)
        want.append((n, len(reach)))
    assert got == sorted(want)


def test_media_payload_bytes_never_enter_an_exchange(spark, sf_dir):
    """The multimodal family's 100 TB claim, pinned from the plan: the
    opaque ``data`` payload column must never appear in ANY Exchange's
    input — only ids, 16-byte frame hashes, and integer rollups may
    shuffle (plans.exchange_input_columns reads the formatted plan's
    per-Exchange Input schemas).  A refactor that lets payload bytes
    reach a shuffle multiplies exchange volume by the media size and
    fails here, not on the cluster."""
    from mapreducemovieanalysis_cloud_spark import plans, registry

    qs = registry.queries()
    for name in (
        "multimodal_frame_dedup",
        "multimodal_decode",
        "multimodal_frames",
        "multimodal_blockhash",
        "multimodal_features",
    ):
        for cols in plans.exchange_input_columns(qs[name](spark, sf_dir)):
            assert "data" not in cols, (name, cols)
    # the helper itself must see through a real shuffle (no silent
    # vacuous pass from a regex drift against the explain format)
    found = plans.exchange_input_columns(
        qs["multimodal_frame_dedup"](spark, sf_dir)
    )
    assert found and any("h" in cols for cols in found)
