"""Property-based tests (hypothesis) for the session-scoped event
kernels staged in round 14 — random event streams against exhaustive
python replays, where the fixed fixtures in test_round14_staged.py pin
single shapes:

* session_funnel_counts == the per-(user, session) sequential
  first-event chain replayed in python over the SAME gap-sessionization
  rule;
* session_transition_counts == consecutive same-session pair counts +
  integer permille, replayed in python;
* both share the `_with_session_idx` prelude, so the replay implements
  gap sessionization ONCE and derives both answers from it — any
  disagreement between the operators' shared prelude and their own
  aggregation shows up as a replay mismatch.

Each example costs Spark jobs, so example counts are deliberately small
(the test_properties.py convention)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_GAP_S = 1800
_STAGES = ["view", "click", "purchase"]
_TYPES = ["view", "click", "purchase", "error"]

# (user, type_idx, minute): minutes span 0..180 so streams mix
# within-gap steps and >30-min session breaks
_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 2), st.integers(0, 3), st.integers(0, 180)
    ),
    min_size=1,
    max_size=25,
)

_BASE = datetime.datetime(2024, 1, 1)


def _materialize(raw):
    """(user, event_id, ts, type) rows with a unique event_id tiebreak;
    us = epoch micros for the replay."""
    rows = []
    for eid, (user, t_idx, minute) in enumerate(raw):
        rows.append(
            (
                user,
                eid,
                _BASE + datetime.timedelta(minutes=minute),
                _TYPES[t_idx],
            )
        )
    return rows


def _sessions(rows):
    """Python replay of _with_session_idx: per user, sort by
    (ts, event_id); a gap > _GAP_S opens a session.  Returns
    [(user, sess, us, type)] in that order."""
    out = []
    by_user: dict = {}
    for user, eid, ts, typ in rows:
        by_user.setdefault(user, []).append((ts, eid, typ))
    for user, evs in by_user.items():
        evs.sort()
        sess, prev_us = 0, None
        for ts, eid, typ in evs:
            us = int(ts.timestamp() * 1_000_000)
            if prev_us is None or us - prev_us > _GAP_S * 1_000_000:
                sess += 1
            out.append((user, sess, us, typ))
            prev_us = us
    return out


def _funnel_replay(rows):
    tagged = _sessions(rows)
    by_sess: dict = {}
    for user, sess, us, typ in tagged:
        by_sess.setdefault((user, sess), []).append((us, typ))
    counts = []
    frontier: dict = {}
    for i, stage in enumerate(_STAGES):
        nxt = {}
        for key, evs in by_sess.items():
            if i > 0 and key not in frontier:
                continue
            prev = frontier.get(key)
            cand = [
                us
                for us, typ in evs
                if typ == stage and (i == 0 or us > prev)
            ]
            if cand:
                nxt[key] = min(cand)
        frontier = nxt
        counts.append((i, stage, len(frontier)))
    return counts


def _transition_replay(rows):
    tagged = _sessions(rows)
    # consecutive in per-user (ts, event_id) order == consecutive in
    # the tagged list within one user (the replay emits in that order)
    cnt: dict = {}
    by_user: dict = {}
    for user, sess, us, typ in tagged:
        by_user.setdefault(user, []).append((sess, typ))
    for user, evs in by_user.items():
        for (s1, t1), (s2, t2) in zip(evs, evs[1:]):
            if s1 == s2:
                cnt[(t1, t2)] = cnt.get((t1, t2), 0) + 1
    tot: dict = {}
    for (a, _), n in cnt.items():
        tot[a] = tot.get(a, 0) + n
    return {
        (a, b): (n, n * 1000 // tot[a]) for (a, b), n in cnt.items()
    }


@given(raw=_EVENTS)
@settings(**_SETTINGS)
def test_session_funnel_matches_python_replay(spark, raw):
    from mapreducemovieanalysis_cloud_spark.operators import timeseries

    rows = _materialize(raw)
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type"]
    )
    got = sorted(
        (r.stage_idx, r.stage, r.n_sessions)
        for r in timeseries.session_funnel_counts(
            df, _STAGES, gap_seconds=_GAP_S
        ).collect()
    )
    assert got == sorted(_funnel_replay(rows))


@given(raw=_EVENTS)
@settings(**_SETTINGS)
def test_session_transitions_match_python_replay(spark, raw):
    from mapreducemovieanalysis_cloud_spark.operators import timeseries

    rows = _materialize(raw)
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts", "event_type"]
    )
    got = {
        (r.from_type, r.to_type): (r.n_trans, r.p_permille)
        for r in timeseries.session_transition_counts(
            df, gap_seconds=_GAP_S
        ).collect()
    }
    assert got == _transition_replay(rows)
