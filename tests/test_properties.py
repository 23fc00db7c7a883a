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


@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=2,
        max_size=25,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_fuzzy_pairs_equals_bruteforce(spark, names):
    """Symmetric-delete blocking + positional pruning finds EXACTLY the
    ed<=1 pairs a brute-force O(n^2) scan finds, on dense random strings
    over a tiny alphabet (worst case for blocking: everything collides
    with everything)."""
    from mapreducemovieanalysis_cloud_spark.operators.linkage import (
        fuzzy_pairs,
    )

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for x in range(1, len(a) + 1):
            prev, dp[0] = dp[0], x
            for y in range(1, len(b) + 1):
                cur = min(
                    dp[y] + 1,
                    dp[y - 1] + 1,
                    prev + (a[x - 1] != b[y - 1]),
                )
                prev, dp[y] = dp[y], cur
        return dp[len(b)]

    expected = {
        tuple(sorted((a, b)))
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if lev(a, b) <= 1
    }
    df = spark.createDataFrame([(n,) for n in names], "name STRING")
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_pairs(df, "name").collect()
    }
    assert got == expected


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_ewma_fold_matches_pandas(spark, values):
    """The distributed EWMA fold equals pandas' ewm(adjust=False)
    recursion bit-for-bit (after the single final micro-rounding) on
    arbitrary series."""
    import pandas as pd

    from mapreducemovieanalysis_cloud_spark.operators.timeseries import (
        ewma_per_key,
    )

    rows = [
        (1, f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}", i, float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts_s STRING, event_id LONG, value DOUBLE"
    ).select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_id",
        "value",
    )
    got = ewma_per_key(df, alpha=0.2).collect()[0]
    ref = (
        pd.Series(values).ewm(alpha=0.2, adjust=False).mean().iloc[-1]
    )
    assert got["n_events"] == len(values)
    assert got["ewma_micro"] == round(ref * 1_000_000)


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        min_size=1,
        max_size=15,
    ),
    n_merges=st.integers(0, 6),
)
@settings(**_SETTINGS)
def test_bpe_encode_preserves_characters(spark, words, n_merges):
    """Tokenization never alters content: for any corpus and any number
    of learned merges, concatenating a word's encoded symbols
    reproduces the word exactly, and the distributed corpus encoder
    agrees with the serial reference per word."""
    from mapreducemovieanalysis_cloud_spark.operators import bpe

    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id LONG, text STRING"
    )
    merges = bpe.bpe_train(bpe.word_freq(docs), n_merges=n_merges)
    enc = bpe.bpe_encode_corpus(docs, merges).collect()[0]["tokens"]
    expected: list[str] = []
    for w in words:
        toks = bpe.bpe_encode_word(list(w), merges)
        assert "".join(toks) == w
        expected.extend(toks)
    assert enc == expected


def test_results_are_partition_count_invariant(spark, sf_dir):
    """The engine's central determinism claim, pinned: queries whose
    kernels do distributed prefix sums, folds, quantized sums, or
    hash-dealt sampling return BIT-identical results when the shuffle
    partition count changes (1 vs the suite default). Covers the ops
    whose naive formulations are partition-sensitive."""
    from tests.oracle import _canon

    NAMES = [
        "shuffle_for_training",  # two-phase distributed prefix rank
        "pack_sequences",        # two-phase prefix sum packing
        "ewma_user_value",       # ordered fold
        "weighted_sample_docs",  # hash-priority top-k
        "pca_gram",              # quantized int sums
        "event_transition_matrix",
        "classifier_auc",        # bucket rank-sum
        # round-4m kernels whose naive formulations are order-sensitive
        "containment_pairs",     # array-intersect exact-set verify
        "ann_sq8",               # per-dim min/max coding + int L2 rank
        "multimodal_blockhash",  # block-mean bits from a map-side pass
        "rfm_segments",          # three global NTILE quintiles
    ]
    from mapreducemovieanalysis_cloud_spark import registry

    qs = registry.queries()
    default = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("1", default):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in NAMES:
                pdf = qs[name](spark, sf_dir).toPandas()
                results.setdefault(name, []).append(_canon(pdf))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    for name, (a, b) in results.items():
        assert a == b, f"{name} changed under repartitioning"


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(_words("w", 9)), min_size=3, max_size=14
        ).map(" ".join),
        min_size=2,
        max_size=8,
    ),
    t_num=st.sampled_from([1, 2, 3]),
    seed=st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_containment_pairs_equals_bruteforce(spark, texts, t_num, seed):
    """First-principles guarantee for the prefix-filtered, size-gated
    containment detector: on ANY corpus it returns exactly the pairs a
    brute-force n² shingle-set computation finds — the prefix filter,
    df-ordering, size gate, and array-intersect verify are all lossless
    at threshold t_num/4 (tested across 1/4, 2/4=1/2, 3/4)."""
    from mapreducemovieanalysis_cloud_spark.operators import dedup

    t_den = 4
    n = 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.size_a, r.overlap)
        for r in dedup.containment_pairs(
            docs, n=n, t_num=t_num, t_den=t_den
        ).collect()
    }

    def sh(t):
        toks = t.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sets = {i: sh(t) for i, t in enumerate(texts)}
    want = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            ov = len(sa & sb)
            if ov * t_den >= t_num * len(sa):
                want[(a, b)] = (len(sa), ov)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "a", "a", "b", "c"]),
            st.integers(-50, 50),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ks_by_group_matches_bruteforce(spark, rows):
    """The domain-collapsed, cross-multiplied KS kernel equals the
    textbook two-sample D = max|CDF_in - CDF_rest| (floor-micro) on any
    grouping/value mix; single-group inputs yield no rows (rest sample
    empty) instead of a NULL statistic."""
    import math

    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        ks_by_group,
    )

    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n_in, r.n_rest, r.ks_micro)
        for r in ks_by_group(df, "g", F.col("v")).collect()
    }

    vals = sorted({v for _, v in rows})
    groups = sorted({g for g, _ in rows})
    want = {}
    for g in groups:
        inside = sorted(v for gg, v in rows if gg == g)
        rest = sorted(v for gg, v in rows if gg != g)
        if not rest:
            continue
        # D at every pooled step value, exact integer cross-multiply
        num = max(
            abs(
                sum(v <= x for v in inside) * len(rest)
                - sum(v <= x for v in rest) * len(inside)
            )
            for x in vals
        )
        want[g] = (
            len(inside),
            len(rest),
            (num * 1_000_000) // (len(inside) * len(rest)),
        )
    assert got == want


@given(
    obs=st.lists(
        st.tuples(
            st.integers(0, 5 * 3600),  # offset seconds within a 5h span
            st.integers(-3_000_000, 3_000_000),  # value in micro units
        ),
        min_size=2,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_resample_interp_matches_bruteforce(spark, obs):
    """The two-running-frame interpolation kernel equals a brute-force
    prev/next scan at every interior hour boundary, for any observation
    placement and sign mix (the truncating-division arithmetic is the
    part a fixture can't sweep)."""
    import datetime as dt

    from mapreducemovieanalysis_cloud_spark.operators.timeseries import (
        US_PER_HOUR,
        resample_hourly_interp,
    )

    base = dt.datetime(2024, 3, 1, 0, 30, 0)
    rows = [
        (
            7,
            base + dt.timedelta(seconds=off),
            i,
            vm / 1_000_000.0,
        )
        for i, (off, vm) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {
        r.hour: r.interp_micro
        for r in resample_hourly_interp(df).collect()
    }

    # python reference: dedupe by ts keeping max event_id, then for each
    # interior hour boundary find prev (<=) and next (>) observation
    by_t = {}
    epoch = dt.datetime(1970, 1, 1)
    for i, (off, vm) in enumerate(obs):
        t_us = int((base + dt.timedelta(seconds=off) - epoch)
                   .total_seconds() * 1_000_000)
        if t_us not in by_t or by_t[t_us][0] < i:
            by_t[t_us] = (i, round((vm / 1_000_000.0) * 1_000_000))
    pts = sorted((t, v) for t, (_, v) in by_t.items())
    lo, hi = pts[0][0], pts[-1][0]
    want = {}
    g = (lo // US_PER_HOUR + 1) * US_PER_HOUR
    while g <= ((hi - 1) // US_PER_HOUR) * US_PER_HOUR:
        prev = max((p for p in pts if p[0] <= g), key=lambda p: p[0])
        nxts = [p for p in pts if p[0] > g]
        if nxts:
            nxt = min(nxts, key=lambda p: p[0])
            pt, pv = prev
            nt, nv = nxt
            q = (abs(nv - pv) * (g - pt)) // (nt - pt)
            val = pv + (-q if nv - pv < 0 else q)
            hour = (epoch + dt.timedelta(microseconds=g)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            want[hour] = val
        g += US_PER_HOUR
    assert out == want


@given(
    doc_sets=st.lists(
        st.sets(st.sampled_from(_words("g", 10)), min_size=1, max_size=8),
        min_size=2,
        max_size=7,
    ),
    t_num=st.sampled_from([1, 2, 3]),
)
@settings(**_SETTINGS)
def test_containment_positional_filter_is_lossless(spark, doc_sets, t_num):
    """Direct machine check of the PPJoin+ positional filter's minimality
    argument (operators/dedup.py `_containment_candidates` docstring):
    in exact mode (max_df=None), the candidate set AFTER the positional
    first-match-rank bound min(|A|-i+1, |B|-j+1) >= ceil(t|A|) must be a
    SUPERSET of the true containment pairs — for ANY shingle-set shapes,
    including the adversarial ones (shared shingles scattered across df
    ranks, docs that are subsets of each other, singleton docs) that the
    end-to-end text test can't target directly.  The filter may
    over-admit (the verify step prunes); it must never drop a true pair."""
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        _containment_candidates,
    )

    t_den = 4
    sh = spark.createDataFrame(
        [(i, s) for i, ss in enumerate(doc_sets) for s in ss],
        "doc_id long, shingle string",
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    got = {
        (r.doc_a, r.doc_b)
        for r in _containment_candidates(
            sh, sizes, t_num, t_den, "doc_id", max_df=None
        ).collect()
    }
    true_pairs = {
        (a, b)
        for a, sa in enumerate(doc_sets)
        for b, sb in enumerate(doc_sets)
        if a != b and len(sa & sb) * t_den >= t_num * len(sa)
    }
    assert true_pairs <= got, (
        f"positional filter dropped true pairs: {true_pairs - got}"
    )


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(_words("w", 6)), min_size=0, max_size=10
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
)
@settings(**_SETTINGS)
def test_ngram_lm_matches_python_reference(spark, texts):
    """First-principles check of the add-1 bigram scorer on arbitrary
    corpora (empty docs, single-token docs, all-identical docs, unseen-
    context shapes): per-doc n_terms and micro-rounded neg-logprob sums
    must equal a direct python computation of the same integer-count
    ratios."""
    import math

    from mapreducemovieanalysis_cloud_spark.operators import ngram_lm

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_terms, r.neg_logprob_micro, r.avg_neg_logprob_micro)
        for r in ngram_lm.score_documents(
            docs, ngram_lm.ngram_model(docs)
        ).collect()
    }

    def toks(t):
        # engine convention (Spark split == DuckDB string_split_regex):
        # an all-whitespace text yields ONE empty token, not zero — the
        # reference must count '' into the vocab the same way
        ts = t.strip().split()
        return ts if ts else [""]

    grams = {
        i: [
            (f"{ts[j]} {ts[j+1]}", ts[j])
            for j in range(len(ts) - 1)
        ]
        for i, t in enumerate(texts)
        for ts in [toks(t)]
    }
    nc, cc, vocab = {}, {}, set()
    for i, t in enumerate(texts):
        vocab.update(toks(t))
        for g, c in grams[i]:
            nc[g] = nc.get(g, 0) + 1
            cc[c] = cc.get(c, 0) + 1
    want = {}
    for i, gs in grams.items():
        if not gs:
            continue  # unscorable: must be absent
        s = sum(
            -math.log((nc[g] + 1) / (cc[c] + len(vocab))) for g, c in gs
        )
        want[i] = (
            len(gs),
            round(s * 1_000_000),
            round(s / len(gs) * 1_000_000),
        )
    # python round() is banker's; the engines round half away from zero.
    # Exact .5 micro boundaries are measure-zero for logs — compare with
    # 1-micro tolerance to keep the property deterministic regardless.
    assert got.keys() == want.keys()
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) <= 1
        assert abs(got[i][2] - want[i][2]) <= 1


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-5, 5)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_profile_columns_matches_bruteforce(spark, rows):
    """The union-of-pruned-scans exact profile must agree with a plain
    Python computation of rows/nulls/distinct/min/max per column —
    randomized null placement and duplicate density, both an int and a
    string column."""
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        profile_columns,
    )

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("i", IntegerType(), True),
            StructField("s", StringType(), True),
        ]
    )
    df = spark.createDataFrame(rows, schema).coalesce(2)
    got = {
        r["column_name"]: r
        for r in profile_columns(df, ["i", "s"]).collect()
    }
    for col, idx in (("i", 0), ("s", 1)):
        vals = [r[idx] for r in rows]
        nn = [v for v in vals if v is not None]
        r = got[col]
        assert r["n_rows"] == len(vals)
        assert r["n_nulls"] == len(vals) - len(nn)
        assert r["n_distinct"] == len(set(nn))
        assert r["min_value"] == (str(min(nn)) if nn else None)
        assert r["max_value"] == (str(max(nn)) if nn else None)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_duplicate_passages_matches_bruteforce(spark, docs, n):
    """The two-stage (fp, doc) rollup must produce exactly the naive
    per-window statistics: distinct docs, total occurrences, first doc —
    randomized window overlap and same-doc repeats (the partial-collapse
    path the Expand-free rework has to keep correct)."""
    from collections import defaultdict

    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        duplicate_passages,
    )

    texts = [" ".join(d) for d in docs]
    sdf = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        r["passage"]: (r["n_docs"], r["n_occurrences"], r["first_doc"])
        for r in duplicate_passages(
            sdf, n=n, min_docs=2, topk=1000
        ).collect()
    }
    by_passage = defaultdict(list)
    for doc_id, toks in enumerate(docs):
        for i in range(len(toks) - n + 1):
            by_passage[" ".join(toks[i : i + n])].append(doc_id)
    want = {
        p: (len(set(ds)), len(ds), min(ds))
        for p, ds in by_passage.items()
        if len(set(ds)) >= 2
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "en", "en", "es", "de"]),
            st.integers(-5, 5),
            st.integers(1, 4),
        ),
        min_size=1,
        max_size=30,
    ),
    nparts=st.integers(2, 5),
)
@settings(**_SETTINGS)
def test_two_phase_prefix_sum_matches_window(spark, rows, nparts):
    """ccnet._grouped_cum_before (two-phase distributed prefix sum) is
    bit-identical to the naive single-partition window for ANY key
    skew, duplicate-score collisions, and partition count — integer
    addition associativity is the whole argument, so machine-check it."""
    from pyspark.sql import Window

    from mapreducemovieanalysis_cloud_spark.operators.ccnet import (
        _grouped_cum_before,
    )

    # collapse to the (grp, score) group table the operator consumes
    agg: dict = {}
    for g, s, c in rows:
        agg[(g, s)] = agg.get((g, s), 0) + c
    gs = spark.createDataFrame(
        [(g, s, c) for (g, s), c in agg.items()],
        "grp string, score long, cnt long",
    )
    got = {
        (r.grp, r.score): r.cum_before
        for r in _grouped_cum_before(
            gs, "grp", "score", "cnt", num_partitions=nparts
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        (r.grp, r.score): r.cb
        for r in gs.select(
            "grp",
            "score",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cb"),
        ).collect()
    }
    assert got == want


@given(
    members=st.lists(
        st.tuples(
            st.integers(0, 9),  # component label
            st.integers(0, 99),  # doc id (deduped below)
            st.integers(0, 5),  # priority
        ),
        min_size=1,
        max_size=25,
    ),
)
@settings(**_SETTINGS)
def test_canonical_survivors_matches_bruteforce(spark, members):
    """The agg-based arg-max survivor equals the brute-force rule
    (max priority, tie -> min id) for any component shapes and ties."""
    from mapreducemovieanalysis_cloud_spark.operators.clustering import (
        canonical_survivors,
    )

    seen: dict = {}
    for comp, did, prio in members:
        seen[did] = (comp, prio)
    docs = spark.createDataFrame(
        [(did, "x" * prio) for did, (comp, prio) in seen.items()],
        "doc_id long, text string",
    )
    comps = spark.createDataFrame(
        [(did, comp) for did, (comp, prio) in seen.items()],
        "doc_id long, component long",
    )
    out = {
        r.doc_id: (r.survivor_id, r.is_survivor)
        for r in canonical_survivors(
            docs, comps, F.length("text")
        ).collect()
    }
    by_comp: dict = {}
    for did, (comp, prio) in seen.items():
        by_comp.setdefault(comp, []).append((did, prio))
    for comp, mem in by_comp.items():
        surv = sorted(mem, key=lambda m: (-m[1], m[0]))[0][0]
        for did, _ in mem:
            assert out[did] == (surv, 1 if did == surv else 0)


@given(
    docs=st.lists(
        st.lists(
            st.text(
                alphabet="abc1!.XY the",  # mixes alpha, digit, punct, space-free
                min_size=1,
                max_size=25,
            ).map(lambda w: w.replace(" ", "") or "w"),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_gopher_rule_flags_match_bruteforce(spark, docs):
    """The wave-3 quality-rule battery vs a literal python
    reimplementation of its five rules, over adversarial token soups
    (1-char words, all-digit words, 20+-char words, stopword-free
    docs) — every (rule, fail-count) cell must agree."""
    import re as _re
    import tempfile

    from mapreducemovieanalysis_cloud_spark.queries.round7_staged import (
        _GOPHER_STOPS,
        gopher_rules_report,
    )

    rows = [
        (i, " ".join(words), "s") for i, words in enumerate(docs)
    ]
    expect = {r: 0 for r in (
        "word_count", "mean_word_len", "alpha_ratio", "stopwords",
        "max_word_len",
    )}
    for _, text, _src in rows:
        # brute force mirrors Spark's split(trim, \s+) on these inputs
        ws = text.strip().split()
        if not ws:
            ws = [""]
        n = len(ws)
        sum_len = sum(len(w) for w in ws)
        n_alpha = sum(1 for w in ws if _re.search("[A-Za-z]", w))
        n_stop = sum(1 for w in ws if w.lower() in _GOPHER_STOPS)
        mx = max(len(w) for w in ws)
        expect["word_count"] += 1 if (n < 10 or n > 100000) else 0
        expect["mean_word_len"] += (
            1 if (sum_len * 100 < 300 * n or sum_len * 100 > 1000 * n)
            else 0
        )
        expect["alpha_ratio"] += 1 if n_alpha * 100 < 80 * n else 0
        expect["stopwords"] += 1 if n_stop < 2 else 0
        expect["max_word_len"] += 1 if mx > 20 else 0

    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            "source",
            F.length("text").cast("long").alias("n_chars"),
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = gopher_rules_report(spark, d).collect()
    got = {r.rule: r.n_fail for r in out}
    assert got == expect


def test_profile_columns_empty_input_reports_zero_rows(spark):
    """An empty ingest batch is a state the validation gate must handle:
    n_rows/n_nulls/n_distinct are 0 (not NULL — a NULL row count falls
    out of any threshold comparison silently; r06 advisor)."""
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        profile_columns,
    )

    df = spark.createDataFrame([], "i int, s string")
    got = {
        r["column_name"]: r for r in profile_columns(df, ["i", "s"]).collect()
    }
    for col in ("i", "s"):
        r = got[col]
        assert r["n_rows"] == 0
        assert r["n_nulls"] == 0
        assert r["n_distinct"] == 0
        assert r["min_value"] is None
        assert r["max_value"] is None


def test_canonical_survivors_string_ids(spark):
    """String doc ids — accepted everywhere else in the dedup family —
    must work in the survivor rule too (the old max(struct(priority,
    -id)) arg-max threw CAST_INVALID_INPUT under ANSI mode; r06
    advisor).  Tie-break is lexicographic min id, matching the oracle's
    ORDER BY priority DESC, doc_id."""
    from mapreducemovieanalysis_cloud_spark.operators.clustering import (
        canonical_survivors,
    )

    docs = spark.createDataFrame(
        [("d-b", "xxxx"), ("d-a", "xxxx"), ("d-c", "x"), ("e-1", "yy")],
        "doc_id string, text string",
    )
    comps = spark.createDataFrame(
        [("d-b", "c1"), ("d-a", "c1"), ("d-c", "c1"), ("e-1", "c2")],
        "doc_id string, component string",
    )
    out = {
        r.doc_id: (r.survivor_id, r.is_survivor)
        for r in canonical_survivors(docs, comps, F.length("text")).collect()
    }
    # c1: d-a and d-b tie on priority 4 -> lexicographic min id d-a wins
    assert out == {
        "d-a": ("d-a", 1),
        "d-b": ("d-a", 0),
        "d-c": ("d-a", 0),
        "e-1": ("e-1", 1),
    }
