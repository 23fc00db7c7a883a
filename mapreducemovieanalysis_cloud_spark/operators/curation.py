"""Corpus-curation operators beyond dedup: repetition statistics, corpus
n-gram/document-frequency tables, per-group balancing caps, PII scrubbing,
and gap-based sessionization.

These are the remaining filters a large-scale training-data pipeline runs
between raw scans and dedup (Gopher/C4-style repetition gates, source
balancing, PII redaction) — absent from the reference (two fixed MR jobs,
``/root/reference/MovieRank.java``, ``MovieRating.java``), required by the
gap categories in SURVEY.md §2.2.

Scale posture: every operator here is a single scan plus at most two hash
exchanges on bounded-cardinality keys (doc_id, n-gram, source, user_id) —
most need one, repetition_stats needs two (per-gram then per-doc; see its
docstring and the PLANS.md audit). Nothing materializes per-pair state;
the explode outputs are (id, gram) pairs of ~tens of bytes that
partial-aggregate map-side before the shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

from mapreducemovieanalysis_cloud_spark.functions import text as T

# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality gates)
# ---------------------------------------------------------------------------


def repetition_stats(df: DataFrame, n: int = 2) -> DataFrame:
    """Per-document n-gram repetition statistics.

    For each doc: total n-grams, distinct n-grams, the count of the most
    frequent n-gram, and the duplicate-gram fraction
    ``(total - distinct) / total`` — the standard Gopher repetition gate
    inputs ("fraction of duplicated n-grams").

    Plan: tokenize once (projected — CSE does not reach into lambda trees),
    explode positional n-grams, two-level aggregate. The explode shuffles
    (doc_id, gram) with map-side partial counts; the second aggregate is a
    near-no-op re-group on doc_id. Docs with fewer than ``n`` tokens have no
    n-grams and are absent from the output (same as the SQL oracle).
    """
    toks = df.select("doc_id", T.tokens("text").alias("toks"))
    grams = toks.select(
        "doc_id", F.explode(T.shingles_from_tokens(F.col("toks"), n)).alias("gram")
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.max("cnt").cast("long").alias("top_gram_count"),
        (
            (F.sum("cnt") - F.count(F.lit(1))).cast("double")
            / F.sum("cnt").cast("double")
        ).alias("dup_gram_ratio"),
    )


def ngram_corpus_topk(df: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide top-k n-grams by total occurrence count.

    Output: gram, total_count (all occurrences), doc_freq (documents
    containing it), ordered by total_count desc with the gram string as the
    unique deterministic tie-break. One explode + one exchange on the gram;
    top-k executes as TakeOrderedAndProject (per-partition heaps), never a
    global sort.
    """
    toks = df.select("doc_id", T.tokens("text").alias("toks"))
    grams = toks.select(
        "doc_id", F.explode(T.shingles_from_tokens(F.col("toks"), n)).alias("gram")
    )
    agg = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    return agg.orderBy(F.desc("total_count"), F.asc("gram")).limit(k)


def token_doc_frequency(df: DataFrame, k: int = 30) -> DataFrame:
    """Token document-frequency table (the IDF building block), top-k by
    doc_freq with the token as tie-break. Integer outputs only — IDF's
    ``ln`` is left to the consumer so the result stays engine-exact.

    corpus_freq counts every occurrence; doc_freq counts distinct docs.
    Both come out of ONE explode + one exchange (count + count_distinct in
    the same aggregate; Spark plans the distinct via expand, still a single
    shuffle stage group).
    """
    toks = df.select("doc_id", F.explode(T.tokens("text")).alias("token"))
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("corpus_freq"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    return agg.orderBy(F.desc("doc_freq"), F.asc("token")).limit(k)


# ---------------------------------------------------------------------------
# per-group balancing cap
# ---------------------------------------------------------------------------


def cap_per_group(
    df: DataFrame, group_col: str, id_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by a deterministic
    pseudo-random order (md5 of the row id) so the kept subset is unbiased
    but bit-reproducible across engines, retries, and partitionings.

    This is the "per-source cap" balancing step of corpus curation: bound
    any single domain's contribution before training. One exchange on
    ``group_col`` + per-partition sort; no global sort. Skewed sources are
    exactly the sources this op truncates, so the window partition that
    matters most shrinks to ``cap`` rows on output.
    """
    order_key = F.md5(F.concat(F.lit("cap:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order_key, F.col(id_col))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .select(id_col, group_col, "rn")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact email/phone PII patterns; emit per-doc counts and
    the md5 fingerprint of the redacted text (the fingerprint keeps the
    oracle comparison exact without hauling full redacted bodies around).

    Pure JVM regex expressions over the scan — zero shuffles, no UDF. The
    patterns use the Java-regex/RE2 common subset so any engine replicates
    them byte-for-byte.
    """
    c = F.col(text_col)
    emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0))
    phones = F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        "doc_id",
        emails.cast("long").alias("n_emails"),
        phones.cast("long").alias("n_phones"),
        F.md5(F.encode(redacted, "UTF-8")).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# gap-based sessionization (batch)
# ---------------------------------------------------------------------------


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps
    > ``gap_seconds``; aggregate one row per session.

    The classic batch sessionization: lag over (user, ts) marks boundaries,
    a running sum numbers the sessions, a group-by collapses them. Both
    window passes and the final aggregate share ONE exchange on user_id —
    Spark reuses the partitioning across the two sorts and the group-by, so
    the whole operator is a single shuffle regardless of event volume.
    (The streaming twin is ``session_window`` in streaming/windows.py.)

    Timestamps compare in integer microseconds (``unix_micros``) so the gap
    predicate and durations are exact in any engine. ``tiebreak_col`` makes
    the within-timestamp order deterministic; ``value_col`` is summed in
    exact cents.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_us = gap_seconds * 1_000_000
    with_bounds = df.withColumn(
        "new_sess",
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us), 1
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_bounds.groupBy(user_col, "session_idx").agg(
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.max(us) - F.min(us)) / F.lit(1_000_000)
        ).cast("long").alias("duration_s"),
        F.sum(round_half_up_long(F.col(value_col) * 100))
        .cast("long")
        .alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# stratified deterministic sampling
# ---------------------------------------------------------------------------


def sample_stratified(
    df: DataFrame,
    group_col: str,
    id_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-group deterministic sampling: keep ``rates_pct[group]`` percent
    of each group's rows, selected by md5-bucket of the row id — the
    language/source-rebalancing counterpart to ``cap_per_group`` (rates
    instead of absolute caps).

    Like ``sample_deterministic``, membership is a pure function of the
    KEY: stable across engines, partitionings, retries, and appends (a new
    batch's rows don't perturb which old rows are in-sample — critical for
    reproducible training mixes). Zero shuffles: the gate is a map-side
    predicate on md5(id) mod 100.
    """
    from mapreducemovieanalysis_cloud_spark.functions.hashing import (
        md5_bucket,
    )

    bucket = md5_bucket(id_col, 100)
    rate = F.lit(default_pct)
    for g, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(group_col) == g, F.lit(pct)).otherwise(rate)
    return df.where(bucket < rate)


def negative_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    num_buckets: int = 16,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training data: pair
    each row with its next ``k`` successors in md5 order within a hash
    bucket — (id_a, id_b, neg_rank).

    The md5 order is effectively random but a pure key function, so the
    SAME negatives come out of any engine, partitioning, retry, or later
    re-run (reproducible training mixes, same property as
    ``sample_stratified``). One exchange on the bucket key, one
    per-bucket sort, ``k`` lead() picks — no cross join, no global index,
    no RNG state. Rows in a bucket's final ``k`` md5 positions emit fewer
    pairs (no cyclic wrap — the oracle mirrors lead()'s null-drop
    exactly); at ``num_buckets`` scaled to ~corpus/100k the loss is
    negligible and per-bucket sorts stay memory-bounded.
    """
    from mapreducemovieanalysis_cloud_spark.functions.hashing import (
        md5_bucket,
    )

    keyed = df.select(
        F.col(id_col).alias("id_a"),
        md5_bucket(id_col, num_buckets, salt=seed + "b:").alias("__b"),
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))).alias(
            "__ord"
        ),
    )
    w = Window.partitionBy("__b").orderBy("__ord", "id_a")
    picks = [
        F.lead("id_a", i).over(w).alias(f"__n{i}") for i in range(1, k + 1)
    ]
    wide = keyed.select("id_a", *picks)
    stacked = wide.select(
        "id_a",
        F.posexplode(F.array(*[F.col(f"__n{i}") for i in range(1, k + 1)])).alias(
            "__p", "id_b"
        ),
    )
    return (
        stacked.where(F.col("id_b").isNotNull())
        .select(
            "id_a",
            "id_b",
            (F.col("__p") + 1).cast("int").alias("neg_rank"),
        )
    )


def _encode_positions(
    df: DataFrame,
    vocab_size: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, pos, tok_id): every document position encoded against the
    corpus-trained top-``vocab_size`` vocabulary (frequency desc, token
    asc — deterministic; dense ids 0..V-1; OOV = -1) — the ONE shared
    tokenize + vocab-train + encode prelude of ``tokenize_with_vocab``,
    ``masked_lm_dataset``, and ``span_corruption_dataset``, extracted
    so a tokenization or tie-break change cannot desynchronize the
    three (their tests compare outputs cross-consistently).

    The id-assignment window runs over the AGGREGATED token table (V
    rows survive the limit; the aggregate is map-side combined), so the
    single-partition sort touches vocab-sized data, never corpus-sized;
    encoding is a broadcast join on token, entirely JVM-side.

    Deliberately NOT fan_out_underparallel'd (the minhash-family
    rebalance): measured on the round-13 interleaved A/B, the per-
    position work left after the span-draw delag (one md5 at most) is
    too light to pay for the extra exchange — tokenize_to_ids read
    +0.27 s WITH the rebalance, masked_lm −0.11, span ±0.05.
    """
    from mapreducemovieanalysis_cloud_spark.functions.text import tokens

    toked = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    freq = (
        toked.select(F.explode("__t").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(vocab_size)
    )
    wv = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    vocab = freq.select(
        "token", (F.row_number().over(wv) - 1).cast("long").alias("tok_id")
    )
    pos = toked.select(
        F.col(id_col), F.posexplode("__t").alias("pos", "token")
    )
    return pos.join(F.broadcast(vocab), "token", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce("tok_id", F.lit(-1)).alias("tok_id"),
    )


def tokenize_with_vocab(
    df: DataFrame,
    vocab_size: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents against a corpus-trained vocabulary
    (``_encode_positions``) and emit each doc's token-id sequence as a
    CSV string with OOV as -1, plus token/OOV counts — the standard
    "tokenize against a trained vocab" pass of an LLM data pipeline,
    one ordered per-doc re-assembly over the encoded positions.
    """
    encoded = _encode_positions(df, vocab_size, id_col, text_col)
    return encoded.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
                lambda s: s.tok_id.cast("string"),
            ),
            ",",
        ).alias("ids_csv"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("tok_id") == -1).cast("long")).alias("n_oov"),
    )


# 15% masking rate as a 32-bit md5 threshold: floor(0.15 * 2^32) — a
# baked integer literal shared with the oracle (the POISSON1_T32 /
# BENFORD_MICRO rule: no float rate compare at query time)
MASK_THRESHOLD_U32 = 644_245_094
MASK_ID = -2
IGNORE_LABEL = -100


def masked_lm_dataset(
    df: DataFrame,
    vocab_size: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mask",
) -> DataFrame:
    """BERT-style masked-LM training pairs, constructed deterministically
    in one distributed pass: tokenize against the corpus-trained
    top-``vocab_size`` vocabulary (the ``tokenize_with_vocab`` encode),
    mask each position independently with probability 15% — the
    decision is a pure integer function of (doc, 1-based position):
    md5(salt:doc:pos) 32-bit slice < MASK_THRESHOLD_U32, so the SAME
    document yields the SAME mask set in every engine, run, and
    partitioning — and emit the (input_ids, labels) pair every masked-LM
    trainer consumes: masked inputs read MASK_ID (-2), labels carry the
    original id at masked positions and IGNORE_LABEL (-100) elsewhere.

    Simplification by contract: all selected positions become [MASK]
    (no BERT 80/10/10 random/keep split — the 10% random-token arm
    would need a corpus-order-dependent draw that no oracle could
    replay; pipelines that want it apply it at trainer time).

    Scale: identical posture to tokenize_with_vocab — the shared
    ``_encode_positions`` prelude (vocab-sized sort, broadcast encode
    join), one doc-keyed re-assembly; the mask draw is map-side
    expression work on rows that already exist.
    """
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col(id_col).cast("string"),
                    (F.col("pos") + 1).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    encoded = (
        _encode_positions(df, vocab_size, id_col, text_col)
        .select(
            F.col(id_col),
            "pos",
            "tok_id",
            (draw < F.lit(MASK_THRESHOLD_U32)).alias("masked"),
        )
        .select(
            F.col(id_col),
            "pos",
            F.when(F.col("masked"), F.lit(MASK_ID))
            .otherwise(F.col("tok_id"))
            .alias("in_id"),
            F.when(F.col("masked"), F.col("tok_id"))
            .otherwise(F.lit(IGNORE_LABEL))
            .alias("label"),
            F.col("masked").cast("long").alias("m"),
        )
    )

    def _csv(field: str) -> Column:
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", F.col(field).alias("v")))
                ),
                lambda s: s.v.cast("string"),
            ),
            ",",
        )

    return encoded.groupBy(id_col).agg(
        _csv("in_id").alias("input_ids_csv"),
        _csv("label").alias("labels_csv"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("m").alias("n_masked"),
    )


def ares_priority(
    weight_col: str, id_col: str = "doc_id", salt: str = "ares"
) -> Column:
    """The A-Res log-space priority as a reusable expression: ln(u)/w in
    micro units, u drawn from md5(salt:id) — pure function of the id, so
    the SAME document carries the SAME priority in every sampler built on
    it (global, stratified, reservoir-merge).  Weights must be strictly
    positive: w <= 0 makes ln(u)/w NULL/inf, and engines disagree on
    NULL placement under DESC ordering — filter or clamp upstream rather
    than relying on either engine's default."""
    v = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (v + F.lit(1)).cast("double") / F.lit(4294967297.0)
    return round_half_up_long(
        F.log(u) / F.col(weight_col).cast("double") * 1_000_000
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ares",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each row draws u in (0,1) from md5(salt:id) and the
    k rows with the largest priority u^(1/w) win — inclusion probability
    proportional to weight, exactly the length/quality-weighted document
    draw training mixes use.

    The priority is compared in log space (ln(u)/w, larger is better —
    monotone in u^(1/w), no underflow for tiny u or huge w) and ROUNDED to
    micro units before the top-k, with the id as the total-order tiebreak:
    libm ln() may differ in the last ulp across engines, and an unrounded
    float comparator would let that ulp reorder the boundary row.  Like
    every sampler here, membership is a pure function of the KEY — stable
    across engines, partitionings, retries, and appends.

    Scale: the draw is a map-side expression; the top-k is a
    TakeOrderedAndProject (per-partition heaps of k, never a global
    sort).  Output columns: (id, weight, priority_micro)."""
    key = ares_priority(weight_col, id_col, salt)
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("priority_micro"),
        )
        .orderBy(F.desc("priority_micro"), id_col)
        .limit(k)
    )


def llr_keyness(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    topk: int = 10,
    min_support: int = 5,
) -> DataFrame:
    """Distinctive vocabulary per group by Dunning's log-likelihood-ratio
    keyness: for each (group, token), a = in-group occurrences,
    b = rest-of-corpus occurrences, and

        LLR = 2·(a·ln(a·N/(A·(a+b))) + b·ln(b·N/(B·(a+b))))

    (A/B in-/out-group token totals, N = A+B).  Tokens are kept only when
    OVER-represented (a·N > A·(a+b), decided in exact int64) and supported
    (a+b >= min_support); the top-``topk`` per group are ranked by
    micro-rounded LLR with the token string as the total-order tiebreak —
    the ranking key is the already-rounded integer, so a sub-ulp float
    divergence can never reorder engines.

    Scale: one token explode feeding two grouped counts (group×token,
    token) plus two scalar/group totals; joins key on the token and the
    group — the corpus text itself never shuffles.  The double steps are
    two ln() calls on ratios of int64 counts (identical operands both
    engines); products stay in doubles so no int64 overflow gate applies.
    """
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(T.tokens(text_col)).alias("tok"),
    ).where(F.length("tok") > 0)
    a = toks.groupBy("g", "tok").agg(F.count(F.lit(1)).alias("cin"))
    tot = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ab"))
    grp = toks.groupBy("g").agg(F.count(F.lit(1)).alias("gtot"))
    n_total = grp.agg(F.sum("gtot").alias("ntot"))
    j = (
        a.join(tot, "tok")
        .join(F.broadcast(grp), "g")
        .crossJoin(F.broadcast(n_total))
        .withColumn("cout", F.col("ab") - F.col("cin"))
        .withColumn("resttot", F.col("ntot") - F.col("gtot"))
        .where(
            (F.col("ab") >= min_support)
            & (F.col("cin") * F.col("ntot") > F.col("gtot") * F.col("ab"))
        )
    )
    ad, bd = F.col("cin").cast("double"), F.col("cout").cast("double")
    nd = F.col("ntot").cast("double")
    abd = F.col("ab").cast("double")
    term_a = ad * F.log(ad * nd / (F.col("gtot").cast("double") * abd))
    term_b = F.when(F.col("cout") == 0, F.lit(0.0)).otherwise(
        bd * F.log(bd * nd / (F.col("resttot").cast("double") * abd))
    )
    scored = j.select(
        F.col("g").alias(group_col),
        F.col("tok").alias("token"),
        F.col("cin").cast("long").alias("cnt_in"),
        F.col("cout").cast("long").alias("cnt_out"),
        round_half_up_long((term_a + term_b) * 2 * 1_000_000).alias(
            "llr_micro"
        ),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("llr_micro").desc(), F.col("token")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= topk)
        .drop("__rk")
    )


def boilerplate_shingles(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 3,
    permille: int = 100,
) -> DataFrame:
    """Per-source boilerplate n-grams: word shingles appearing in at least
    ``min_df`` documents AND at least ``permille``/1000 of the source's
    documents — the template/header/footer detector that runs before
    near-dedup so shared boilerplate doesn't glue unrelated docs into one
    near-dup cluster (the C4/MassiveText line-dedup motivation, lifted to
    shingles).

    Both gates are exact integer comparisons (df·1000 >= docs·permille);
    output carries df, the source's doc count, and the floor-permille
    share.

    Scale: distinct (source, doc, shingle) explode partial-aggregates
    map-side into (source, shingle) df counts; the per-source doc count
    broadcasts.  Output is bounded by genuinely repeated shingles — random
    text yields ~nothing, templated corpora yield the template.
    """
    toked = docs.select(
        F.col(source_col),
        F.col(id_col),
        T.tokens(text_col).alias("__toks"),
    )
    sh = toked.select(
        F.col(source_col),
        F.col(id_col),
        F.explode(
            F.array_distinct(T.shingles_from_tokens(F.col("__toks"), n))
        ).alias("shingle"),
    )
    df_counts = sh.groupBy(source_col, "shingle").agg(
        F.count(F.lit(1)).alias("df")
    )
    per_source = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("docs_in_source")
    )
    return (
        df_counts.join(F.broadcast(per_source), source_col)
        .where(
            (F.col("df") >= min_df)
            & (
                F.col("df") * 1000
                >= F.col("docs_in_source") * F.lit(permille)
            )
        )
        .select(
            F.col(source_col),
            "shingle",
            F.col("df").cast("long").alias("df"),
            F.col("docs_in_source").cast("long").alias("docs_in_source"),
            F.expr("CAST(df * 1000 div docs_in_source AS BIGINT)").alias(
                "df_permille"
            ),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "a", "in", "that")


def gopher_doc_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Per-document Gopher-style quality-rule flags (Rae et al. 2021,
    Table A1 style), the SHARED kernel behind the per-source fail-rate
    report (``gopher_rules_report``) and the end-to-end curation gate
    (``curate_corpus_v2``) — one implementation so the audit measures
    exactly the rule the pipeline enforces.

    Five rules, one 0/1 ``f_*`` column each: word count in [10, 100000]
    (``f_wc``), mean word length in [3, 10] (``f_mwl``), >=80% words
    containing an alphabetic char (``f_ar``), >=2 stopwords (``f_sw``),
    max word length <= 20 (``f_mx``).

    Scale: tokens materialized once in their own projection (the HOF
    no-CSE cliff, SCALE.md); every rule is a pure map-side array
    aggregate — no explode, no token-row shuffle, no exchange at all.
    All thresholds integer cross-multiplications so the DuckDB oracle
    is bit-identical."""
    toked = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        T.tokens(text_col).alias("__t"),
    )
    per_doc = toked.select(
        id_col,
        *extra_cols,
        F.size("__t").alias("__n_words"),
        F.aggregate(
            "__t", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).alias("__sum_len"),
        F.size(F.filter("__t", lambda w: w.rlike("[A-Za-z]"))).alias(
            "__n_alpha"
        ),
        F.size(
            F.filter("__t", lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))
        ).alias("__n_stop"),
        F.array_max(F.transform("__t", F.length)).alias("__max_len"),
    )
    return per_doc.select(
        id_col,
        *extra_cols,
        (
            (F.col("__n_words") < 10) | (F.col("__n_words") > 100000)
        ).cast("long").alias("f_wc"),
        (
            (F.col("__sum_len") * 100 < 300 * F.col("__n_words"))
            | (F.col("__sum_len") * 100 > 1000 * F.col("__n_words"))
        ).cast("long").alias("f_mwl"),
        (F.col("__n_alpha") * 100 < 80 * F.col("__n_words"))
        .cast("long")
        .alias("f_ar"),
        (F.col("__n_stop") < 2).cast("long").alias("f_sw"),
        (F.col("__max_len") > 20).cast("long").alias("f_mx"),
    )


# 5% span-START rate as a 32-bit md5 threshold: floor(0.05 * 2^32); with
# fixed span length 3 the expected corruption rate is ~15%, matching the
# masked-LM rate
SPAN_START_THRESHOLD_U32 = 214_748_364
SPAN_LEN = 3
SENTINEL_BASE = -200  # span k reads sentinel -(200 + k)


def span_corruption_dataset(
    df: DataFrame,
    vocab_size: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "span",
) -> DataFrame:
    """T5-style span-corruption training pairs, deterministic end to
    end: tokenize against the corpus-trained top-``vocab_size``
    vocabulary, start a corruption span (fixed length {L}) at each
    position independently with probability 5% — the start decision is
    md5(salt:doc:pos) 32-bit slice < SPAN_START_THRESHOLD_U32, a pure
    function of (doc, 1-based position) — merge overlapping/adjacent
    coverage, and emit the T5 pair: inputs keep uncorrupted tokens and
    collapse each span to ONE sentinel id -(200 + k); targets list,
    per span in order, its sentinel followed by the original ids.

    A position i is covered iff ANY of the starts i, i-1, ...,
    i-(SPAN_LEN-1) fired (the coverage OR is BUILT from SPAN_LEN, as is
    the oracle's fired-offset list — one constant owns the length) —
    recomputable per position from the pure draw, so coverage needs no
    ordered scan; span BOUNDARIES (covered and predecessor uncovered)
    come from one lag over the doc's positions and the sentinel index
    from one cumulative sum — the gaps-and-islands shape the
    decontaminate span merge already uses.

    Simplifications by contract (mirrors masked_lm_dataset's): fixed
    span length instead of T5's sampled lengths, and no final
    end-sentinel — both would need draws no independent oracle could
    replay without also fixing them, and neither changes the
    distributed shape.

    Scale: identical posture to tokenize_with_vocab plus two per-doc
    windows over token rows (lag + running sum) — the per-doc-sequence
    state every packing/chunking operator already carries.
    """

    def _start_fired(p) -> Column:
        # md5 draw at 1-based position p (NULL-safe: p < 1 never fires)
        return F.when(
            p >= 1,
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(salt),
                            F.col(id_col).cast("string"),
                            p.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            < F.lit(SPAN_START_THRESHOLD_U32),
        ).otherwise(F.lit(False))

    # ONE md5 draw per position; coverage reads the two predecessors'
    # draws via lag over the window the span machinery pays for anyway.
    # Value-identical to evaluating _start_fired at (p, p-1, p-2) per
    # row — positions are dense 0..n-1 per doc, so lag(fired, k) IS the
    # draw at p-k, and the coalesce(False) default matches
    # _start_fired's p < 1 => False contract.  The former expression
    # recomputed each neighbour's md5 in place: 3x the digests, all on
    # the map side (round-13 optimization, guide §1.2 per-task work).
    one_based = F.col("pos") + 1
    w = Window.partitionBy(id_col).orderBy("pos")
    enc = _encode_positions(df, vocab_size, id_col, text_col).select(
        F.col(id_col),
        "pos",
        "tok_id",
        _start_fired(one_based).alias("fired"),
    )
    covered = reduce(
        lambda a, b: a | b,
        (
            F.coalesce(F.lag("fired", k).over(w), F.lit(False))
            for k in range(1, SPAN_LEN)
        ),
        F.col("fired"),
    )
    spans = enc.select(
        F.col(id_col),
        "pos",
        "tok_id",
        covered.alias("cov"),
    ).select(
        F.col(id_col),
        "pos",
        "tok_id",
        "cov",
        (
            F.col("cov")
            & ~F.coalesce(F.lag("cov").over(w), F.lit(False))
        ).alias("is_start"),
    ).select(
        F.col(id_col),
        "pos",
        "tok_id",
        "cov",
        "is_start",
        # sentinel index: how many span starts up to and including here
        (F.sum(F.col("is_start").cast("long")).over(w) - 1).alias("k"),
    )

    def _csv(rows_filter: Column, piece: Column) -> Column:
        return F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                rows_filter,
                                F.struct("pos", piece.alias("v")),
                            )
                        )
                    ),
                    lambda s: F.split(s.v, ","),
                )
            ),
            ",",
        )

    sentinel = (F.lit(SENTINEL_BASE) - F.col("k")).cast("long")
    in_piece = F.when(
        F.col("is_start"), sentinel.cast("string")
    ).otherwise(F.col("tok_id").cast("string"))
    tgt_piece = F.when(
        F.col("is_start"),
        F.concat_ws(
            ",", sentinel.cast("string"), F.col("tok_id").cast("string")
        ),
    ).otherwise(F.col("tok_id").cast("string"))
    return spans.groupBy(id_col).agg(
        _csv(~F.col("cov") | F.col("is_start"), in_piece).alias(
            "input_ids_csv"
        ),
        _csv(F.col("cov"), tgt_piece).alias("targets_csv"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("cov").cast("long")).alias("n_corrupted"),
        F.sum(F.col("is_start").cast("long")).alias("n_spans"),
    )


span_corruption_dataset.__doc__ = span_corruption_dataset.__doc__.format(
    L=SPAN_LEN
)


def skipgram_pair_counts(
    df: DataFrame,
    window: int = 2,
    topk: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GloVe/word2vec-style windowed co-occurrence counts: for every
    token pair at distance d <= ``window`` inside a document, credit
    the UNORDERED pair (least, greatest token) with the classic 1/d
    distance weight (integer micro: 1000000 div d) and one raw count;
    return the top-``topk`` pairs by (weight desc, t1 asc, t2 asc) —
    the co-occurrence matrix every embedding trainer consumes, built
    as pure DataFrame joins.

    Scale: positions self-join on (doc, pos + d) for each fixed
    d = 1..window — the shuffle is keyed by (doc, pos), cost is
    window x token count (NOT quadratic in document length), and the
    pair aggregate combines map-side, so the wire carries pair
    partials.  No vocabulary pass is needed: the pair table is its own
    vocabulary.
    """
    from mapreducemovieanalysis_cloud_spark.functions.text import tokens

    pos = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    ).localCheckpoint(eager=False)
    legs = []
    for d in range(1, window + 1):
        right = pos.select(
            F.col(id_col),
            (F.col("pos") - d).alias("pos"),
            F.col("tok").alias("tok_b"),
        )
        legs.append(
            pos.join(right, [id_col, "pos"]).select(
                F.least("tok", "tok_b").alias("t1"),
                F.greatest("tok", "tok_b").alias("t2"),
                F.lit(1_000_000 // d).alias("w"),
            )
        )
    pairs = legs[0]
    for leg in legs[1:]:
        pairs = pairs.unionAll(leg)
    return (
        pairs.groupBy("t1", "t2")
        .agg(
            F.sum("w").cast("long").alias("weight_micro"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .orderBy(
            F.col("weight_micro").desc(),
            F.col("t1").asc(),
            F.col("t2").asc(),
        )
        .limit(topk)
    )


def preference_pairs(
    df: DataFrame,
    per_source: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic preference pairs (chosen, rejected) per source —
    the DPO/RLHF training-data shape, synthesized from a measurable
    quality signal: each document scores distinct-token ratio in micro
    units (n_distinct x 1000000 div n_tokens — the repetition gate's
    integer core), and pair i matches the i-th BEST document with the
    i-th WORST (score desc / id asc vs score asc / id desc, so the two
    rank orders are exact mirrors and ties stay deterministic).  Only
    i <= min(per_source, n_docs div 2) emits, so the two sides can
    never overlap; margin_micro = chosen score - rejected score >= 0.

    Scale: one tokenize pass, ONE per-source rank window (the worst-
    side rank is its arithmetic mirror, n + 1 - rb), one
    per-(source, i) join — the window state is per-source counters,
    and nothing is corpus-quadratic.
    """
    from mapreducemovieanalysis_cloud_spark.functions.text import tokens

    # tokenize once, then score through the materialized array (CSE
    # does not reach into lambda trees)
    scored = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        tokens(text_col).alias("__t"),
    ).select(
        "source",
        id_col,
        # integer floor division (Spark DIV == DuckDB // on
        # non-negatives) — never a float ratio cast back to int
        F.expr(
            "CAST(size(array_distinct(__t)) AS BIGINT) * 1000000"
            " DIV size(__t)"
        ).alias("score_micro"),
    )
    best_w = Window.partitionBy("source").orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    n_w = Window.partitionBy("source")
    # (score desc, id asc) reversed IS (score asc, id desc) — a strict
    # total order — so the worst-side rank is the arithmetic mirror
    # rw = n + 1 - rb; computing it saves a second full per-source sort.
    ranked = scored.select(
        "source",
        id_col,
        "score_micro",
        F.row_number().over(best_w).alias("rb"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    ).withColumn("rw", F.col("n") + 1 - F.col("rb"))
    best = ranked.where(
        (F.col("rb") <= per_source) & (F.col("rb") * 2 <= F.col("n"))
    ).select(
        "source",
        F.col("rb").alias("pair_idx"),
        F.col(id_col).alias("chosen_doc"),
        F.col("score_micro").alias("chosen_micro"),
    )
    worst = ranked.where(
        (F.col("rw") <= per_source) & (F.col("rw") * 2 <= F.col("n"))
    ).select(
        "source",
        F.col("rw").alias("pair_idx"),
        F.col(id_col).alias("rejected_doc"),
        F.col("score_micro").alias("rejected_micro"),
    )
    return best.join(worst, ["source", "pair_idx"]).select(
        "source",
        F.col("pair_idx").cast("int").alias("pair_idx"),
        "chosen_doc",
        "rejected_doc",
        (F.col("chosen_micro") - F.col("rejected_micro"))
        .cast("long")
        .alias("margin_micro"),
    )
