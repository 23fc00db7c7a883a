"""Mergeable sketches with persistent incremental stores: distinct
counts (Flajolet-Martin bitmasks, OR-merge), frequencies (count-min
cells, ADD-merge), and quantiles (fixed-bin histograms, ADD-merge).
The FM tier is documented in depth below; the CMS and histogram tiers
follow the same contract — merged store == full rebuild, O(batch)
maintenance, state independent of (or sublinear in) cardinality.

``approx_distinct`` (registered) is Spark's built-in HLL++ — fine for a
one-shot answer, but its sketch state is engine-private: it cannot be
stored, merged across ingest days, or replicated by the DuckDB oracle.
This module is the STORED tier: register masks are plain BIGINT bitmaps
built from md5 draws (the ANF construction — operators/graph.anf_reach
uses the identical seed/estimate math over graph frontiers), so

* merge is bitwise OR — associative, idempotent, partial-aggregatable
  map-side, retry-safe (a re-ORed batch changes nothing);
* state per group is ``registers`` fixed-width integers, regardless of
  cardinality;
* the whole pipeline is engine-exact: the estimate's register sum is an
  exact integer the driver hash pins, and the final 2^(b/R)/0.77351 is
  one shared double expression on that integer.

At 100 TB this is how "distinct users per <group> to date" stays a
per-day O(batch) append instead of a history rescan: exact distinct
needs every id ever seen; the FM store needs R longs per group.

Row-level batch splits are SAFE here (unlike the co-occurrence pair
store's complete-group contract): OR-merge is idempotent per id, so an
id appearing in many batches lands on the same bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FM_BIT_CAP = 20
FM_PHI = 0.77351  # Flajolet-Martin bias correction

# Behavior version of the incremental FM store (seed hash, register
# count default, bit cap, epoch layout).  Cache keys addressing a
# persistent store built by incremental_fm_append MUST include this
# constant — bump it whenever a change here would make previously
# written masks stale (the ngram_lm INCREMENTAL_STORE_VERSION rule).
FM_STORE_VERSION = "fm1"


def _seed_mask(id_col: str, salt: str) -> F.Column:
    """BIGINT with exactly one bit set: position = trailing zeros of the
    32-bit md5 slice of (salt:register:id), capped at FM_BIT_CAP — a
    pure integer function of (id, register) in any engine."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col("r").cast("string"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.expr(
        f"CAST(1 AS BIGINT) << CASE WHEN __h = 0 THEN {FM_BIT_CAP}"
        f" ELSE LEAST(bit_count((__h & -__h) - 1), {FM_BIT_CAP}) END"
    ), h


def fm_register_masks(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    registers: int = 16,
    salt: str = "fmd",
) -> DataFrame:
    """(group..., r, m): one OR-merged register mask per (group,
    register) over the input's ids.  The registers explode is map-side
    CPU; the bit_or aggregate combines map-side, so shuffle volume is
    |groups| x registers rows at any input size."""
    regs = df.select(*group_cols, F.col(id_col)).crossJoin(
        F.broadcast(
            df.sparkSession.range(registers).select(
                F.col("id").cast("int").alias("r")
            )
        )
    )
    mask, h = _seed_mask(id_col, salt)
    return (
        regs.withColumn("__h", h)
        .select(*group_cols, "r", mask.alias("m"))
        .groupBy(*group_cols, "r")
        .agg(F.expr("bit_or(m)").alias("m"))
    )


def fm_estimate(
    masks: DataFrame, group_cols: list[str], registers: int = 16
) -> DataFrame:
    """(group..., b_sum, est_distinct_milli) from merged register
    masks: b_sum is the exact-integer sum of lowest-unset-bit positions
    (the driver-pinnable column); the milli estimate is one shared
    double expression on it."""
    return masks.groupBy(*group_cols).agg(
        F.expr("CAST(SUM(bit_count(m & (m ^ (m + 1)))) AS BIGINT)").alias(
            "b_sum"
        )
    ).select(
        *group_cols,
        "b_sum",
        F.expr(
            f"CAST(ROUND(POW(2.0, CAST(b_sum AS DOUBLE) / {registers})"
            f" / {FM_PHI} * 1000) AS BIGINT)"
        ).alias("est_distinct_milli"),
    )


def incremental_fm_append(
    batch_df: DataFrame,
    store: str,
    batch_id: int | str,
    group_cols: list[str],
    id_col: str,
    registers: int = 16,
    salt: str = "fmd",
) -> None:
    """Append one batch's register masks to a persistent FM store at
    O(batch) cost: ``<store>/masks/batch=<id>`` via the shared
    idempotent epoch write (retry overwrites, never doubles).  Stored
    rows are |groups-in-batch| x registers masks — never ids."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        write_epoch,
    )

    write_epoch(
        fm_register_masks(batch_df, group_cols, id_col, registers, salt),
        f"{store}/masks",
        batch_id,
    )


def incremental_fm_distinct(
    spark,
    store: str,
    group_cols: list[str],
    registers: int = 16,
) -> DataFrame:
    """Distinct-count estimates over every committed batch in ``store``
    — EXACTLY what a full rebuild over the union of the batches would
    estimate (bit_or is associative and idempotent; pinned by the
    batch-split-invariance test).  Reads mask partials only; the merge
    is one (group, r)-keyed bit_or over batch-count rows."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        read_epochs,
    )

    merged = (
        read_epochs(spark, f"{store}/masks")
        .groupBy(*group_cols, "r")
        .agg(F.expr("bit_or(m)").alias("m"))
    )
    return fm_estimate(merged, group_cols, registers)


def fm_pairwise_overlap(
    masks: DataFrame,
    group_col: str,
    registers: int = 16,
) -> DataFrame:
    """Pairwise distinct-overlap estimates between groups, computed
    PURELY from merged FM register masks — the sketch-algebra payoff:
    the union of two groups' id sets is estimated by OR-ing their
    stored masks register-by-register (FM sketches are closed under
    union), and the intersection follows by inclusion-exclusion
    |A∩B| ≈ |A| + |B| - |A∪B| — all without touching a single id.

    Input: (group, r, m) merged masks (fm_register_masks output or the
    incremental store's merge).  Output per unordered pair (a < b):
    the three exact-integer register sums (the driver-pinnable
    columns) plus milli estimates and the inclusion-exclusion
    intersection estimate.  ``inter_est_milli`` can be negative on
    near-disjoint sets (estimator noise exceeding the true overlap) —
    reported raw, a consumer clamps if it wants a count.

    Scale: the pair join keys on the register index — |groups|² x R
    rows only if EVERY pair is compared, which is the point of the
    audit (groups = a bounded catalog like event types, never user
    ids); everything downstream is pair x R sized."""
    a = masks.select(
        F.col(group_col).alias("ga"), "r", F.col("m").alias("ma")
    )
    b = masks.select(
        F.col(group_col).alias("gb"), "r", F.col("m").alias("mb")
    )
    pair_regs = a.join(b, "r").where(F.col("ga") < F.col("gb"))
    # the lowest-unset-bit must apply to the UNION mask u = ma | mb —
    # project u first so no operator-precedence mistake can sneak into
    # the bit expression
    union_b = (
        pair_regs.select(
            "ga", "gb", (F.col("ma").bitwiseOR(F.col("mb"))).alias("u")
        )
        .groupBy("ga", "gb")
        .agg(
            F.expr(
                "CAST(SUM(bit_count(u & (u ^ (u + 1)))) AS BIGINT)"
            ).alias("b_sum_union")
        )
    )
    per = fm_estimate(masks, [group_col], registers).select(
        F.col(group_col).alias("__g"),
        F.col("b_sum").alias("__bs"),
        F.col("est_distinct_milli").alias("__est"),
    )
    est = F.expr(
        f"CAST(ROUND(POW(2.0, CAST(b_sum_union AS DOUBLE) / {registers})"
        f" / {FM_PHI} * 1000) AS BIGINT)"
    )
    return (
        union_b.join(
            per.select(
                F.col("__g").alias("ga"),
                F.col("__bs").alias("b_sum_a"),
                F.col("__est").alias("est_a_milli"),
            ),
            "ga",
        )
        .join(
            per.select(
                F.col("__g").alias("gb"),
                F.col("__bs").alias("b_sum_b"),
                F.col("__est").alias("est_b_milli"),
            ),
            "gb",
        )
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "b_sum_a",
            "b_sum_b",
            "b_sum_union",
            "est_a_milli",
            "est_b_milli",
            est.alias("est_union_milli"),
            (
                F.col("est_a_milli")
                + F.col("est_b_milli")
                - est
            )
            .cast("long")
            .alias("inter_est_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch store: additive frequency sketches
# ---------------------------------------------------------------------------

# Behavior version of the incremental CMS store (hash construction,
# depth/width defaults, candidate rule, epoch layout).  Cache keys
# addressing a persistent store built by incremental_cms_append MUST
# include this constant (the ngram_lm INCREMENTAL_STORE_VERSION rule).
CMS_STORE_VERSION = "cms1"
CMS_DEPTH = 3
CMS_WIDTH = 64


def _cms_buckets(key_col: str, depth: int, width: int):
    """Exploded (row_idx, bucket) struct column — THE one bucket
    construction (leading 16 bits of md5(i:key) mod width, the
    registered ``aggregates.cms_heavy_hitters`` scheme) shared by the
    appender's cells AND the consumer's probes, so they can never
    silently diverge.  A change here is a CMS_STORE_VERSION bump."""
    from mapreducemovieanalysis_cloud_spark.functions.hashing import (
        md5_bucket,
    )

    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_idx"),
                    md5_bucket(key_col, width, salt=f"{i}:").alias(
                        "bucket"
                    ),
                )
                for i in range(depth)
            ]
        )
    )


def _cms_cells(df: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """(row_idx, bucket, cell_count) over the input — the
    ``_cms_buckets`` construction aggregated, so a merged store and a
    one-shot sketch over the same rows are cell-for-cell equal."""
    rows = df.select(
        _cms_buckets(key_col, depth, width).alias("cell")
    ).select("cell.row_idx", "cell.bucket")
    return rows.groupBy("row_idx", "bucket").agg(
        F.count(F.lit(1)).alias("cell_count")
    )


def incremental_cms_append(
    batch_df: DataFrame,
    store: str,
    batch_id: int | str,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    cand_m: int = 20,
) -> None:
    """Append one batch's count-min cells AND its top-``cand_m``
    candidate keys to a persistent CMS store at O(batch) cost.

    Cells ADD across batches (counts are additive), so the merged
    sketch equals a full rebuild EXACTLY — the same merged==rebuild
    contract as the FM/LM/co-occurrence stores, pinned by the
    batch-split-invariance test.  Candidates are the standard
    heavy-hitter heuristic: each batch remembers its own top-m keys
    (batch count desc, key asc — deterministic), and the consumer
    probes the union; a key in the global top-k is in some batch's
    top-m whenever batches are not adversarially skewed (m >= k gives
    the usual practical guarantee; the sketch itself never lies — est
    >= true under addition).  Row-level batch splits are SAFE: cells
    add per row, and a key split across batches still surfaces as long
    as it is heavy SOMEWHERE.

    Layout: ``<store>/cells/batch=<id>`` (depth x width rows max) and
    ``<store>/cands/batch=<id>`` (m rows) via the shared idempotent
    epoch write — retry overwrites, never doubles."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        write_epoch,
    )

    write_epoch(
        _cms_cells(batch_df, key_col, depth, width),
        f"{store}/cells",
        batch_id,
    )
    counts = batch_df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    cands = (
        counts.orderBy(F.col("__n").desc(), F.col(key_col).asc())
        .limit(cand_m)
        .select(key_col)
    )
    write_epoch(cands, f"{store}/cands", batch_id)


def incremental_cms_topk(
    spark,
    store: str,
    key_col: str,
    k: int = 10,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Top-``k`` heavy hitters from the STORE alone — no corpus rescan:
    merge the cells by plain addition (== rebuild), union the stored
    candidate keys, probe each candidate's depth cells, estimate as the
    min (the CMS overestimate), and rank (est desc, key asc).

    Scale: merged cells are <= depth x width rows (broadcast); the
    probe is |candidates| x depth rows.  Nothing here is proportional
    to the corpus."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        read_epochs,
    )

    cells = (
        read_epochs(spark, f"{store}/cells")
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    cands = (
        read_epochs(spark, f"{store}/cands").select(key_col).distinct()
    )
    probes = cands.select(
        key_col,
        _cms_buckets(key_col, depth, width).alias("cell"),
    ).select(key_col, "cell.row_idx", "cell.bucket")
    est = (
        probes.join(F.broadcast(cells), ["row_idx", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cell_count").alias("est_count"))
    )
    return est.orderBy(F.col("est_count").desc(), F.col(key_col).asc()).limit(
        k
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram store: additive quantile sketches
# ---------------------------------------------------------------------------

# Behavior version of the incremental histogram store (binning rule,
# epoch layout) — same cache-key rule as the other store versions.
HIST_STORE_VERSION = "h1"


def hist_bins(
    df: DataFrame, group_col: str, cents_col: str, bin_width_cents: int
) -> DataFrame:
    """(group, bin, n) fixed-width integer binning of an exact-cents
    column: bin = cents div bin_width (truncation toward zero in both
    engines for non-negative cents).  The one binning rule shared by
    the appender and any rebuild, so merged == rebuild is arithmetic,
    not luck."""
    return (
        df.select(
            F.col(group_col),
            F.expr(f"{cents_col} DIV {bin_width_cents}").alias("bin"),
        )
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def incremental_hist_append(
    batch_df: DataFrame,
    store: str,
    batch_id: int | str,
    group_col: str,
    cents_col: str,
    bin_width_cents: int,
) -> None:
    """Append one batch's (group, bin, n) histogram partials.  Counts
    ADD, so the merged histogram equals a full rebuild exactly; state
    per group is |occupied bins| integers regardless of row count —
    the quantile twin of the FM distinct store (exact percentiles need
    a corpus sort; the binned store answers at bin resolution from
    O(bins) longs maintained O(batch))."""
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        write_epoch,
    )

    write_epoch(
        hist_bins(batch_df, group_col, cents_col, bin_width_cents),
        f"{store}/bins",
        batch_id,
    )


def hist_percentiles(
    spark,
    store: str,
    group_col: str,
    bin_width_cents: int,
    qs: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Per-group bin-resolution percentiles from the merged store: the
    q-th percentile is the LOWER BOUND (in cents) of the first bin
    where 100 x cumulative_count >= q x total — integer arithmetic end
    to end, so the answer is engine-exact at the store's resolution.
    Output: (group, n_rows, p<q>_lo_cents per q)."""
    from pyspark.sql import Window
    from mapreducemovieanalysis_cloud_spark.sources.writers import (
        read_epochs,
    )

    merged = (
        read_epochs(spark, f"{store}/bins")
        .groupBy(group_col, "bin")
        .agg(F.sum("n").alias("n"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.select(
        group_col,
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.partitionBy(group_col)).alias("total"),
    )
    aggs = [F.max("total").cast("long").alias("n_rows")]
    for q in qs:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("total") * q,
                    F.col("bin") * bin_width_cents,
                )
            )
            .cast("long")
            .alias(f"p{q}_lo_cents")
        )
    return cum.groupBy(group_col).agg(*aggs)
