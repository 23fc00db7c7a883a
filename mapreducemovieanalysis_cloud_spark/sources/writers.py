"""Sinks: parquet (default), CSV/JSON/ORC, partitioned writes.

Replaces the reference's single sink — ``TextOutputFormat`` writing
``key \\t value`` lines (SURVEY §2.1 S4, ``MovieRank.java:169-171``). The
tab-packed payload strings disappear: intermediate schemas are real schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMATS = ("parquet", "csv", "json", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    """Write ``df`` to ``path``.

    ``partition_by`` produces hive-style directory partitioning — the 100 TB
    pattern for downstream partition pruning (e.g. partition events by day).
    The reference-exact tab-separated text output is ``fmt='csv', sep='\\t'``.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: tuple[str, ...],
    num_buckets: int,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-ordered) catalog
    table — the co-located-join layout for repeated fact-fact joins.

    Two tables bucketed on the same key with the same ``num_buckets`` join
    with NO exchange on either side: each task reads matching bucket files
    directly, so a 100 TB orders⋈lineitem that runs nightly pays the
    shuffle once at write time instead of per query. ``sort_by`` orders
    rows within each bucket file, which additionally removes the join's
    sort step. Bucketing requires the catalog (``saveAsTable``) — a plain
    ``save(path)`` silently drops bucket metadata, which is why this is a
    separate entry point from ``write_table``.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def compact_table(
    spark,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite a table into ~``target_file_bytes`` files; returns the file
    count written.

    The small-files problem at 100 TB: a streaming sink or a
    many-partition job leaves thousands of KB-scale files whose per-file
    open/footer cost dominates later scans and whose listing stalls the
    driver. Compaction sizes the rewrite from the actual byte size
    (Hadoop FileSystem metadata — an O(files) driver-side listing, the
    thing being eliminated), then round-robin repartitions so output
    files are uniform. Runs scoped to one partition directory of a
    hive-partitioned table compact incrementally."""
    df = spark.read.format(fmt).load(src_path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    n_files = max(1, -(-total // target_file_bytes))
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(
        dest_path
    )
    return n_files


def upsert_partitions(
    spark,
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    fmt: str = "parquet",
) -> None:
    """Replace exactly the hive partitions present in ``df``, leaving every
    other partition untouched (dynamic partition overwrite).

    The incremental-load pattern for a 100 TB partitioned table: a daily
    batch rewrites only the day directories it carries — no read-modify-
    write of the full table, no touching historical partitions, and
    readers see each partition swap atomically at the directory level.
    Spark's static overwrite mode would instead TRUNCATE the whole table;
    this helper scopes the session conf to the one write so callers
    cannot be burned by that default."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.format(fmt)
            .mode("overwrite")
            .partitionBy(*partition_by)
            .save(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_epoch(
    df: DataFrame, root: str, batch_id: int | str, fmt: str = "parquet"
) -> None:
    """THE idempotent epoch write: ``<root>/batch=<id>`` with overwrite.

    One definition of the retry-safe delta layout shared by the streaming
    MV delta log (streaming/mv.py), the DQ quarantine sink
    (streaming/dq.py) and the incremental dedup store (operators/dedup.py)
    — a retried foreachBatch epoch rewrites its own directory instead of
    appending duplicates, which is what makes those sinks exactly-once at
    the batch level."""
    df.write.format(fmt).mode("overwrite").save(f"{root}/batch={batch_id}")


def read_epochs(
    spark,
    root: str,
    fmt: str = "parquet",
    exclude_batch: int | str | None = None,
) -> DataFrame:
    """Read an epoch-directory layout with the ``batch`` partition column
    FORCED to string via an explicit user schema, so it is the literal
    directory string and ``exclude_batch`` comparison round-trips exactly.

    Why the type must be pinned: a numeric-looking string id like
    ``"007"`` writes ``batch=007`` but INFERS as integer 7, so a
    ``str(batch) != "007"`` exclusion filter silently matches nothing —
    for the dedup store that inverts the exactly-once guarantee into
    permanent data loss (a crashed attempt's fingerprints stay visible
    and mark the batch's own docs already-seen).  The pin used to flip
    ``spark.sql.sources.partitionColumnTypeInference.enabled`` around
    the read, but that conf is SESSION-GLOBAL: any concurrent query on
    the same session during the window silently got string partition
    columns (r05 advisor) — and this read runs on every dedup
    micro-batch.  An explicit schema (data fields from one epoch's
    footers + ``batch string``) pins the type for this read alone,
    thread-safe by construction."""
    import os

    from pyspark.errors import AnalysisException
    from pyspark.sql.types import StringType, StructField, StructType

    if not os.path.isdir(root):
        # preserve the "no store yet" contract: surface the same
        # AnalysisException a direct read of the missing path raises
        # (callers distinguish it from data errors)
        return spark.read.format(fmt).load(root)
    epoch_dirs = sorted(
        e for e in os.listdir(root)
        if e.startswith("batch=")
        and os.path.isdir(os.path.join(root, e))
    )
    if not epoch_dirs:
        # a flat (non-epoch) layout at this root: failing loudly here
        # matters because callers wrap this read in
        # except-AnalysisException "no store yet" handling — letting
        # the mix produce a partition-discovery error (or a missing
        # batch column) would silently treat a POPULATED store as empty
        raise ValueError(
            f"{root} is not an epoch layout (no batch= partitions); "
            "epoch and flat layouts must not be mixed on one root"
        )
    # Pin the data schema from the first epoch dir whose footers are
    # readable — NOT unconditionally from epoch_dirs[0]: an epoch dir
    # with no readable footer (manually cleaned, or an object-store
    # partial holding only _SUCCESS) would raise AnalysisException,
    # which dedup callers interpret as "no store yet" — the exact
    # silent-empty-store inversion this function's docstring warns
    # about (r06 advisor).  Only when NO epoch yields a schema do we
    # raise, and then loudly as a corrupt-store error, never as the
    # missing-path AnalysisException the "no store yet" handlers catch.
    data_schema = None
    footer_errs: list[str] = []
    for e in epoch_dirs:
        try:
            data_schema = spark.read.format(fmt).load(
                os.path.join(root, e)
            ).schema
            break
        except AnalysisException as exc:
            # ONLY the documented footer-inference failure
            # (UNABLE_TO_INFER_SCHEMA on a partfile-less dir) advances
            # to the next epoch; any OTHER AnalysisException (e.g.
            # PATH_NOT_FOUND from a concurrently deleted epoch dir)
            # must propagate, not reclassify a healthy store as corrupt
            # or nondeterministically shift the schema pin (r08 advisor
            # — the r07 comment documented this contract but the catch
            # was still class-wide)
            condition = (
                exc.getCondition()
                if hasattr(exc, "getCondition")
                else exc.getErrorClass()
            )
            if condition != "UNABLE_TO_INFER_SCHEMA":
                raise
            footer_errs.append(f"{e}: {condition}")
    if data_schema is None:
        raise ValueError(
            f"{root} is an epoch layout but no epoch directory has a "
            f"readable {fmt} footer to pin the data schema from "
            f"({'; '.join(footer_errs)}); refusing to treat a populated "
            "store as empty"
        )
    df = spark.read.format(fmt).schema(
        StructType(
            list(data_schema.fields)
            + [StructField("batch", StringType(), True)]
        )
    ).load(root)
    if exclude_batch is not None:
        from pyspark.sql import functions as F

        df = df.where(F.col("batch") != str(exclude_batch))
    return df


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: tuple[str, ...],
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-partition by ``sort_cols`` across files and sort within each —
    the data-skipping layout for 100 TB scans.

    Parquet stores per-row-group min/max statistics; after this write each
    file/row-group covers a narrow, disjoint key range, so a pushed-down
    range or point predicate skips everything else at the footer level
    (the same effect clustering/Z-order gives warehouse tables, in plain
    open-format parquet). ``repartitionByRange`` samples the key
    distribution, so skew produces balanced files, not one hot file.
    """
    parted = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.format(fmt).mode(mode).save(
        path
    )


def zorder_value(cols, bits: int = 16):
    """Morton (Z-curve) interleave of pre-scaled non-negative ints, each
    < 2**bits: bit b of column i lands at position b*len(cols)+i. Pure
    bitwise expressions — codegen'd, no UDF."""
    from pyspark.sql import functions as F

    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: tuple[str, ...],
    num_files: int,
    bits: int = 16,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Multi-dimension data-skipping layout: scale each clustering column
    to a 2**bits grid, interleave the bits into a Morton z-value, and
    range-partition + sort by it.

    ``write_sorted`` gives perfect skipping on ONE leading column;
    Z-ordering trades a little per-column locality so EVERY clustering
    column gets narrow per-file min/max footer ranges — a box predicate
    (col1 range AND col2 range) prunes files on both dimensions, which is
    what warehouse OPTIMIZE ZORDER does, here in plain open parquet.
    The z-value is layout-only (dropped before the write): it never
    changes query results, only which files a predicate can skip.
    """
    from pyspark.sql import functions as F

    grid = (1 << bits) - 1
    stats = df.agg(
        *[
            a
            for c in zorder_cols
            for a in (
                F.min(c).cast("double").alias(f"__lo_{c}"),
                F.max(c).cast("double").alias(f"__hi_{c}"),
            )
        ]
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        F.floor(
            (F.col(c).cast("double") - F.col(f"__lo_{c}"))
            * grid
            / F.greatest(
                F.col(f"__hi_{c}") - F.col(f"__lo_{c}"), F.lit(1.0)
            )
        ).cast("long")
        for c in zorder_cols
    ]
    parted = (
        with_stats.withColumn("__z", zorder_value(scaled, bits))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__lo_{c}" for c in zorder_cols],
              *[f"__hi_{c}" for c in zorder_cols])
    )
    parted.write.format(fmt).mode(mode).save(path)


def compact_epochs(spark, root: str, merge_fn, fold_id: str = "folded") -> int:
    """Fold every ``batch=*`` epoch under ``root`` into ONE epoch —
    the small-directories lifecycle for the incremental stores (one
    epoch per ingest day means thousands of ``batch=`` dirs per read
    after a few years; ``read_epochs`` pays an O(epochs) listing plus
    a per-dir footer open on every query).  Returns the number of
    epochs folded (0 = nothing to do).

    ``merge_fn(df) -> df`` is the STORE'S OWN partial-merge (counts:
    group-sum; FM masks: group-OR; KMV: distinct) and must emit the
    stored-partial schema — every store's partials are closed under
    their merge algebra, so the folded epoch is a valid partial and
    every read path is unchanged (pinned per-store by test).

    OFFLINE contract (the compact_inverted_index rule): run without
    concurrent appends or readers.  The whole mutation window holds the
    layout's exclusive ``maintenance_lock`` (flock on
    ``<root>/_MAINTENANCE_LOCK`` — invisible to ``read_epochs``, which
    lists ``batch=*`` dirs only), so two concurrent compacts on one
    store either wait or fail fast, never interleave their renames.
    Crash protocol — roll FORWARD, in-order, every state recoverable
    by rerunning this function:

    1. stage the merged epoch under ``__compact/batch=<fold_id>``
       (invisible: ``read_epochs`` lists ``batch=*`` dirs only), then
       write the ``_STAGED`` marker naming the exact fold SET — the
       marker commits ATOMICALLY (tmp + fsync + rename, r12 advisor
       item 1) and an unparseable marker is treated as uncommitted —
       a crash before the marker commits leaves an uncommitted stage
       that the next run discards (the fold set may have changed);
    2. move each folded epoch aside into ``__folded_trash`` (after the
       marker, the stage is authoritative for precisely those epochs,
       so moving is pure roll-forward);
    3. swap the staged epoch into ``batch=<fold_id>``;
    4. delete trash, marker, staging.

    A previous fold's ``batch=<fold_id>`` is just another epoch: it
    joins the fold set and is replaced by the new fold atomically from
    the reader's perspective (readers are excluded by the offline
    contract anyway)."""
    import json
    import os
    import shutil

    from mapreducemovieanalysis_cloud_spark.operators.recovery import (
        maintenance_lock,
    )

    if not os.path.isdir(root):
        return 0
    compact_dir = os.path.join(root, "__compact")
    marker = os.path.join(compact_dir, "_STAGED")
    trash = os.path.join(root, "__folded_trash")
    staged = os.path.join(compact_dir, f"batch={fold_id}")

    def _read_marker():
        """Parse the committed fold set, or None for a TORN marker
        (r12 advisor item 1): the marker write is atomic (tmp +
        rename), but a marker from an older layout version — or a
        filesystem without atomic rename — could still tear.  Moves
        only start after a complete marker, so unparseable JSON proves
        the stage was never committed and is safe to discard; raising
        forever here would violate the 'every state recoverable by
        rerunning' protocol."""
        try:
            with open(marker) as fh:
                return json.load(fh)
        except ValueError:
            return None

    def _roll_forward(fold_set) -> int:
        # The swap (staged -> batch=<fold_id>) is the LAST mutating
        # step, and the marker is only written after the stage exists —
        # so marker-present + staged-absent proves moves AND swap
        # completed.  On a re-fold the previous ``batch=<fold_id>`` is
        # in the fold set; re-running the move loop in that state would
        # mistake the freshly swapped-in result for an unfolded epoch
        # and trash it.  Skip straight to cleanup instead.
        if os.path.isdir(staged):
            os.makedirs(trash, exist_ok=True)
            for name in fold_set:
                src = os.path.join(root, name)
                if os.path.isdir(src):
                    os.rename(src, os.path.join(trash, name))
            os.rename(staged, os.path.join(root, f"batch={fold_id}"))
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(compact_dir, ignore_errors=True)
        return len(fold_set)

    with maintenance_lock(root):
        # crash recovery first: a committed stage (marker present and
        # parseable) rolls forward; an uncommitted one (no marker, or a
        # torn marker — see _read_marker) is discarded
        if os.path.exists(marker):
            fold_set = _read_marker()
            if fold_set is not None:
                return _roll_forward(fold_set)
        shutil.rmtree(compact_dir, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)

        epochs = sorted(
            e
            for e in os.listdir(root)
            if e.startswith("batch=")
            and os.path.isdir(os.path.join(root, e))
        )
        if len(epochs) <= 1:
            return 0
        merged = merge_fn(read_epochs(spark, root))
        merged.write.mode("overwrite").parquet(staged)
        # atomic marker commit (r12 advisor item 1): tmp + fsync +
        # rename, so a crash mid-write can never leave a torn marker
        # that poisons every future recovery
        tmp_marker = marker + ".tmp"
        with open(tmp_marker, "w") as fh:
            json.dump(epochs, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp_marker, marker)
        return _roll_forward(epochs)
