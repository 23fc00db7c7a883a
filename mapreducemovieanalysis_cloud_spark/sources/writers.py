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
