"""Parquet physical-layout introspection: the observability half of the
layout work (writers prove properties at write time; this reports what a
layout ACTUALLY looks like so regressions are visible in ops, not just
in tests).

Per column: row-group count, encodings, codec, compressed/uncompressed
byte totals, and the min/max-stats coverage fraction — the numbers that
decide whether data skipping, dictionary encoding, and compaction are
working on a production table.

The footer walk runs driver-side over file metadata only (never data
pages).  That is correct for the common case — file COUNT is what grows,
and a report over a 100 TB table with healthy file sizes is ~100 k
footers; parallelize the walk with ``spark.sparkContext.parallelize``
over the file list when a table's file count outgrows the driver, same
output schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parquet_layout_report(spark: SparkSession, path: str) -> DataFrame:
    """One row per (file-relative) column: layout facts from the footers."""
    import pyarrow.parquet as pq

    agg: dict[str, dict] = {}
    files = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]
    for fpath in files:
        meta = pq.ParquetFile(fpath).metadata
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                name = col.path_in_schema
                a = agg.setdefault(
                    name,
                    {
                        "n_row_groups": 0,
                        "compressed": 0,
                        "uncompressed": 0,
                        "with_stats": 0,
                        "encodings": set(),
                        "codecs": set(),
                    },
                )
                a["n_row_groups"] += 1
                a["compressed"] += col.total_compressed_size
                a["uncompressed"] += col.total_uncompressed_size
                if col.statistics is not None and (
                    col.statistics.has_min_max
                ):
                    a["with_stats"] += 1
                a["encodings"].update(col.encodings)
                a["codecs"].add(col.compression)
    rows = [
        (
            name,
            a["n_row_groups"],
            a["compressed"],
            a["uncompressed"],
            (a["with_stats"] * 1_000_000) // max(a["n_row_groups"], 1),
            ",".join(sorted(a["encodings"])),
            ",".join(sorted(a["codecs"])),
        )
        for name, a in sorted(agg.items())
    ]
    return spark.createDataFrame(
        rows,
        "column STRING, n_row_groups LONG, compressed_bytes LONG, "
        "uncompressed_bytes LONG, stats_coverage_micro LONG, "
        "encodings STRING, codecs STRING",
    )
