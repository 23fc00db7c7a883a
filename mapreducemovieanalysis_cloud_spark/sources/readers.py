"""Sources: parquet (primary), CSV/JSON/ORC, and the MovieLens CSV shape.

Replaces the reference's three scan paths (SURVEY §2.1 S1-S3):

- S1 line-at-a-time ``TextInputFormat`` over reviews.csv → ``spark.read.csv``
  with an explicit schema (no inference pass, predicate pushdown works).
- S2 whole-file HashMap load of movies.csv via DistributedCache
  (``MovieRank.java:30-51``) → an ordinary DataFrame the planner broadcasts.
- S3 ``KeyValueTextInputFormat`` re-scan of job-1 output → unnecessary; the
  engine is one lazy DAG (SURVEY §3.4).

Scale posture: parquet everywhere by default (columnar, splittable, stats for
row-group pruning); CSV only at ingest boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from mapreducemovieanalysis_cloud_spark import schemas

_FORMATS = ("parquet", "csv", "json", "orc")

# Lazy-DataFrame memo per (application, sf_dir, table): a DataFrame is an
# immutable plan, so reuse is safe, and it skips re-listing files and
# re-reading parquet footers on every one of the registry's ~60 queries —
# at cluster scale, re-building a file index over a large table is an
# O(files) driver-side stall repeated per query.
#
# Contract: an sf_dir is immutable for the lifetime of a Spark application —
# the cached plan freezes the file index, so files added/rewritten after the
# first load are invisible until ``clear_table_cache()`` (which test
# harnesses that regenerate data must call). Entries from other application
# ids (stopped sessions) are evicted on access so the memo can't grow across
# session restarts in one process.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_cache() -> None:
    """Drop every memoized table plan (use after rewriting files in an
    sf_dir mid-application)."""
    _TABLE_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has shipped in two physical shapes across driver data
    generations, both normalized here to a microsecond ``TimestampType``
    (LTZ) so every downstream ``unix_micros``/window expression sees one
    type:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read as raw
      nanos via the ``nanosAsLong`` legacy flag and rebuilt with integer
      division (``div`` — float division would lose precision at 1.7e18 ns
      magnitudes), matching DuckDB's nanos→micros truncation.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ; cast to LTZ, an identity on the stored micros under
      the engine's UTC session timezone (session.py), and exactly how
      DuckDB treats the same naive value.
    """
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _TABLE_CACHE if k[0] != app_id]:
        del _TABLE_CACHE[k]
    key = (app_id, sf_dir.rstrip("/"), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    _TABLE_CACHE[key] = df
    return df


def _load_table_uncached(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(raw.dtypes).get("ts")
        if ts_type == "bigint":
            return raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if ts_type == "timestamp_ntz":
            return raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Read the driver tables (TESTDATA.md) into a dict of DataFrames."""
    names = names or tuple(schemas.TPCH_TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}


def table_fingerprint(sf_dir: str, name: str) -> str:
    """Short content fingerprint (relpath/size/mtime of every part file)
    of ``{sf_dir}/{name}.parquet``.

    Derived layouts (stored inverted index, z-order, MV base) bake this
    into their materialization path, so a driver-side regeneration of
    the source table — which happened to ``events`` between rounds 2 and
    3 with an unchanged path — automatically invalidates every layout
    built from the old bytes instead of silently probing stale data."""
    import hashlib
    import os

    root = os.path.join(sf_dir, f"{name}.parquet")
    h = hashlib.md5()
    if os.path.isdir(root):
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                rel = os.path.relpath(p, root)
                h.update(
                    f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode()
                )
    else:
        st = os.stat(root)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Generic reader over the supported formats with an explicit schema."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("quote", '"')
        options.setdefault("escape", '"')
        # PERMISSIVE + corrupt-record column instead of the reference's
        # throw-on-parse Integer.parseInt (MovieRank.java:43).
        options.setdefault("mode", "PERMISSIVE")
    return reader.options(**options).load(path)


def read_movielens_csv(
    spark: SparkSession, movies_path: str, ratings_path: str
) -> tuple[DataFrame, DataFrame]:
    """Read the reference's two inputs with real CSV semantics.

    The reference hand-parses both files: header skipped by comparing field 0
    to a literal (``MovieRank.java:40-41,61-63``), commas inside titles
    repaired by re-joining split fragments with quotes left in
    (``MovieRank.java:44-47``), genres silently dropped. Here ``header=True``
    and RFC-4180 quoting give the intended semantics directly, and genres
    survives.
    """
    movies = read_any(spark, movies_path, "csv", schema=schemas.MOVIES)
    ratings = read_any(spark, ratings_path, "csv", schema=schemas.RATINGS)
    return movies, ratings
