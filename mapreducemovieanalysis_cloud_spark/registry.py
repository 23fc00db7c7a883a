"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame plus
its DuckDB oracle SQL.

This is the engine's public query surface and the driver's correctness gate
(__spark_entry__.py contract): each entry runs on the driver-provided parquet
tables (TESTDATA.md) and must hash-match its oracle at sf=0.01. Column names
are aliased identically on both sides; float aggregates are rounded on both
sides so fp summation order can't flip the hash; timestamps are formatted to
strings on both sides.

Keys are grouped by SURVEY.md §2 operator family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import mapreducemovieanalysis_cloud_spark.queries.reference_queries  # noqa: F401

    try:
        import mapreducemovieanalysis_cloud_spark.queries.relational  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.relational2  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.functions_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.pipeline_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.streaming_queries  # noqa: F401
        import mapreducemovieanalysis_cloud_spark.queries.tpch_queries  # noqa: F401
    except ImportError:
        pass  # modules land incrementally; reference queries are the floor
    _LOADED = True
