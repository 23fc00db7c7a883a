"""DuckDB oracle comparison mirroring the driver's t2 check.

The driver sorts columns by name, then compares row-count + schema +
order-insensitive value-hash. This helper reproduces that locally so every
query/oracle pair is validated in pytest before the driver sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon_row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(("null",))
            elif isinstance(v, float):
                canon_row.append(("f", f"{v:.10g}"))
            elif isinstance(v, (pd.Timestamp,)):
                canon_row.append(("t", str(v)))
            elif isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
                canon_row.append(("a", str(list(v))))
            else:
                canon_row.append((type(v).__name__[:1], str(v)))
        rows.append(tuple(canon_row))
    rows.sort()
    return rows


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    con = duckdb_connection(sf_dir)
    expected = con.sql(sql).df()
    actual = spark_df.toPandas()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} "
        f"oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    erows, arows = _canon(expected), _canon(actual)
    mismatches = [
        (i, a, e) for i, (a, e) in enumerate(zip(arows, erows)) if a != e
    ]
    assert not mismatches, f"first value mismatches: {mismatches[:3]}"
