"""Driver-contract guards for the query registry."""

from __future__ import annotations

import subprocess
import sys

from mapreducemovieanalysis_cloud_spark import registry


def test_every_query_has_oracle():
    qs, osql = registry.queries(), registry.oracle_sql()
    assert set(osql) <= set(qs), f"orphan oracles: {set(osql) - set(qs)}"
    missing = set(qs) - set(osql)
    # every operator claimed done needs both halves; allow-list nothing
    assert not missing, f"queries without oracle SQL: {missing}"


def test_enumerable_without_spark_session():
    """The driver may call __spark_entry__.queries() before it builds a
    SparkSession — enumeration must not require an active context (no
    module-level pandas_udf / udtf registration)."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import __spark_entry__ as e;"
        "qs = e.queries(); o = e.oracle_sql();"
        "assert len(qs) >= 57 and set(o) <= set(qs);"
        "print(len(qs))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
