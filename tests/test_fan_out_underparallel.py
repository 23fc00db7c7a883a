"""Behavioral pins for ``operators.skew.fan_out_underparallel`` — the
round-13 optimization that rebalances a scan narrower than the cluster
(guide §2.5 input skew / §2.6 idle capacity) before the minhash md5
passes.

The contract under test:

* fires ONLY when the frame's physical partitioning is narrower than
  ``defaultParallelism`` (self-extinguishing at scale — a wide frame
  passes through with NO added exchange);
* never changes the row multiset (round-robin placement only);
* honors the ``SPARK_GRAFT_FANOUT=0`` kill-switch (the parameterised
  scale-dependent-setting rule);
* ``shingle_sets(fan_out=True)`` is row-identical to the default path
  (the dedup family's correctness does not depend on the flag).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators.dedup import shingle_sets
from mapreducemovieanalysis_cloud_spark.operators.skew import (
    fan_out_underparallel,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_narrow_frame_is_rebalanced_to_default_parallelism(spark):
    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 1).withColumn("v", F.col("id") * 2)
    assert narrow.rdd.getNumPartitions() == 1
    out = fan_out_underparallel(narrow)
    assert out.rdd.getNumPartitions() == target
    assert "RoundRobinPartitioning" in _plan(out)


def test_wide_frame_passes_through_without_exchange(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, target + 2)
    out = fan_out_underparallel(wide)
    assert out is wide  # no-op, not merely same partition count
    assert "RoundRobinPartitioning" not in _plan(out)


def test_kill_switch_disables_rebalance(spark):
    narrow = spark.range(0, 100, 1, 1)
    os.environ["SPARK_GRAFT_FANOUT"] = "0"
    try:
        out = fan_out_underparallel(narrow)
    finally:
        os.environ.pop("SPARK_GRAFT_FANOUT", None)
    assert out is narrow


def test_row_multiset_unchanged(spark):
    narrow = spark.range(0, 500, 1, 1).withColumn(
        "v", (F.col("id") % 7).cast("long")
    )
    before = sorted(narrow.collect())
    after = sorted(fan_out_underparallel(narrow).collect())
    assert before == after


def test_shingle_sets_fan_out_row_identical(spark, sf_dir):
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plain = sorted(shingle_sets(docs, 3).collect())
    fanned = sorted(shingle_sets(docs, 3, fan_out=True).collect())
    assert plain == fanned
    assert len(plain) > 0  # non-vacuity


def test_minhash_lsh_result_independent_of_fanout(spark, sf_dir):
    """dedup_minhash_lsh's result set must not depend on the rebalance
    (round-robin placement is invisible to every aggregate above it).

    Both flag variants run inside this ONE test so the comparison can
    never pass vacuously under ``pytest -k`` / ``--lf`` or break under
    test reordering (the former parametrized version kept state on the
    test function object across parametrizations)."""
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        minhash_lsh_dedup,
    )
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    results = {}
    for flag in ("0", "1"):
        os.environ["SPARK_GRAFT_FANOUT"] = flag
        try:
            results[flag] = sorted(
                minhash_lsh_dedup(docs, n=3, num_hashes=16, bands=4).collect()
            )
        finally:
            os.environ.pop("SPARK_GRAFT_FANOUT", None)
    assert results["0"] == results["1"]
    assert len(results["0"]) > 0  # non-vacuity
