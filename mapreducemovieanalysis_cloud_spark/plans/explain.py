"""Physical-plan introspection: the engine's scale guarantees as assertable
properties.

The reference's performance story is manual operator placement (SURVEY §4);
ours is Catalyst — but "the optimizer will handle it" is only true if the
plan actually shows it. These helpers turn .explain() output into testable
facts: did the dim side broadcast, did filters reach the parquet scan, did
column pruning shrink the read schema, did top-k avoid a full sort. The
plan-quality tests pin them so a refactor that silently loses a pushdown
fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    """orderBy().limit() must plan as TakeOrderedAndProject (per-partition
    heaps), not a global Sort + CollectLimit."""
    return "TakeOrderedAndProject" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (row-group pruning at scale)."""
    text = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column pruning check)."""
    text = explain_formatted(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [
            c.split(":")[0].strip()
            for c in m.group(1).split(",")
            if ":" in c
        ]
        schemas.append(cols)
    return schemas


def scan_columns_minimal(df: DataFrame, allowed: dict[str, set[str]]) -> bool:
    """True if every scan reads only columns in ``allowed`` (keyed by any
    column present to identify the table)."""
    for cols in read_schema_columns(df):
        matched = False
        for allowed_cols in allowed.values():
            if set(cols) <= allowed_cols:
                matched = True
                break
        if not matched:
            return False
    return True


def exchange_input_columns(df: DataFrame) -> list[list[str]]:
    """Column-name lists entering each Exchange (shuffle or broadcast)
    in the formatted plan — the assertable form of "big payload columns
    never shuffle": a binary/blob column appearing in a shuffle's input
    multiplies the exchange volume by the payload size, the difference
    between shuffling 16-byte fingerprints and shuffling the media
    bytes themselves at 100 TB.

    Parses the node sections of ``explain('formatted')``: each
    ``(n) Exchange`` block lists ``Input [k]: [col#id, ...]``.

    Known parsing limits (r12 advisor item 4): the Input list is split
    on ``,`` and truncated at ``#``, so a column NAME containing a
    comma (or a struct-typed rendering with embedded commas) would be
    mis-split into bogus fragments — no such names exist in this
    engine's schemas, and the pin tests carry non-vacuity controls
    that fail on format drift.  ``ReusedExchange`` nodes are not
    matched; benign today because the original Exchange is always
    present in the same formatted plan."""
    text = explain_formatted(df)
    out: list[list[str]] = []
    for m in re.finditer(
        r"\(\d+\) (?:Broadcast)?Exchange[^\n]*\n"
        r"Input \[\d+\]: \[([^\]]*)\]",
        text,
    ):
        cols = [
            c.strip().split("#")[0]
            for c in m.group(1).split(",")
            if c.strip()
        ]
        out.append(cols)
    return out


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fused JVM loops) in the final plan.

    Under AQE the codegen stage ids (the ``*(N)`` operator prefixes) only
    appear once the plan is finalized, so this executes the DataFrame's OWN
    query execution (a noop-sink write would finalize a different
    QueryExecution and leave this one non-adaptive) — via the physical
    plan's RDD and a JVM-side count, so nothing is ever collected to the
    driver and the helper is safe on arbitrarily large frames."""
    df._jdf.queryExecution().executedPlan().execute().count()
    plan = executed_plan(df)
    spans = set(re.findall(r"\*\((\d+)\)", plan))
    return len(spans) or len(re.findall(r"WholeStageCodegen", plan))
