"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline queries are measured as the MEDIAN of ``$SPARK_GRAFT_BENCH_REPS``
(default 5) warm repetitions, with the inter-quartile range reported
alongside (``headline_iqr`` / per-query ``spread``): the r02->r03 rounds
showed the single-shot headline swinging 5.44s -> 7.49s with unchanged
code — pure machine-load variance — so a single measurement cannot
distinguish a real regression under ~40% from noise.  Non-headline queries
keep one warm shot each (they are coverage, not the regression gate, and
142 x 5 repetitions would push the harness past the driver's budget).

The stdout line keeps only the headline per-query timings so it stays short
enough to survive any output-capture truncation (BENCH_r01 recorded
``parsed: null`` because the full 74-query line was cut mid-stream); the
complete per-query breakdown is written to ``bench_result.json`` next to this
file.

Timing mirrors the reference's driver-side wall clock
(``MovieRank.java:204-210``) but materializes through Spark's noop sink so the
full plan executes without driver-side collection.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.session import get_session

# Headline set: the reference-parity pipelines plus one representative of each
# major widened family (kept in sync as families land).
HEADLINE = [
    "movie_rank",
    "movie_rank_desc",
    "movie_rating",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q18_large_volume",
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
]


def _run(df) -> float:
    start = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - start


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    spark = get_session(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}  # IQR across reps (headline only)
    for name in names:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT + IO cache)
        n_reps = reps if name in HEADLINE else 1
        samples = sorted(_run(df) for _ in range(n_reps))
        timings[name] = round(statistics.median(samples), 4)
        if n_reps >= 4:
            q1, _, q3 = statistics.quantiles(samples, n=4)
            spread[name] = round(q3 - q1, 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # "value" sums the FIXED headline set so it stays comparable across
    # rounds as the registry grows; the all-query total is reported
    # separately (a growing registry would otherwise read as a regression).
    headline_total = round(
        sum(timings[n] for n in HEADLINE if n in timings), 4
    )
    result = {
        "metric": "headline-query wall clock (median of %d), noop sink, "
        "local mode" % reps,
        "value": headline_total,
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "all_queries_total_sec": round(sum(timings.values()), 4),
        "n_queries": len(timings),
        "reps": reps,
        "headline_iqr": round(sum(spread.values()), 4),
    }
    full = dict(result, queries=timings, spread=spread)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_result.json"
    )
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
