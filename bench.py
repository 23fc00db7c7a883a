"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing mirrors the reference's driver-side wall clock
(``MovieRank.java:204-210``) but materializes through Spark's noop sink so the
full plan executes without driver-side collection.
"""

from __future__ import annotations

import json
import os
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    timings: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT + IO cache)
        start = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - start, 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline-query wall clock, noop sink, local mode",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
