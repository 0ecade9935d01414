"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count);
a warm-up of the input files happens once so the numbers measure query
execution, not OS page-cache misses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ic_spark.queries import REGISTRY  # noqa: E402
from ic_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("ic_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [q for q in REGISTRY.values() if q.headline]

    # Warm-up: touch every fixture file once (page cache + session JIT).
    from ic_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).count()

    # Warm the Python UDF workers too (fork + numpy/pandas import is a
    # one-time ~2-3 s cost across 32 workers that would otherwise land
    # entirely on the first Arrow-UDF query).
    from pyspark.sql.functions import pandas_udf

    # No parameter hints: `from __future__ import annotations` would
    # stringify them, which pandas_udf's hint inference rejects.
    def _ping(s):
        return s

    # Aggregate OVER the UDF output — count() alone lets ColumnPruning
    # drop the (deterministic) UDF column and no worker ever forks.
    spark.range(0, 32, 1, 32).select(
        pandas_udf(_ping, "long")("id").alias("x")
    ).agg({"x": "sum"}).collect()

    # Two reps, report the min: the shared host shows bursty CPU steal,
    # and min-of-reps measures the engine rather than the neighbors.
    timings: dict[str, float] = {}
    for q in headline:
        best, rows = float("inf"), 0
        for _ in range(2):
            start = time.perf_counter()
            rows = q.fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - start)
        timings[q.name] = round(best, 3)
        print(f"# {q.name}: {timings[q.name]}s ({rows} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
