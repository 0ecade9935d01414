"""Interleaved per-query A/B timing helper (bench protocol, one leg).

Usage: python tools/ab_time.py name1,name2,... [reps]

Times each named registry query with the EXACT bench.py rep protocol
(clearCache before every rep, min-of-reps, .count() action) in the
current session configuration — environment variables select the
session config, so an A/B is two processes run back-to-back per leg.
Prints one JSON line {"name": best_sec, ...}.  Timing only; the oracle
sweep stays the correctness authority.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ic_spark.queries import REGISTRY  # noqa: E402
from ic_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = sys.argv[1].split(",")
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("ab_time")
spark.sparkContext.setLogLevel("ERROR")

# Warm the JVM + page cache once (the bench does the same via its
# pre-anchors + warm-up reads).
for name in NAMES:
    REGISTRY[name].fn(spark, SF_DIR).count()

out = {}
for name in NAMES:
    q = REGISTRY[name]
    best = float("inf")
    for _ in range(REPS):
        spark.catalog.clearCache()
        start = time.perf_counter()
        q.fn(spark, SF_DIR).count()
        best = min(best, time.perf_counter() - start)
    out[name] = round(best, 3)
print(json.dumps(out))
