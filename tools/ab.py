"""Same-host A/B benchmarking helper.

Times registry queries at sf0.1, min-of-3, after the same JVM/Python
warmup AND anchor laps bench.py uses (r10: the anchor jobs C2-compile
shared Spark internals — without them the first timed query absorbed
that warm-up, systematically penalizing whichever checkout ran a query
first).  The calibration/latency anchors are printed so interleaved
A-B legs can be noise-bracketed.  Run the SAME invocation against two
checkouts (e.g. a worktree of the previous round) back-to-back on one
host to compare implementations — cross-day absolute numbers are
meaningless here (CPU-steal bursts).  clearCache runs before every rep
so internally-persisting queries can't serve reps 2-3 from rep 1's
blocks.

Usage: python tools/ab.py [SF_DIR] [name1,name2,...]
"""
import sys
import time

sys.path.insert(0, ".")
from bench import calibration_secs, latency_secs  # noqa: E402
from ic_spark.queries import REGISTRY  # noqa: E402
from ic_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "dedup_minhash_lsh", "dedup_token_jaccard"
]

spark = get_spark("ab")
spark.sparkContext.setLogLevel("ERROR")
from ic_spark.tables import TABLES, load_table  # noqa: E402

for t in TABLES:
    try:  # partial dirs (e.g. the sf1 probe set has no events table)
        load_table(spark, SF, t).count()
    except Exception:
        pass
from pyspark.sql.functions import pandas_udf  # noqa: E402


def _ping(s):
    return s


spark.range(0, 32, 1, 32).select(
    pandas_udf(_ping, "long")("id").alias("x")
).agg({"x": "sum"}).collect()

# Anchor warm-up lap + measured anchors (same protocol as bench.py) —
# printed so interleaved A/B legs can be noise-bracketed.
calibration_secs(spark, reps=2)
latency_secs(spark, reps=5)
print(f"# anchors: cpu {calibration_secs(spark)}s "
      f"latency {latency_secs(spark)}s")

for name in NAMES:
    q = REGISTRY[name]
    best = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows = q.fn(spark, SF).count()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s ({rows} rows)")
