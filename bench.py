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
    record = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        sf1_timings = run_sf1_probe(spark)
        record["sf1_queries"] = sf1_timings
        record["sf1_value"] = round(sum(sf1_timings.values()), 3)

    print(json.dumps(record))


# --------------------------------------------------------- sf1 scale probe
#
# The 100x-scale claims rest on plan reading; this probe actually RUNS the
# five most expensive headline queries at 10x the bench SF to catch any
# super-linear surprise (driver-side loop, job-count blowup, shuffle
# explosion) that plan inspection missed.
#
# Scaling model = how a real table grows: FACT tables (lineitem, orders,
# customer, documents, embeddings) are replicated 10x with join/delete
# keys shifted per replica; DIMENSION tables (part, supplier, nation,
# region) stay fixed.  The shift constant is a multiple of every modulus
# the queries use (360360 = 2^3*3^2*5*7*11*13), so mod-derived delete
# fractions and virtual-file layouts are IDENTICAL per replica and the
# correct output is exactly 10x the sf0.1 output.  Document text is
# Caesar-rotated per replica (token/shingle structure preserved, zero
# cross-replica shingle overlap) and `source` is replica-suffixed, so
# near-dup density and Jaccard block sizes match sf0.1 — the probe
# measures the ENGINE at 10x, not an artificially dup-heavy corpus.

SF1_SHIFT = 360360 * 10_000
SF1_REPLICAS = 10
SF1_PROBE_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_token_jaccard",
    "mor_full_merge_on_read",
    "sim_ivf_topk",
    "q5_local_supplier_volume",
]
# fact table -> key columns shifted by replica*SF1_SHIFT
SF1_FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SF1_DIMS = ["part", "supplier", "nation", "region"]


def ensure_sf1_dir(spark) -> str:
    import pyspark.sql.functions as F

    from ic_spark.tables import load_table

    out_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/ic_spark_sf1")
    marker = os.path.join(out_dir, "_GENERATED")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    alpha = "abcdefghijklmnopqrstuvwxyz"

    for name, keys in SF1_FACTS.items():
        base = load_table(spark, SF_DIR, name)
        parts = []
        for i in range(SF1_REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * SF1_SHIFT))
            if name == "documents":
                rot = alpha[i:] + alpha[:i]
                rep = rep.withColumn(
                    "text", F.translate(F.col("text"), alpha, rot)
                ).withColumn("source", F.concat_ws("_r", F.col("source"), F.lit(i)))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name in SF1_DIMS:
        load_table(spark, SF_DIR, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def run_sf1_probe(spark) -> dict[str, float]:
    t0 = time.perf_counter()
    sf1_dir = ensure_sf1_dir(spark)
    print(f"# sf1 data ready in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    timings: dict[str, float] = {}
    for name in SF1_PROBE_QUERIES:
        q = REGISTRY[name]
        best, rows = float("inf"), 0
        for _ in range(2):
            start = time.perf_counter()
            rows = q.fn(spark, sf1_dir).count()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        print(f"# sf1 {name}: {timings[name]}s ({rows} rows)", file=sys.stderr)
    return timings


if __name__ == "__main__":
    main()
