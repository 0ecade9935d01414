"""Dump `.explain("formatted")` for registry queries to files.

Usage: python tools/explain.py OUT_DIR SUFFIX [SF_DIR] [name1,name2,...]

Writes OUT_DIR/<name>_<SUFFIX>.txt for each query.  Plan capture does
not need an idle host (no timing), so this can run alongside other
work; the judge checks plan claims against these files.
"""
import os
import sys

sys.path.insert(0, ".")
from ic_spark.queries import REGISTRY  # noqa: E402
from ic_spark.session import get_spark  # noqa: E402

OUT = sys.argv[1]
SUFFIX = sys.argv[2]
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
NAMES = (
    sys.argv[4].split(",")
    if len(sys.argv) > 4
    else [q.name for q in REGISTRY.values() if q.headline]
)

os.makedirs(OUT, exist_ok=True)
spark = get_spark("explain")
spark.sparkContext.setLogLevel("ERROR")

for name in NAMES:
    q = REGISTRY[name]
    try:
        df = q.fn(spark, SF)
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # capture the failure instead of dying
        txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(f"# wrote {path} ({len(txt)} bytes)")
