"""Shared test fixtures: one SparkSession per test run + DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pytest

from ic_spark.session import get_spark


def pytest_collection_modifyitems(config, items):
    """Fast tier by default (VERDICT r12 #1): the full suite outgrew the
    driver's verify window (~45 min; the r12 verify was truncated at
    ~69% with zero failures, so every round's tests_ok signal was
    lost).  Tests measured >6 s are marked ``slow`` and skipped unless
    RUN_SLOW=1 — the default run keeps the oracle sweep, the plan pins,
    and every sub-6s operator/metadata test (~500 tests, <15 min).
    Builders MUST run ``RUN_SLOW=1 python -m pytest tests/`` (the full
    709-test suite) before closing a round; the driver's default run is
    the fast tier.  An explicit ``-m`` selection bypasses the gate so
    ``-m slow`` still works."""
    if os.environ.get("RUN_SLOW") == "1":
        return
    if config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow tier (set RUN_SLOW=1 for the full suite)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ic_spark-tests", shuffle_partitions="8")
    yield s


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the fixture tables registered as views."""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(rows, ndigits: int = 6):
    """Order-insensitive, float-rounded canonical form for comparisons."""

    def norm_val(v):
        if isinstance(v, float):
            return round(v, ndigits)
        return v

    # repr-keyed sort: total order even with None / mixed types.
    return sorted((tuple(norm_val(v) for v in r) for r in rows), key=repr)


def assert_df_matches_oracle(df, con, sql: str, ndigits: int = 6):
    """Compare a Spark DataFrame against DuckDB SQL, column-name-sorted
    (mirrors the driver's comparator: sort columns by name, then compare
    values order-insensitively)."""
    cols = sorted(df.columns)
    spark_rows = [tuple(r[c] for c in cols) for r in df.collect()]
    res = con.sql(sql)
    ocols = list(res.columns)
    assert sorted(ocols) == cols, f"column mismatch: spark={cols} oracle={sorted(ocols)}"
    idx = [ocols.index(c) for c in cols]
    oracle_rows = [tuple(r[i] for i in idx) for r in res.fetchall()]
    a, b = normalize(spark_rows, ndigits), normalize(oracle_rows, ndigits)
    assert len(a) == len(b), f"row count mismatch: spark={len(a)} oracle={len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"row {i} mismatch:\n  spark : {ra}\n  oracle: {rb}"
