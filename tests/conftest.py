"""Shared test fixtures: one SparkSession per test run + DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from ic_spark.session import get_spark

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
