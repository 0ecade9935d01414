"""Property-based tests (hypothesis): operators vs independent models
on randomized inputs — catches edge cases fixed fixtures miss."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from ic_spark.operators.asof import asof_join
from ic_spark.operators.rangejoin import interval_join
from ic_spark.compaction.writer import rewrite_files
from ic_spark.compaction.request import FileScanTask, RewriteFilesRequest

from tests.conftest import normalize

# Keep examples tiny and few: each example spins Spark jobs.
FEW = settings(max_examples=5, deadline=None)


@FEW
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.floats(0, 100)),
        min_size=0,
        max_size=15,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join == pandas.merge_asof (backward, exact matches allowed)
    on random keyed time series."""
    # De-dup right on (key, time): asof over a non-unique time key is
    # ambiguous in ANY engine (documented operator precondition).
    rmap = {}
    for k, t, v in right:
        rmap[(k, t)] = v
    right_rows = [(k, t, v) for (k, t), v in sorted(rmap.items())]
    # pandas requires unique-sorted; give every left row an id for join-back.
    ldf = pd.DataFrame(sorted(left), columns=["k", "t"]).sort_values("t", kind="stable")
    rdf = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t", kind="stable")
    if rdf.empty:
        expected = ldf.assign(v=None)
    else:
        expected = pd.merge_asof(ldf, rdf, on="t", by="k", direction="backward")

    sl = spark.createDataFrame(ldf[["k", "t"]], "k long, t long")
    sr = spark.createDataFrame(right_rows or [(0, -1, 0.0)], "k long, t long, v double")
    if not right_rows:
        sr = sr.where(F.lit(False))
    out = asof_join(sl, sr, on="k", left_time="t", right_time="t", right_payload=["v"])
    got = sorted(
        ((r.k, r.t, None if r.v is None else round(r.v, 6)) for r in out.collect())
    )
    want = sorted(
        (
            (int(r.k), int(r.t), None if pd.isna(r.v) else round(float(r.v), 6))
            for r in expected.itertuples()
        )
    )
    assert got == want


@FEW
@given(
    points=st.lists(st.integers(0, 1000), min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(1, 300)), min_size=1, max_size=10
    ),
    width=st.sampled_from([7, 100, 256]),
)
def test_interval_join_matches_naive(spark, points, intervals, width):
    """Bucketed interval join == naive cross-join filter for arbitrary
    bucket widths and interval shapes."""
    lp = spark.createDataFrame(
        [(i, t) for i, t in enumerate(points)], "lid long, t long"
    ).select("lid", F.timestamp_seconds("t").alias("t"))
    rp = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(intervals)], "rid long, s long, e long"
    ).select(
        "rid", F.timestamp_seconds("s").alias("s"), F.timestamp_seconds("e").alias("e")
    )
    fast = interval_join(lp, rp, "t", "s", "e", bucket_width_seconds=width).select(
        "lid", "rid"
    )
    naive = (
        lp.crossJoin(rp)
        .where((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
        .select("lid", "rid")
    )
    assert normalize(map(tuple, fast.collect())) == normalize(
        map(tuple, naive.collect())
    )


@FEW
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2000), st.integers(1, 400)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2000), st.integers(1, 400)), min_size=1, max_size=12
    ),
    width=st.sampled_from([7, 100, 256]),
)
def test_overlap_join_matches_naive(spark, lefts, rights, width):
    """Bucketed interval-OVERLAP join == naive theta join — canonical-
    bucket emission must produce each overlapping pair exactly once.
    Inputs use MICROSECOND offsets so fractional-second interval ends
    exercise the exclusive-end bucketing."""
    from ic_spark.operators.rangejoin import overlap_join

    ldf = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(lefts)],
        "lid long, s long, e long",
    ).select(
        "lid",
        F.timestamp_micros(F.col("s") * 1_000_000 + 500_000).alias("ls"),
        F.timestamp_micros(F.col("e") * 1_000_000 + 500_000).alias("le"),
    )
    rdf = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(rights)],
        "rid long, s long, e long",
    ).select(
        "rid",
        F.timestamp_micros(F.col("s") * 1_000_000 + 250_000).alias("rs"),
        F.timestamp_micros(F.col("e") * 1_000_000 + 250_000).alias("re"),
    )
    fast = overlap_join(
        ldf, rdf, "ls", "le", "rs", "re", bucket_width_seconds=width
    ).select("lid", "rid")
    naive = (
        ldf.crossJoin(rdf)
        .where((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .select("lid", "rid")
    )
    fast_rows = [tuple(r) for r in fast.collect()]
    assert len(fast_rows) == len(set(fast_rows))  # exactly-once emission
    assert normalize(fast_rows) == normalize(map(tuple, naive.collect()))


def test_rewrite_max_records_per_file(spark, tmp_path):
    """max_records_per_file bounds output file sizes (writer knob)."""
    import os

    src = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
    d = str(tmp_path / "mr_src")
    src.coalesce(1).write.parquet(d)
    f = next(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    out_dir = str(tmp_path / "mr_out")
    rewrite_files(
        spark,
        RewriteFilesRequest(
            schema=src.schema,
            data_files=[FileScanTask(f, sequence_number=1)],
            dir_path=out_dir,
            target_partitions=1,
            max_records_per_file=100,
        ),
    )
    files = [n for n in os.listdir(out_dir) if n.endswith(".parquet")]
    assert len(files) == 10  # 1000 rows / 100 per file
    back = spark.read.parquet(out_dir)
    assert back.count() == 1000


# ------------------------------------------------ roaring DV codec


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=1 << 20),
            st.integers(min_value=(1 << 32) - 5, max_value=(1 << 32) + 5),
            st.integers(min_value=0, max_value=(1 << 63) - 1),
        ),
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_roaring64_roundtrip_property(positions):
    """Any position set round-trips through the portable 64-bit roaring
    serialization + DV blob framing (sorted, deduped)."""
    from ic_spark.sources.puffin import deserialize_dv_blob, serialize_dv_blob

    assert deserialize_dv_blob(serialize_dv_blob(positions)) == sorted(set(positions))


def test_roaring32_bitmap_container_boundary():
    """Exactly 4096 lows stays an array container; 4097 flips to a
    bitset — both round-trip at the threshold."""
    from ic_spark.sources.puffin import _deserialize_roaring32, _serialize_roaring32

    for n in (4096, 4097):
        vals = list(range(n))
        out, end = _deserialize_roaring32(_serialize_roaring32(vals), 0)
        assert out == vals
