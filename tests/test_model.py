"""Adapter smoke tests pinned to the driver's CURRENT testdata.

The driver has regenerated /root/testdata between rounds (events.ts
shipped as TIMESTAMP(NANOS) in round 1, TIMESTAMP(MICROS)-NTZ in round
3).  These tests open every real parquet file at sf0.001 and assert the
adapters still produce the canonical narrow schema — so a future
regeneration fails HERE, loudly, instead of inside 47 driver queries.
"""

import os

import pytest
from pyspark.sql import functions as F

from stdb_spark import model

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_every_table_opens(spark):
    for t in model.TESTDATA_TABLES:
        df = model.load_table(spark, SF, t)
        assert df.limit(1).count() == 1, t


def test_expected_columns_present(spark):
    """Column-name contract for every table the workloads read.  A
    regenerated testdata set that renames or drops a column should fail
    here, not deep inside 50 driver queries."""
    need = {
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
        "documents": {"doc_id", "text", "lang", "source"},
        "embeddings": {"vec_id", "embedding", "label"},
        "lineitem": {"l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
                     "l_returnflag", "l_linestatus", "l_shipdate"},
        "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"},
        "customer": {"c_custkey", "c_nationkey", "c_name"},
        "supplier": {"s_suppkey", "s_nationkey"},
        "part": {"p_partkey", "p_type"},
        "nation": {"n_nationkey", "n_regionkey", "n_name"},
        "region": {"r_regionkey", "r_name"},
    }
    for t, cols in need.items():
        have = set(model.load_table(spark, SF, t).columns)
        assert cols <= have, (t, cols - have)


def test_events_as_samples_schema_and_grid(spark):
    df = model.events_as_samples(spark, SF)
    assert [f.name for f in df.schema.fields] == [
        "series_id", "metric", "tags", "ts", "value",
    ]
    assert dict(df.dtypes)["ts"] == "bigint"
    row = df.agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.max(F.col("ts") % 1000).alias("sub_us"),
    ).first()
    # 2024 epoch-ns range, exactly on the µs grid (oracle uses epoch_us)
    assert 1_700_000_000 * 10**9 < row.lo < row.hi < 1_720_000_000 * 10**9
    assert row.sub_us == 0


def test_events_as_event_stream_schema(spark):
    df = model.events_as_event_stream(spark, SF)
    assert [f.name for f in df.schema.fields] == [
        "series_id", "metric", "tags", "ts", "body",
    ]
    assert dict(df.dtypes)["ts"] == "bigint"
    assert df.limit(1).first().metric.startswith("!")


def test_keep_src_appends_physical_column(spark):
    df = model.events_as_samples(spark, SF, keep_src=True)
    assert df.columns[-1] == "ts_src"
    # the ts_src bounds expression must exist whenever the column does
    cond = model.ts_src_bounds(df, 1_704_412_800_000_000_000, 1_705_276_800_000_000_000)
    assert cond is not None
    n_all = df.count()
    n_in = df.filter(cond).count()
    assert 0 < n_in < n_all


def test_ts_ns_dispatch_identical_across_generations(spark, tmp_path):
    """The same logical instants written as int64-ns and as
    TIMESTAMP(MICROS) must produce IDENTICAL adapter output — the
    driver has already switched the physical type once between
    rounds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = [1_704_067_200_000_000_000, 1_704_070_800_123_456_000]
    base = {
        "event_id": [1, 2],
        "user_id": [7, 8],
        "event_type": ["click", "view"],
        "value": [1.5, 2.5],
        "props": ["{}", "{}"],
    }
    d_long = str(tmp_path / "gen_long")
    d_us = str(tmp_path / "gen_us")
    for d in (d_long, d_us):
        import os

        os.makedirs(d)
    pq.write_table(
        pa.table({**base, "ts": pa.array(ns, pa.int64())}),
        f"{d_long}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {**base, "ts": pa.array([v // 1000 for v in ns], pa.timestamp("us"))}
        ),
        f"{d_us}/events.parquet",
    )
    a = sorted(model.events_as_samples(spark, d_long).collect())
    b = sorted(model.events_as_samples(spark, d_us).collect())
    assert a == b
    assert [r.ts for r in a] == [(v // 1000) * 1000 for v in ns]


def test_ts_src_bounds_conservative(spark):
    """ts_src pruning must never drop a row the exact ns predicate
    keeps (bounds are widened to the enclosing µs grid)."""
    df = model.events_as_samples(spark, SF, keep_src=True)
    lo, hi = 1_704_412_800_000_000_000, 1_705_276_800_000_000_000
    exact = df.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
    both = exact.filter(model.ts_src_bounds(df, lo, hi))
    assert exact.count() == both.count()
