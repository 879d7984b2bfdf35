"""Gap-filling resample: regularize a per-series sample stream onto a
fixed bucket grid, filling empty buckets by last-observation-carried-
forward (locf) or linear interpolation.

The reference has no gap-filling (its group-aggregate simply omits empty
buckets, stdb/storage/nbtree.cc:1067-1422); every TSDB user asks for it
(TimescaleDB time_bucket_gapfill / InfluxDB fill()).  Buckets are
begin-aligned like the engine's group-aggregate.

Plan shape at 100 TB: one shuffle to bucket-aggregate the samples, one
tiny exchange to build the (series × bucket) grid from the distinct
series set, then window functions over series — the grid is
#series × #buckets rows, dwarfed by the input; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _anchored(
    samples: DataFrame,
    begin: int,
    end: int,
    step: int,
    series_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """(series, bucket) grid left-joined with per-bucket first/last
    anchors (row-atomic struct min/max over (ts, value))."""
    n_buckets = (end - begin + step - 1) // step
    s = samples.filter((F.col(ts_col) >= begin) & (F.col(ts_col) < end))
    tv = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    bucketed = (
        s.withColumn("_bk", ((F.col(ts_col) - begin) / step).cast("long"))
        .groupBy(series_col, "_bk")
        .agg(F.min(tv).alias("_first"), F.max(tv).alias("_last"))
    )
    grid = (
        s.select(series_col)
        .distinct()
        .select(
            series_col,
            F.explode(F.sequence(F.lit(0), F.lit(int(n_buckets - 1)))).alias("_bk"),
        )
    )
    return grid.join(bucketed, [series_col, "_bk"], "left_outer").withColumn(
        "_ts", (F.lit(begin) + F.col("_bk") * step).cast("long")
    )


def resample_locf(
    samples: DataFrame,
    begin: int,
    end: int,
    step: int,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Empty buckets carry the most recent earlier value forward;
    buckets before a series' first sample stay null.  Non-empty buckets
    report their own last value."""
    g = _anchored(samples, begin, end, step, series_col, ts_col, value_col)
    w = (
        Window.partitionBy(series_col)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(F.col("_last"), ignorenulls=True).over(w)
    return g.select(
        F.col(series_col),
        F.col("_ts").alias(ts_col),
        carried.getField("v").alias(value_col),
    )


def resample_interpolate(
    samples: DataFrame,
    begin: int,
    end: int,
    step: int,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Empty buckets get the linear interpolation between the last
    earlier anchor and the first later anchor (by actual sample
    timestamps, evaluated at the bucket start); buckets outside the
    series' observed span stay null.  Non-empty buckets report their own
    last value.  Pure double arithmetic in a fixed expression order, so
    any engine reproduces it bit-for-bit."""
    g = _anchored(samples, begin, end, step, series_col, ts_col, value_col)
    wb = (
        Window.partitionBy(series_col)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(series_col)
        .orderBy("_bk")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev = F.last(F.col("_last"), ignorenulls=True).over(wb)
    nxt = F.first(F.col("_first"), ignorenulls=True).over(wf)
    interp = prev.getField("v") + (
        nxt.getField("v") - prev.getField("v")
    ) * (
        (F.col("_ts") - prev.getField("t")).cast("double")
        / (nxt.getField("t") - prev.getField("t")).cast("double")
    )
    filled = F.when(F.col("_last").isNotNull(), F.col("_last").getField("v")).otherwise(
        F.when(prev.isNotNull() & nxt.isNotNull(), interp)
    )
    return g.select(
        F.col(series_col),
        F.col("_ts").alias(ts_col),
        filled.alias(value_col),
    )
