"""Candlesticks (OHLC) — the reference computes these inside the NB+tree
(NBTreeLeaf::candlesticks / SuperblockCandlesticksScanOperator,
stdb/storage/nbtree.cc:1464,1908,2132) but never exposed a query-language
token; here it's a first-class operator over the narrow schema.

open/close use deterministic (ts, value) struct ordering; high/low are
plain min/max.  One hash aggregate — map-side partials apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc(
    samples: DataFrame,
    step_ns: int,
    begin_ns: int = 0,
    by: tuple[str, ...] = ("series_id", "metric"),
) -> DataFrame:
    """Per-series begin-aligned OHLC buckets."""
    bucket = (
        F.lit(begin_ns)
        + F.lit(step_ns) * F.expr(f"(ts - {begin_ns}L) div {step_ns}L")
    ).alias("ts")
    return samples.groupBy(*by, bucket).agg(
        F.min(F.struct("ts", "value")).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.struct("ts", "value")).getField("value").alias("close"),
        F.count("value").alias("n"),
    )
