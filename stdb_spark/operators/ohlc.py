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


def ohlc_from_summaries(
    summaries: DataFrame,
    step_ns: int,
    begin_ns: int = 0,
    by: tuple[str, ...] = ("series_id", "metric"),
) -> DataFrame:
    """OHLC by COMBINING summary-table rows (sources/storage.summary_table)
    instead of re-scanning leaves — the SubtreeRef pushdown
    (stdb/storage/nbtree_def.h:47-84) extended to candlesticks: each
    summary bucket already carries (first, first_ts, last, last_ts,
    min, max, cnt), and those combine exactly into any coarser
    begin-aligned bucket:

        open  = first of the earliest first_ts   (min (first_ts, first))
        close = last of the latest last_ts       (max (last_ts, last))
        high/low = max of maxes / min of mins
        n     = sum of cnts

    Caller contract (the same provable-exactness rule the engine's
    summary planner enforces): ``step_ns`` must be a multiple of the
    summary step and ``begin_ns`` aligned to it, so every summary
    bucket nests wholly inside one output bucket.  Tie-breaks are
    bit-identical to :func:`ohlc` because the summary's _first/_last
    structs use the same (ts, value) ordering."""
    bucket = (
        F.lit(begin_ns)
        + F.lit(step_ns) * F.expr(f"(bucket_ts - {begin_ns}L) div {step_ns}L")
    ).alias("ts")
    return summaries.groupBy(*by, bucket).agg(
        F.min(F.struct("first_ts", "first")).getField("first").alias("open"),
        F.max("max").alias("high"),
        F.min("min").alias("low"),
        F.max(F.struct("last_ts", "last")).getField("last").alias("close"),
        F.sum("cnt").cast("long").alias("n"),
    )
