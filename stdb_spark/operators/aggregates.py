"""The eleven aggregate functions.

Reference: AggregationFunction + AggregationResult (stdb/storage/operators/
operator.h:33-73) and the name mapping in
stdb/query/queryprocessor_framework.h:51-104:

    min max sum cnt mean first last
    min_timestamp max_timestamp first_timestamp last_timestamp

``first``/``last`` are the values at the scan-direction begin/end of the
range, so a backward query swaps them (and the *_timestamp pair).
``min_timestamp``/``max_timestamp`` are the timestamps at which the
min/max value occurred.  Ties are broken deterministically by (value, ts)
struct ordering — the reference's outcome depends on scan order; struct
ordering gives the smallest ts among ties which equals forward scan
order.

All of these compile to single Catalyst aggregate expressions, so Spark
performs partial (map-side) aggregation automatically — the analog of
the reference's per-subtree partials merged via AggregationResult::combine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AGG_OUTPUT_IS_TS = {
    "min_timestamp",
    "max_timestamp",
    "first_timestamp",
    "last_timestamp",
}


def agg_expr(
    func: str, backward: bool, value: str = "value", ts: str = "ts", exact: bool = False
) -> Column:
    """One Catalyst aggregate expression per reference function.

    ``exact=True`` computes sum/mean through decimal(28,10) so the result
    is independent of partial-aggregation order — bit-reproducible across
    engines (used by the oracle-checked suite; default off for speed).
    """
    v, t = F.col(value), F.col(ts)
    if exact:
        sum_d = F.sum(v.cast("decimal(28,10)")).cast("double")
        mean_d = F.sum(v.cast("decimal(28,10)")).cast("double") / F.count(v)
    else:
        sum_d = F.sum(v)
        mean_d = F.avg(v)
    first_s = F.min(F.struct(t, v))  # earliest ts, tie -> smallest value
    last_s = F.max(F.struct(t, v))
    minv_s = F.min(F.struct(v, t))  # smallest value, tie -> smallest ts
    maxv_s = F.max(F.struct(v, t))
    if backward:
        # backward scan: 'first' is the latest point in time
        first_s, last_s = last_s, first_s
        first_ts, last_ts = F.max(t), F.min(t)
    else:
        first_ts, last_ts = F.min(t), F.max(t)
    table = {
        "min": F.min(v),
        "max": F.max(v),
        "sum": sum_d,
        "count": F.count(v).cast("double"),
        "cnt": F.count(v).cast("double"),
        "mean": mean_d,
        "first": first_s.getField(value),
        "last": last_s.getField(value),
        "min_timestamp": minv_s.getField(ts).cast("double"),
        "max_timestamp": maxv_s.getField(ts).cast("double"),
        "first_timestamp": first_ts.cast("double"),
        "last_timestamp": last_ts.cast("double"),
        # --- extensions beyond the reference's 11 (SURVEY §2.4 "free in
        # Spark if exposed"): exact distinct count and exact linear-
        # interpolation percentiles (matching DuckDB quantile_cont)
        "distinct_count": F.count_distinct(v).cast("double"),
        "median": F.percentile(v, F.lit(0.5)),
        "p90": F.percentile(v, F.lit(0.90)),
        "p95": F.percentile(v, F.lit(0.95)),
        "p99": F.percentile(v, F.lit(0.99)),
    }
    if func not in table:
        raise ValueError(f"unknown aggregate function {func!r}")
    return table[func]


def oracle_agg_sql(
    func: str, backward: bool, value: str = "value", ts: str = "ts", exact: bool = False
) -> str:
    """DuckDB SQL fragment with semantics identical to :func:`agg_expr`
    (used to build oracle queries; struct comparison works the same way)."""
    if exact:
        sum_d = f"CAST(sum(CAST({value} AS DECIMAL(28,10))) AS DOUBLE)"
        mean_d = f"{sum_d} / count({value})"
    else:
        sum_d = f"sum({value})"
        mean_d = f"avg({value})"
    first_s = f"min(struct_pack(t := {ts}, v := {value}))"
    last_s = f"max(struct_pack(t := {ts}, v := {value}))"
    minv_s = f"min(struct_pack(v := {value}, t := {ts}))"
    maxv_s = f"max(struct_pack(v := {value}, t := {ts}))"
    if backward:
        first_s, last_s = last_s, first_s
        first_ts, last_ts = f"max({ts})", f"min({ts})"
    else:
        first_ts, last_ts = f"min({ts})", f"max({ts})"
    table = {
        "min": f"min({value})",
        "max": f"max({value})",
        "sum": sum_d,
        "count": f"CAST(count({value}) AS DOUBLE)",
        "cnt": f"CAST(count({value}) AS DOUBLE)",
        "mean": mean_d,
        "first": f"({first_s}).v",
        "last": f"({last_s}).v",
        "min_timestamp": f"CAST(({minv_s}).t AS DOUBLE)",
        "max_timestamp": f"CAST(({maxv_s}).t AS DOUBLE)",
        "first_timestamp": f"CAST({first_ts} AS DOUBLE)",
        "last_timestamp": f"CAST({last_ts} AS DOUBLE)",
        "distinct_count": f"CAST(count(DISTINCT {value}) AS DOUBLE)",
        "median": f"quantile_cont({value}, 0.5)",
        "p90": f"quantile_cont({value}, 0.90)",
        "p95": f"quantile_cont({value}, 0.95)",
        "p99": f"quantile_cont({value}, 0.99)",
    }
    return table[func]
