"""Visualization-preserving downsampling.

M4 (Jugel et al., VLDB 2014 — public algorithm): per (series, pixel
bucket) keep the first, last, min and max samples; rendering those 4
anchors per pixel column reproduces the exact line rasterization of the
full-resolution series.  The reference can only bucket-aggregate one
function at a time (stdb/storage/nbtree.cc:1067-1422); M4 is the
operator a grafana-style frontend actually wants.

Plan shape at 100 TB: ONE hash exchange on (series, bucket) with
map-side partial aggregation — the anchors are struct min/max, so
Tungsten keeps the whole reduction JVM-side and each anchor is
row-atomic (ts and value come from the SAME sample; ties on equal
values break deterministically by the struct's second field).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def m4(
    samples: DataFrame,
    begin: int,
    end: int,
    step: int,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (series, bucket) carrying the four M4 anchors:
    (first_ts, first_v), (min_v, min_ts), (max_v, max_ts),
    (last_ts, last_v).  Buckets are begin-aligned, [begin, end) half-open
    like the engine's group-aggregate."""
    ts, v = F.col(ts_col), F.col(value_col)
    s = samples.filter((ts >= begin) & (ts < end))
    bk = F.expr(f"({ts_col} - {int(begin)}L) div {int(step)}L")
    tv = F.struct(ts.alias("t"), v.alias("v"))
    vt = F.struct(v.alias("v"), ts.alias("t"))
    agg = (
        s.withColumn("bk", bk)
        .groupBy(series_col, "bk")
        .agg(
            F.min(tv).alias("_f"),
            F.max(tv).alias("_l"),
            F.min(vt).alias("_mn"),
            F.max(vt).alias("_mx"),
        )
    )
    return agg.select(
        series_col,
        "bk",
        F.col("_f.t").alias("first_ts"),
        F.col("_f.v").alias("first_v"),
        F.col("_mn.v").alias("min_v"),
        F.col("_mn.t").alias("min_ts"),
        F.col("_mx.v").alias("max_v"),
        F.col("_mx.t").alias("max_ts"),
        F.col("_l.t").alias("last_ts"),
        F.col("_l.v").alias("last_v"),
    )


def _hashed_per_series_apply(
    samples: DataFrame,
    pick_one,
    series_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Shared dispatch for sequential per-series kernels: ONE
    applyInPandas call per hash partition of series (per-group Arrow
    overhead dominates with many short series), each series intact in
    one frame, the kernel applied per series inside."""
    import pandas as pd

    out_schema = f"{series_col} string, {ts_col} long, {value_col} double"

    def _pick(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [
            pick_one(g) for _, g in pdf.groupby(series_col, sort=False)
        ]
        return pd.concat(parts, ignore_index=True)

    n_pg = int(samples.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    tagged = samples.select(series_col, ts_col, value_col).withColumn(
        "_pg", F.pmod(F.xxhash64(series_col), F.lit(n_pg))
    )
    return tagged.groupBy("_pg").applyInPandas(_pick, schema=out_schema)


def lttb(
    samples: DataFrame,
    n_out: int,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets (Steinarsson 2013 — public
    algorithm): per series, pick the ``n_out`` samples that best
    preserve the line's visual shape (first + last always kept; each
    interior bucket keeps the point maximizing the triangle area with
    the previously kept point and the next bucket's centroid).

    The selection is inherently sequential per series (each choice
    depends on the previous), so this is the documented Pandas-UDF slow
    path — but the shuffle is ONE ``applyInPandas`` call per hash
    partition of series (``_pg``), not one per series: per-group Arrow
    overhead dominates with many short series, so series are hashed
    onto ``shuffle.partitions`` groups (each series intact in one
    frame) and the sequential kernel runs per series inside.  A series'
    samples must fit in one partition — at 100 TB pre-reduce with
    :func:`m4` (e.g. step = span/(4*n_out)) before LTTB; the anchors
    preserve exactly the extremes LTTB needs.
    """
    import numpy as np
    import pandas as pd

    def _pick_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        n = len(pdf)
        if n <= n_out:
            return pdf[[series_col, ts_col, value_col]]
        t = pdf[ts_col].to_numpy(dtype=np.float64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        # bucket edges over the interior points (first/last pinned)
        edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        keep = np.empty(n_out, dtype=np.int64)
        keep[0] = 0
        for i in range(n_out - 2):
            lo, hi = edges[i], edges[i + 1]
            nlo, nhi = edges[i + 1], (n if i == n_out - 3 else edges[i + 2])
            cx, cy = t[nlo:nhi].mean(), v[nlo:nhi].mean()
            ax, ay = t[keep[i]], v[keep[i]]
            area = np.abs(
                (ax - cx) * (v[lo:hi] - ay) - (ax - t[lo:hi]) * (cy - ay)
            )
            keep[i + 1] = lo + int(np.argmax(area))
        keep[-1] = n - 1
        out = pdf.iloc[keep]
        return out[[series_col, ts_col, value_col]]

    return _hashed_per_series_apply(
        samples, _pick_one, series_col, ts_col, value_col
    )


def lttb_exact_int(
    samples: DataFrame,
    n_out: int,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
    qscale: int = 1_000_000,
) -> DataFrame:
    """Cross-engine-exact LTTB twin of :func:`lttb` (the SemDeDup /
    PageRank fixed-point pattern): the greedy selection runs on
    INTEGER coordinates — ts as-is, value quantized to
    ``trunc(value * qscale)`` — with the triangle-area comparison
    cleared of the centroid division::

        area(P) ∝ |(t_a*c - St)*(w_P - w_a) - (t_a - t_P)*(Sw - w_a*c)|

    (c, St, Sw = next bucket's count and coordinate sums), evaluated in
    arbitrary-precision Python ints, argmax ties broken by first index.
    Bucket edges are the integer analog of the float linspace:
    ``e_k = 1 + (k*(n-2)) // (n_out-2)``.  Every quantity is an exact
    integer, so a DuckDB recursive CTE replays the identical selection
    (HUGEINT arithmetic) — which is what buys the full value-hash
    oracle; the float :func:`lttb` remains the production operator.
    Output rows carry the ORIGINAL values of the selected samples.

    Same scale shape as :func:`lttb`: one hash exchange, the
    sequential kernel per series inside an Arrow frame."""
    import pandas as pd

    if n_out < 2:
        raise ValueError("n_out must be >= 2 (first + last always kept)")

    def _pick_one(pdf: pd.DataFrame) -> pd.DataFrame:
        # (ts, value) order: deterministic arrays even when timestamps
        # repeat — the SQL twin's row_number uses the same key
        pdf = pdf.sort_values([ts_col, value_col])
        n = len(pdf)
        if n <= n_out:
            return pdf[[series_col, ts_col, value_col]]
        if n_out == 2:
            # endpoints only: no interior buckets (and the bucket-edge
            # formula would divide by n_out - 2)
            return pdf.iloc[[0, n - 1]][[series_col, ts_col, value_col]]
        t = [int(x) for x in pdf[ts_col]]
        # one IEEE multiply then truncation toward zero — the exact
        # spec DuckDB's trunc(value * qscale) reproduces
        w = [int(v * qscale) for v in pdf[value_col]]
        edges = [1 + (k * (n - 2)) // (n_out - 2) for k in range(n_out - 1)]
        keep = [0]
        for i in range(n_out - 2):
            lo, hi = edges[i], edges[i + 1]
            nlo = edges[i + 1]
            nhi = n if i == n_out - 3 else edges[i + 2]
            c = nhi - nlo
            st = sum(t[nlo:nhi])
            sw = sum(w[nlo:nhi])
            a = keep[-1]
            best_j, best_area = lo, -1
            for j in range(lo, hi):
                area = abs(
                    (t[a] * c - st) * (w[j] - w[a])
                    - (t[a] - t[j]) * (sw - w[a] * c)
                )
                if area > best_area:
                    best_j, best_area = j, area
            keep.append(best_j)
        keep.append(n - 1)
        return pdf.iloc[keep][[series_col, ts_col, value_col]]

    return _hashed_per_series_apply(
        samples, _pick_one, series_col, ts_col, value_col
    )


def decimate(
    samples: DataFrame,
    n: int,
    series_cols: tuple[str, ...] = ("series",),
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Stride decimation: keep every n-th sample per series in time
    order (rows 1, n+1, 2n+1, ...) — the cheapest downsample, used when
    shape preservation (LTTB/M4) is not required, e.g. thinning a debug
    series before export.

    ``order_cols`` extends the per-series order with tie-break columns
    so the kept set is a deterministic function of the data when
    timestamps repeat.  One exchange: the per-series window sort."""
    if n <= 0:
        raise ValueError("n must be positive")
    w = Window.partitionBy(*series_cols).orderBy(
        *[F.col(c) for c in (ts_col, *order_cols)]
    )
    return (
        samples.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % n == 0)
        .drop("_rn")
    )
