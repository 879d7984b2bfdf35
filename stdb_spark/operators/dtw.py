"""Dynamic-time-warping similarity between series.

The classic elastic distance for comparing time-series shapes that are
locally out of phase (Sakoe & Chiba 1978; the UCR-suite standard) — a
capability class the reference engine lacks entirely (its only
cross-series ops are ts-aligned join/eval, stdb/query/queryparser.cc).

Scale shape: DTW is pairwise-quadratic by nature, so the operator is
built for PROFILES, not raw points — bucket/downsample each series
first (daily totals, M4, PAA), then the per-series profile is a short
array, the pair space is |series|² (block it by label/metric exactly
like the near-dup operators when series are many), and each DTW kernel
is an O(len²·band) DP on a few dozen points inside an Arrow-batched
pandas UDF.  The profiles travel as arrays — ONE collect_list exchange
per side, never a row-level self-join."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_profiles(
    samples: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(series, profile array) with values in ts order — struct-sort
    keeps the (ts, value) pairing row-atomic, so the profile is a pure
    function of content, not partitioning."""
    return (
        samples.groupBy(F.col(series_col).alias("series"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(ts_col, value_col))),
                lambda s: s.getField(value_col).cast("double"),
            ).alias("profile")
        )
    )


def dtw_pairs(
    profiles: DataFrame,
    band: int | None = None,
    key: str = "series",
    vec_col: str = "profile",
) -> DataFrame:
    """All-pairs DTW distances (a < b) over short profiles.  ``band``
    is the Sakoe-Chiba constraint (|i-j| <= band; None = unconstrained).
    Deliberately quadratic in |profiles| — block upstream when series
    are many (the same contract as embedding near-dup's cartesian
    guard)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bnd = band

    @pandas_udf("double")
    def _dtw(a, b):
        out = np.empty(len(a))
        for i in range(len(a)):
            x = np.asarray(a.iloc[i], dtype=np.float64)
            y = np.asarray(b.iloc[i], dtype=np.float64)
            n, m = len(x), len(y)
            if n == 0 or m == 0:
                out[i] = float("nan")
                continue
            r = max(bnd, abs(n - m)) if bnd is not None else max(n, m)
            D = np.full((n + 1, m + 1), np.inf)
            D[0, 0] = 0.0
            for ii in range(1, n + 1):
                lo, hi = max(1, ii - r), min(m, ii + r)
                for jj in range(lo, hi + 1):
                    c = abs(x[ii - 1] - y[jj - 1])
                    D[ii, jj] = c + min(
                        D[ii - 1, jj], D[ii, jj - 1], D[ii - 1, jj - 1]
                    )
            out[i] = D[n, m]
        return pd.Series(out)

    left = profiles.select(
        F.col(key).alias("a"), F.col(vec_col).alias("_pa")
    )
    right = profiles.select(
        F.col(key).alias("b"), F.col(vec_col).alias("_pb")
    )
    return (
        left.join(right, F.col("a") < F.col("b"))
        .select("a", "b", _dtw(F.col("_pa"), F.col("_pb")).alias("dtw"))
    )
