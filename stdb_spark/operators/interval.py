"""Interval join: match point rows to the interval rows containing
them (point-in-range enrichment — promo windows, maintenance windows,
session attribution).

The reference has no join beyond the exact-timestamp merge-join
(stdb/storage/operators/join.h:18-53); SURVEY §2.3 lists interval
joins among the joins Spark can expose.  A naive formulation
(`p.ts BETWEEN i.begin AND i.end` with no equi-key) degenerates to a
broadcast-nested-loop in Spark — quadratic and undistributable.

Scale design — bucketize into an equi-join:
  - pick a bucket width W (~ the typical interval length);
  - each interval explodes to its covering buckets
    sequence(floor(begin/W), floor((end-1)/W)) — O(len/W) rows;
  - each point maps to its single bucket floor(ts/W);
  - equi-join on (by..., bucket), then refine begin <= ts < end.
A point lives in exactly one bucket, so no dedup pass is needed; the
join is a plain shuffled hash join on uniform keys that AQE can
re-plan, and both sides prune by bucket range.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    begin: str = "begin",
    end: str = "end",
    by: Sequence[str] = (),
    bucket_width: int = 86_400_000_000,
) -> DataFrame:
    """Inner join of points to the half-open intervals [begin, end)
    that contain them, equi-keyed by ``by`` columns + time bucket.
    Returns all point columns + all interval columns (minus shared
    ``by``).  A point inside k overlapping intervals yields k rows.
    """
    by = list(by)
    # integer `div`, never float division: ns epochs exceed 2^53, where
    # double rounding can misbucket a boundary point and silently drop
    # a contained pair from the equi-join (repo rule, behavior.py)
    wd = int(bucket_width)
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.expr(f"{begin} div {wd}L"),
                F.expr(f"({end} - 1) div {wd}L"),
            )
        ),
    )
    pt = points.withColumn("_bk", F.expr(f"{ts} div {wd}L"))
    icols = [c for c in intervals.columns if c not in by]
    out = (
        pt.join(iv, [*by, "_bk"])
        .filter((F.col(ts) >= F.col(begin)) & (F.col(ts) < F.col(end)))
        .drop("_bk")
    )
    return out.select(*points.columns, *icols)
