"""As-of join: for each left row, the most recent right row at or
before it (optionally within a tolerance).

The reference has no general relational join — its only join is the
exact-timestamp merge-join (stdb/storage/operators/join.h:18-53); SURVEY
§2.3 lists as-of among the joins Spark can expose for free.  This is
the canonical time-series enrichment operator (trades vs quotes,
events vs latest state).

Scale design: NOT a range join (which Spark executes as a broadcast
nested loop or an exploded equi-join).  Instead union both sides and
run one `last(..., ignoreNulls)` window per join key:

    union(left+side=1, right+side=0)
      -> Window.partitionBy(by).orderBy(ts, side)
      -> last(right cols, ignoreNulls) over unbounded-preceding
      -> keep side=1 rows

One shuffle on the join key, linear in |L|+|R|, no pair-space blowup,
and skew is bounded by the per-key row count (same bound any per-key
window has).  Right rows sort before left rows at equal ts, giving
inclusive (right.ts <= left.ts) semantics, matching DuckDB's
`ASOF JOIN ... ON l.ts >= r.ts` oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the most recent right row
    with ``right.on <= left.on`` (ties included) per ``by`` group.

    right_cols: value columns to carry from the right side (default:
    all non-key columns).  The matched right timestamp is exposed as
    ``{on}{suffix}``.  If multiple right rows share (by, on), the whole
    ROW whose value-struct sorts greatest wins (lexicographic over
    right_cols; deterministic and row-atomic — never a column mix of
    two tied rows).
    tolerance: max allowed ``left.on - right.on`` (same unit as the
    column); older matches are nulled out.
    """
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    right_cols = list(right_cols)

    # one row per (by, on) on the right, deterministic across engines.
    # Row-atomic: max_by over the whole value struct — independent
    # per-column max() could stitch values from *different* tied rows.
    if right_cols:
        vstruct = F.struct(*[F.col(c) for c in right_cols])
        r = right.groupBy(*by, on).agg(
            F.max_by(vstruct, vstruct).alias("_r_pick")
        )
        r = r.select(*by, on, *[F.col("_r_pick")[c].alias(c) for c in right_cols])
    else:
        r = right.select(*by, on).distinct()

    lcols = [c for c in left.columns if c not in (*by, on)]
    l_tagged = left.select(
        *by,
        on,
        *lcols,
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(left.schema[on].dataType).alias("_r_ts"),
        F.lit(1).alias("_side"),
    )
    r_tagged = r.select(
        *by,
        on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(on).alias("_r_ts"),
        F.lit(0).alias("_side"),
    )
    u = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by)
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *by,
        on,
        *lcols,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{on}{suffix}"),
        "_side",
    ).filter(F.col("_side") == 1)

    if tolerance is not None:
        stale = F.col(f"{on}{suffix}") < F.col(on) - F.lit(tolerance)
        filled = filled.select(
            *by,
            on,
            *lcols,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")).alias(
                    f"{c}{suffix}"
                )
                for c in right_cols
            ],
            F.when(stale, F.lit(None)).otherwise(F.col(f"{on}{suffix}")).alias(
                f"{on}{suffix}"
            ),
        )
    else:
        filled = filled.drop("_side")
    return filled
