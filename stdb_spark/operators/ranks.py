"""Scale-safe global ranking: two-phase row_number / ntile.

A bare ``Window.orderBy(...)`` (no partition spec) funnels the ENTIRE
input through one task — correct at sf0.1, dead at 100 TB.  These
helpers split the global rank the same way ``behavior.peak_concurrency``
splits its prefix sum:

- phase 1 ranks WITHIN coarse buckets of the leading sort key — fully
  parallel, one hash exchange;
- phase 2 turns per-bucket counts into starting offsets via a
  cumulative window over the #buckets-sized aggregate (histogram scale,
  not row scale), broadcast back.

``offset + local rank`` is exactly the global ``row_number`` of the
requested total order; ``ntile`` then derives arithmetically from the
global rank and the total count using SQL's documented tile-size rule
(first ``n % k`` tiles get ``n div k + 1`` rows, the rest ``n div k``),
so results are bit-identical to the single-window form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: sentinel buckets for NULL sort keys; far outside any real bucket
#: image (floor(price/1000) etc.), still safely inside long range
_NULL_FIRST, _NULL_LAST = -(1 << 62), 1 << 62


def _bucketize(bucket: Column, nulls: str) -> Column:
    """Shared NULL-bucket policy for the two-phase helpers (see
    two_phase_row_number's contract)."""
    bkt = bucket.cast("long")
    if nulls == "first":
        return F.coalesce(bkt, F.lit(_NULL_FIRST))
    if nulls == "last":
        return F.coalesce(bkt, F.lit(_NULL_LAST))
    if nulls == "error":
        # assert_true returns NULL on success, so the when() always
        # takes the first branch — unless a NULL bucket aborts the job
        return F.when(
            F.assert_true(
                bkt.isNotNull(),
                F.lit("two_phase rank: NULL bucket (NULL sort key); pass nulls='first'/'last'"),
            ).isNull(),
            bkt,
        )
    raise ValueError(f"nulls must be first|last|error, got {nulls!r}")


def two_phase_row_number(
    df: DataFrame,
    order_cols: Sequence[Column],
    bucket: Column,
    out_col: str = "rn",
    nulls: str = "error",
) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` without a
    single-partition window.

    ``order_cols`` must define a deterministic total order (explicit
    tie-breaks).  ``bucket`` must be a monotone NON-DECREASING function
    of the order prefix — e.g. ``floor(price/1000)`` for an ascending
    price order, ``-count`` for a descending count order — so that
    bucket order equals global order between buckets.

    ``nulls`` says where a NULL bucket (i.e. NULL sort key) ranks:
    ``"first"``/``"last"`` route those rows into a sentinel bucket at
    the matching end — pick the one your window form would use (Spark
    default: NULLS FIRST for asc, NULLS LAST for desc) — while
    ``"error"`` (default) fails the job instead of silently dropping
    them through the null-unsafe histogram join (ADVICE r4 #2).
    """
    d = df.withColumn("_tpr_bkt", _bucketize(bucket, nulls))
    w_in = Window.partitionBy("_tpr_bkt").orderBy(*order_cols)
    per = d.groupBy("_tpr_bkt").agg(F.count("*").alias("_tpr_c"))
    # cumulative offsets over the bucket histogram: #buckets rows,
    # bounded by the key range, not the data volume
    w_off = Window.orderBy("_tpr_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per.withColumn(
        "_tpr_off", F.coalesce(F.sum("_tpr_c").over(w_off), F.lit(0)).cast("long")
    ).select("_tpr_bkt", "_tpr_off")
    return (
        d.withColumn("_tpr_r", F.row_number().over(w_in).cast("long"))
        .join(F.broadcast(offs), "_tpr_bkt")
        .withColumn(out_col, F.col("_tpr_off") + F.col("_tpr_r"))
        .drop("_tpr_bkt", "_tpr_off", "_tpr_r")
    )


def two_phase_cumsum(
    df: DataFrame,
    value: Column,
    order_cols: Sequence[Column],
    bucket: Column,
    out_col: str = "cum",
    nulls: str = "error",
) -> DataFrame:
    """Global running sum of ``value`` (inclusive of the current row)
    over ``order_cols`` — the two-phase split of
    ``SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` — with no
    single-partition window over the data (VERDICT r10 directive #3).

    Same ``bucket``/``nulls`` contract as :func:`two_phase_row_number`.
    Phase 1 computes the running sum WITHIN each bucket (parallel, one
    hash exchange); phase 2 turns per-bucket totals into starting
    offsets via a cumulative window over the #buckets-sized histogram
    and broadcasts them back; ``offset + local prefix`` equals the
    global prefix sum.  Pass an EXACT-typed ``value`` (decimal/long):
    exact addition is associative, so the split is bit-identical to
    the single-window form (float values would re-associate)."""
    d = df.withColumn("_tpc_bkt", _bucketize(bucket, nulls)).withColumn(
        "_tpc_v", value
    )
    w_in = (
        Window.partitionBy("_tpc_bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per = d.groupBy("_tpc_bkt").agg(F.sum("_tpc_v").alias("_tpc_s"))
    # bucket-histogram offsets: #buckets rows, bounded by the key
    # range (e.g. log2 magnitude bands), not the data volume
    w_off = Window.orderBy("_tpc_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per.withColumn(
        "_tpc_off", F.sum("_tpc_s").over(w_off)
    ).select("_tpc_bkt", "_tpc_off")
    return (
        d.withColumn("_tpc_c", F.sum("_tpc_v").over(w_in))
        .join(F.broadcast(offs), "_tpc_bkt")
        .withColumn(
            out_col,
            F.coalesce(F.col("_tpc_off") + F.col("_tpc_c"), F.col("_tpc_c")),
        )
        .drop("_tpc_bkt", "_tpc_v", "_tpc_off", "_tpc_c")
    )


def two_phase_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: Sequence[Column],
    bucket: Column,
    out_col: str = "tile",
    nulls: str = "error",
    total_count: int | None = None,
) -> DataFrame:
    """Global ``ntile(n_tiles)`` over ``order_cols`` (same contract as
    :func:`two_phase_row_number`) computed from the two-phase rank and
    the total count — no single-partition window anywhere.

    The total-count aggregate re-evaluates the input lineage once (a
    map-side count, the cheapest possible pass); callers stacking
    several ntiles on an expensive input should cache/checkpoint it
    first if that pass matters, and may pass the row count they already
    know as ``total_count`` so the stacked calls share ONE count job
    instead of each re-deriving it (r11: rel_rfm_segments ran the
    count three times over progressively deeper ntile lineage)."""
    n = int(n_tiles)
    if n <= 0:
        raise ValueError("n_tiles must be positive")
    ranked = two_phase_row_number(
        df, order_cols, bucket, out_col="_tpn_rank", nulls=nulls
    )
    if total_count is not None:
        total = df.sparkSession.range(1).select(
            F.lit(int(total_count)).cast("long").alias("_tpn_n")
        )
    else:
        total = df.agg(F.count("*").cast("long").alias("_tpn_n"))
    # SQL ntile: with N rows and k tiles, tiles 1..(N%k) hold
    # (N div k)+1 rows, the rest hold N div k.
    tile = F.expr(
        f"CASE WHEN _tpn_rank <= (_tpn_n div {n} + 1) * (_tpn_n % {n}) "
        f"THEN (_tpn_rank - 1) div (_tpn_n div {n} + 1) + 1 "
        f"ELSE (_tpn_n % {n}) "
        f"  + (_tpn_rank - 1 - (_tpn_n div {n} + 1) * (_tpn_n % {n})) "
        f"    div (_tpn_n div {n}) + 1 END"
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, tile.cast("int"))
        .drop("_tpn_rank", "_tpn_n")
    )


def top_k_ranked(
    df: DataFrame,
    order_cols: Sequence[Column],
    k: int,
    out_col: str = "rk",
) -> DataFrame:
    """Top-k rows by ``order_cols`` with a 1-based rank column.

    ``orderBy().limit(k)`` plans as TakeOrderedAndProject (per-partition
    top-k heaps merged on the driver — no global sort, no shuffle), and
    only the k survivors see a window, so the unpartitioned rank is
    over a provably bounded input.
    """
    top = df.orderBy(*order_cols).limit(int(k))
    w = Window.orderBy(*order_cols)
    return top.withColumn(out_col, F.row_number().over(w).cast("int"))
