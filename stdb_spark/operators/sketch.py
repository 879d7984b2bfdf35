"""Mergeable frequency sketches.

The reference's heavy-hitter node IS a bounded-memory sketch
(SpaceSaver, stdb/query/query_processing/spacesaver.h:11-150); the
engine's default `frequent-items`/`heavy-hitters` queries answer it
EXACTLY with a hash aggregate, which is the right call whenever the
distinct-item count fits a shuffle.  This module is the parity path for
when it does not: per-partition Misra-Gries summaries (bounded k
counters regardless of cardinality) merged map-side — the classic
mergeable-summaries construction (Agarwal et al., PODS'12), same
guarantee family as the reference's SpaceSaver:

    true_count - n/(k+1)  <=  estimate  <=  true_count

and every item with frequency > n/(k+1) is guaranteed present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_topk(
    df: DataFrame,
    item_col: str,
    k: int = 16,
    top: int | None = 10,
) -> DataFrame:
    """Approximate top-``top`` items by a two-phase Misra-Gries sketch
    with ``k`` counters per partition.

    Phase 1 (``mapInPandas``): each partition folds its rows through a
    k-counter MG dict — O(k) memory however many distinct items pass
    by; emits at most k (item, undercount) rows per partition.
    Phase 2: a plain sum-merge of the summaries (undercounts add:
    merged estimate keeps the one-sided guarantee) and a deterministic
    top-``top`` (estimate desc, item asc).  ``top=None`` skips the
    truncation and returns the full merged summary.

    The shuffle carries at most k rows per partition — this is the
    operator to reach for when the exact groupBy's distinct-item
    exchange itself is the bottleneck (e.g. top URLs over 100 TB of
    raw logs)."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for item in pdf[item_col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est": list(counters.values())}
            )

    item_type = dict(df.dtypes)[item_col]
    summaries = df.select(F.col(item_col)).mapInPandas(
        summarize, schema=f"item {item_type}, est long"
    )
    merged = summaries.groupBy("item").agg(
        F.sum("est").cast("long").alias("est_count")
    )
    if top is None:
        # full merged summary (<= k rows per input partition before the
        # merge, <= k * n_partitions after): the verdict-oracle gate
        # checks MG's guarantees over ALL surviving counters, not just
        # the displayed top slice
        return merged
    return merged.orderBy(
        F.col("est_count").desc(), F.col("item").asc()
    ).limit(top)


# ------------------------------------------------ portable HLL registers
# Deterministic-by-spec HyperLogLog whose register states and estimate
# reproduce bit-for-bit in ANY engine (the ts_distinct_users_hll_portable
# pattern, generalized): md5-derived 60-bit hash, m registers
# (bucket = h % m, rank = (60 - log2(m)) + 1 - bitlength(h // m), merge
# = integer MAX), harmonic sum as EXACT integer 2^(60-r) adds, estimate
# = one double division K / S with K precomputed in python, and the
# small-range (linear-counting) correction served from a python-
# precomputed integer lookup so no libm enters either engine's output
# path.  Register tables are ordinary (group..., b, r) rows — the
# mergeable "sketch column" a 100 TB rollup materializes once per day
# and unions for any coarser period.
import math as _math

# Version tag for the register derivation above (hash function, hash
# width, bucket/rank split).  Any MATERIALIZED register artifact must
# carry this tag AND the m used in its name so a spec change can never
# satisfy a cache built under the old derivation (r7 ADVICE).  Bump on
# any change to hll_registers' hash or rank math.
HLL_SPEC = "md5r60v1"


def hll_alpha_k(m: int) -> float:
    """alpha_m * m^2 * 2^60 — the integer-scaled estimate numerator."""
    return 0.7213 / (1.0 + 1.079 / m) * (m * m) * float(2**60)


def hll_lc_table(m: int) -> list[int]:
    """Linear-counting lookup: floor(m * ln(m / v)) for v in 1..m-1."""
    return [int(_math.floor(m * _math.log(m / v))) for v in range(1, m)]


def hll_registers(
    df: DataFrame, item_col: str, group_cols: list[str], m: int = 4096
) -> DataFrame:
    """Sparse register table (group..., b, r): one row per non-empty
    register, r = max rank observed.  m must be a power of two."""
    assert m & (m - 1) == 0, "m must be a power of two"
    wbits = 60 - m.bit_length() + 1  # 60 - log2(m)
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = df.select(
        *group_cols, (h % m).alias("b"), F.shiftright(h, m.bit_length() - 1).alias("w")
    ).withColumn(
        "r",
        F.when(
            F.col("w") > 0, F.lit(wbits + 1) - F.length(F.expr("bin(w)"))
        ).otherwise(F.lit(wbits + 1)),
    )
    return d.groupBy(*group_cols, "b").agg(F.max("r").alias("r"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str], m: int = 4096
) -> DataFrame:
    """Merge register rows by MAX and emit (group..., distinct_est):
    raw = floor(K / S) with S the exact integer harmonic sum; when the
    raw estimate is small (<= 2.5 m) and empty registers remain, the
    linear-counting lookup replaces it (classic HLL correction)."""
    merged = registers.groupBy(*group_cols, "b").agg(F.max("r").alias("r"))
    agg = merged.groupBy(*group_cols).agg(
        F.sum(F.expr("CAST(shiftleft(1L, 60 - r) AS DECIMAL(38,0))")).alias("_sp"),
        F.count("*").alias("_present"),
    )
    s_total = F.expr(
        f"_sp + CAST({m} - _present AS DECIMAL(38,0))"
        f" * CAST({2**60} AS DECIMAL(38,0))"
    )
    raw = F.floor(F.lit(hll_alpha_k(m)) / s_total.cast("double")).cast("long")
    v = (F.lit(m) - F.col("_present")).cast("long")
    spark = registers.sparkSession
    lc = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(hll_lc_table(m))], "v long, _lc long"
    )
    est = agg.select(*group_cols, raw.alias("_raw"), v.alias("v"))
    est = est.join(F.broadcast(lc), "v", "left")
    out = est.select(
        *group_cols,
        F.when(
            (F.col("v") > 0) & (F.col("_raw") <= int(2.5 * m)), F.col("_lc")
        )
        .otherwise(F.col("_raw"))
        .alias("distinct_est"),
    )
    return out


def hll_oracle_sql(
    item_sql: str,
    group_sql: list[str],
    source_sql: str,
    m: int = 4096,
    day_sql: str | None = None,
    out_col: str = "distinct_est",
) -> str:
    """DuckDB twin of hll_registers + hll_estimate over ``source_sql``.
    ``item_sql`` is the hashed expression (VARCHAR), ``group_sql`` the
    group columns; with ``day_sql`` the registers fold through a daily
    level first (associative MAX — same merged state by construction)
    and an n_days column is emitted.  ``out_col`` names the estimate
    column directly (r7 ADVICE: callers used to rename via a whole-SQL
    string replace, which silently rewrote any other occurrence of the
    substring)."""
    wbits = 60 - m.bit_length() + 1
    g = ", ".join(group_sql)
    lc_vals = ", ".join(str(x) for x in hll_lc_table(m))
    day_sel = f", {day_sql} AS _day" if day_sql else ""
    day_grp = ", _day" if day_sql else ""
    days_cte = (
        f", days AS (SELECT {g}, CAST(count(DISTINCT _day) AS BIGINT)"
        f" AS n_days FROM daily GROUP BY ALL)"
        if day_sql
        else ""
    )
    days_join = f" JOIN days USING ({g})" if day_sql else ""
    days_col = ", n_days" if day_sql else ""
    return f"""
WITH src AS (
  SELECT {g}{day_sel},
         ('0x' || substr(md5({item_sql}), 1, 15))::BIGINT AS h
  FROM {source_sql}
),
rk AS (
  SELECT {g}{day_grp}, h % {m} AS b,
         CASE WHEN h // {m} > 0
              THEN {wbits + 1} - length(bin(h // {m}))
              ELSE {wbits + 1} END AS r
  FROM src
),
daily AS (SELECT {g}{day_grp}, b, max(r) AS r FROM rk GROUP BY ALL),
merged AS (SELECT {g}, b, max(r) AS r FROM daily GROUP BY ALL)
{days_cte},
agg AS (
  SELECT {g},
         SUM(CAST(1 AS BIGINT) << (60 - r)) AS _sp,
         count(*) AS _present
  FROM merged GROUP BY ALL
),
est AS (
  SELECT {g},
    CAST(floor({hll_alpha_k(m)!r} /
      CAST(_sp + ({m} - _present) * (CAST(1 AS HUGEINT) << 60) AS DOUBLE)
    ) AS BIGINT) AS raw,
    CAST({m} - _present AS BIGINT) AS v
  FROM agg
)
SELECT {g},
  CAST(CASE WHEN v > 0 AND raw <= {int(2.5 * m)}
       THEN ([{lc_vals}])[v]
       ELSE raw END AS BIGINT) AS {out_col}{days_col}
FROM est{days_join}
"""


# ------------------------------------------------ portable Count-Min
# Deterministic-by-spec Count-Min sketch (Cormode & Muthukrishnan '05):
# d independent md5-derived row hashes into w buckets, counters merge
# by plain addition (the mergeable counter table a 100 TB rollup
# materializes per day), estimate = min over the d counters — a
# one-sided overestimate with error <= n/w per row.  Unlike the
# Misra-Gries fold (order-dependent counter state, see QUERIES.md
# rationale), every piece is a hash aggregate, so the whole sketch AND
# its estimates reproduce bit-for-bit in SQL.


def cms_bucket_expr(item: "F.Column", row: int, w: int) -> "F.Column":
    """Bucket of ``item`` in sketch row ``row``: md5-derived 60-bit
    hash with a per-row salt, modulo w.
    DuckDB: ('0x' || substr(md5('r<row>:' || x), 1, 15))::BIGINT % w."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"r{row}:"), item)), 1, 15), 16, 10
    ).cast("long")
    return h % w


def cms_counters(
    df: DataFrame, item_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """(d, b, c): the d x w counter grid as sparse rows — ONE exchange
    of (row, bucket) partial counts (each input row contributes to d
    cells via a map-side explode; the shuffle carries at most d*w rows
    per partition after partial aggregation)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("d"),
                    cms_bucket_expr(F.col(item_col), r, w).alias("b"),
                )
                for r in range(d)
            ]
        )
    )
    return (
        df.select(cells.alias("_c"))
        .select(F.col("_c.d").alias("d"), F.col("_c.b").alias("b"))
        .groupBy("d", "b")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    counters: DataFrame, items: DataFrame, item_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """(item, cm_est): min over the d counters addressed by the item's
    row hashes.  ``counters`` is broadcast (<= d*w rows by
    construction), so estimating any candidate set is map-side.

    The probe is a LEFT join with missing cells coalesced to 0 (r7
    ADVICE): a candidate that never appeared in the counted stream hits
    counters that were never incremented — the sketch's answer for
    those cells is 0, not "drop the probe" — so arbitrary candidate
    sets estimate 0 instead of vanishing or min-ing over a subset of
    rows.  For observed items every addressed cell exists and the
    result is unchanged."""
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("d"),
                        cms_bucket_expr(F.col(item_col), r, w).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("_p"),
    ).select(item_col, F.col("_p.d").alias("d"), F.col("_p.b").alias("b"))
    return (
        probes.join(F.broadcast(counters), ["d", "b"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0)).cast("long")).alias("cm_est"))
    )


def cms_oracle_ctes(item_sql: str, source_sql: str, d: int = 4, w: int = 512) -> str:
    """DuckDB twin: CTEs `cms(d, b, c)` and `cand(item)` over
    ``source_sql`` (one row per occurrence; ``item_sql`` names the item
    expression)."""
    cells = " UNION ALL ".join(
        f"SELECT {r} AS d, ('0x' || substr(md5('r{r}:' || item), 1, 15))::BIGINT"
        f" % {w} AS b FROM src"
        for r in range(d)
    )
    return f"""src AS MATERIALIZED (SELECT {item_sql} AS item FROM {source_sql}),
cms AS MATERIALIZED (SELECT d, b, count(*) AS c FROM ({cells}) GROUP BY d, b),
cand AS MATERIALIZED (SELECT DISTINCT item FROM src)"""
