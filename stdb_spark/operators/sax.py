"""SAX (Symbolic Aggregate approXimation) words per series.

The reference reserves a SAX payload type but ships no encoder
(MutableSample::convert_to_sax_word only rewrites the payload header,
stdb/query/queryprocessor_framework.cc:135-147) — SURVEY §2.5 lists it
as dormant.  This implements the standard Lin/Keogh SAX: split each
series' time-ordered values into ``word_len`` equal-count segments
(PAA), z-normalize the segment means, map each to a symbol by Gaussian
breakpoints, concatenate into a word.  Motif/novelty mining over 100 TB
of series reduces to groupBy on the word column.

Cross-engine exactness (for the DuckDB oracle): segment means use
exact decimal sums with ONE final double division; the mean/std of the
W segment means use ordered left-folds over the segment array, so both
engines evaluate bit-identical IEEE expressions.  std==0 is guarded to
z=0 so constant series get the deterministic middle symbol.

Scale: one shuffle to (series) for row-numbering + one hash-aggregate
per (series, segment) + one per series — linear, skew bounded by the
longest single series, no collect of raw points to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Gaussian equiprobable breakpoints per alphabet size (Lin et al. 2003)
BREAKPOINTS = {
    2: [0.0],
    3: [-0.4307272992954576, 0.4307272992954576],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [-0.8416212335729142, -0.2533471031357997, 0.2533471031357997,
        0.8416212335729142],
    8: [-1.1503493803760079, -0.6744897501960817, -0.3186393639643751,
        0.0, 0.3186393639643751, 0.6744897501960817, 1.1503493803760079],
}
ALPHABET = "abcdefgh"


def sax_words(
    df: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
    word_len: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """(series, n_points, sax_word): one SAX word per series."""
    bps = BREAKPOINTS[alphabet]
    w = Window.partitionBy(series_col).orderBy(ts_col)
    rn = df.select(
        F.col(series_col).alias("series"),
        F.col(value_col).alias("v"),
        (F.row_number().over(w) - 1).alias("_rn"),
        F.count("*").over(Window.partitionBy(series_col)).alias("_n"),
    )
    seg = rn.select(
        "series",
        "_n",
        F.expr(f"(_rn * {word_len}) div _n").alias("_seg"),
        F.col("v").cast("decimal(28,10)").alias("_vd"),
    )
    segmean = seg.groupBy("series", "_seg").agg(
        F.first("_n").alias("_n"),
        (
            F.sum("_vd").cast("string").cast("double") / F.count("*")
        ).alias("_m"),
    )
    arr = segmean.groupBy("series").agg(
        F.first("_n").alias("n_points"),
        F.array_sort(F.collect_list(F.struct("_seg", "_m"))).alias("_sm"),
    )
    means = F.transform("_sm", lambda s: s["_m"])
    k = F.size("_sm").cast("double")
    mu = F.aggregate(means, F.lit(0.0), lambda a, x: a + x) / k
    var = (
        F.aggregate(means, F.lit(0.0), lambda a, x: a + (x - mu) * (x - mu)) / k
    )
    std = F.sqrt(var)
    z = F.transform(
        means,
        lambda x: F.when(std == 0.0, F.lit(0.0)).otherwise((x - mu) / std),
    )

    def symbol(zc):
        expr = F.lit(ALPHABET[len(bps)])
        for i in range(len(bps) - 1, -1, -1):
            expr = F.when(zc < F.lit(bps[i]), F.lit(ALPHABET[i])).otherwise(expr)
        return expr

    word = F.array_join(F.transform(z, symbol), "")
    return arr.select("series", "n_points", word.alias("sax_word"))


def sax_oracle_sql(
    base_select: str, word_len: int = 8, alphabet: int = 4
) -> str:
    """DuckDB SQL computing the same words over ``base_select``, which
    must yield (series, tu, value)."""
    bps = BREAKPOINTS[alphabet]
    sym = f"'{ALPHABET[len(bps)]}'"
    for i in range(len(bps) - 1, -1, -1):
        sym = f"CASE WHEN zz < {bps[i]!r} THEN '{ALPHABET[i]}' ELSE {sym} END"
    return f"""
WITH pts AS (
  {base_select}
), rn AS (
  SELECT series, value AS v,
    row_number() OVER (PARTITION BY series ORDER BY tu) - 1 AS rn,
    count(*) OVER (PARTITION BY series) AS n
  FROM pts
), seg AS (
  SELECT series, n, (rn * {word_len}) // n AS seg,
         CAST(v AS DECIMAL(28,10)) AS vd
  FROM rn
), segmean AS (
  SELECT series, seg, first(n) AS n,
    CAST(CAST(sum(vd) AS VARCHAR) AS DOUBLE) / count(*) AS m
  FROM seg GROUP BY series, seg
), arr AS (
  SELECT series, first(n) AS n_points,
    list_transform(list_sort(list(struct_pack(s := seg, m := m))), p -> p.m)
      AS ms
  FROM segmean GROUP BY series
), stats AS (
  SELECT series, n_points, ms,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ms), (a, x) -> a + x)
      / len(ms) AS mu
  FROM arr
), stats2 AS (
  SELECT series, n_points, ms, mu,
    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(ms, x -> (x - mu) * (x - mu))), (a, x) -> a + x)
        / len(ms)) AS std
  FROM stats
), zs AS (
  SELECT series, n_points,
    list_transform(ms, x -> CASE WHEN std = 0 THEN CAST(0.0 AS DOUBLE)
                                 ELSE (x - mu) / std END) AS z
  FROM stats2
)
SELECT series, CAST(n_points AS BIGINT) AS n_points,
  list_aggregate(list_transform(z, zz -> {sym}), 'string_agg', '') AS sax_word
FROM zs
"""
