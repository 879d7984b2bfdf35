"""Skew mitigation for shuffle joins.

Aggregations rarely need this — Spark's partial (map-side) aggregation
already collapses hot groupBy keys before the shuffle — but an equi-join
on a skewed key funnels every row of the hot key through one task.  AQE
splits skewed SORT-MERGE partitions at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.get_spark), so reach
for explicit salting only when AQE can't help: shuffled-hash joins,
deliberate bucketing, or a key so hot a single split still spills.

``salted_join`` spreads each left key over ``buckets`` sub-keys with a
DETERMINISTIC salt (md5 of the whole left row — not rand(): retries and
speculative tasks must salt a row identically) and replicates the right
side ``buckets`` times.  Right-side replication costs |right| × buckets,
so this fits the medium-sized-right case; a tiny right side should just
broadcast instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the left side's
    hot keys spread across ``buckets`` salted sub-keys.  Semantically
    identical to ``left.join(right, on, how)`` for row-preserving join
    types (inner / left).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    on = list(on)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets)
    ).cast("int")
    l_salted = left.withColumn("_salt", salt)
    # explode must be the top-level expression (a cast around a
    # generator is rejected); sequence(int, int) already yields ints
    r_rep = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    # the salt only does anything in a SHUFFLE join (it spreads a hot
    # key's rows over `buckets` shuffle partitions); left to its own
    # static estimate Catalyst would broadcast the replicated right
    # side, which silently degrades this into a plain broadcast join
    # carrying x`buckets` build bloat — the one join shape that never
    # had a skew problem.  Pin the shuffle so the function does what it
    # says at every size.
    out = l_salted.join(r_rep.hint("shuffle_hash"), on + ["_salt"], how)
    return out.drop("_salt")


def key_skew_histogram(df: DataFrame, *key_cols: str) -> DataFrame:
    """Key-frequency skew diagnostic — the query you run BEFORE picking
    a join strategy: per-key row counts bucketed by bit length
    (bucket b holds keys with 2^(b-1) <= count < 2^b), reporting how
    many keys and how many rows live at each magnitude plus the largest
    key in the bucket.  A healthy key histogram is bottom-heavy; rows
    concentrating in the top buckets say "salt this join" / "AQE skew
    split territory".

    Bit length (`length(bin(c))`) replaces floor(log2(c)): pure integer
    arithmetic, so the bucketing is exact on every engine (float log2
    of a power of two is libm-dependent).  Two aggregations: the key
    count (the unavoidable exchange) and a ≤64-row histogram."""
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count("*").alias("_c")
    )
    return (
        counts.groupBy(F.length(F.bin("_c")).cast("long").alias("count_bits"))
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("_c").alias("n_rows"),
            F.max("_c").alias("max_key_rows"),
        )
    )
