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
    out = l_salted.join(r_rep, on + ["_salt"], how)
    return out.drop("_salt")
