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
    top: int = 10,
) -> DataFrame:
    """Approximate top-``top`` items by a two-phase Misra-Gries sketch
    with ``k`` counters per partition.

    Phase 1 (``mapInPandas``): each partition folds its rows through a
    k-counter MG dict — O(k) memory however many distinct items pass
    by; emits at most k (item, undercount) rows per partition.
    Phase 2: a plain sum-merge of the summaries (undercounts add:
    merged estimate keeps the one-sided guarantee) and a deterministic
    top-``top`` (estimate desc, item asc).

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
    return (
        summaries.groupBy("item")
        .agg(F.sum("est").cast("long").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("item").asc())
        .limit(top)
    )
