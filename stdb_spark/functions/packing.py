"""Training-batch preparation: reproducible global shuffle and sample
packing.

The last mile of a pretraining data pipeline is not a query — it is
"write the corpus out as shuffled shard files, with documents packed
into fixed token-budget rows".  Both steps are deterministic functions
of content hashes here (same philosophy as functions/sampling.py): a
re-run on different partitioning, a different cluster, or a different
engine produces the identical shard layout, so a training run is
byte-reproducible from the raw corpus.

Scale shape: everything is ONE hash-shuffle on the shard key followed by
a per-shard window — no global sort, no driver state.  Shards are the
parallelism unit (a real pipeline writes one output file per shard), so
skew is bounded by corpus_size / n_shards regardless of document order.
``n_shards`` is therefore the SCALING KNOB, not a constant: size it to
the target file count (corpus_tokens / tokens_per_shard-file), the same
way a 100 TB run picks thousands of shards.  The gate queries pin
n_shards=8 only so the DuckDB oracle can mirror the modulus — the
round-4 sf10 rehearsal's 30x wall-clock on doc_pack_sequences is
exactly the 8-way parallelism ceiling of that fixed oracle setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stdb_spark.functions.sampling import hash_bucket


def _shard_and_rank(key: str, n_shards: int, salt: str):
    """Deterministic (shard, intra-shard order) for a document key.

    The shard draw and the order draw use different salts — with one
    hash, ordering within a shard would follow the same residues that
    chose the shard and the "shuffle" would be subtly non-uniform."""
    h_shard = hash_bucket(F.col(key), f"{salt}/shard")
    h_order = hash_bucket(F.col(key), f"{salt}/order")
    return F.pmod(h_shard, F.lit(n_shards)).cast("int"), h_order


def shuffle_shards(
    df: DataFrame,
    key: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuf0",
) -> DataFrame:
    """Assign every row a (shard, pos) — the reproducible global
    shuffle.  Reading shards 0..n-1 each ordered by pos replays one
    uniform permutation of the corpus; re-runs agree bit-for-bit.
    row_number breaks hash ties by key, so the permutation is total."""
    shard, order = _shard_and_rank(key, n_shards, salt)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(key).asc())
    return (
        df.withColumn("shard", shard)
        .withColumn("_h", order)
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("_h")
    )


DEFAULT_LENGTH_LADDER = (64, 128, 256, 512, 1024, 2048, 4096)


def length_bucket_stats(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    ladder: tuple[int, ...] = DEFAULT_LENGTH_LADDER,
) -> DataFrame:
    """Sequence-length bucketing for batch shaping: assign every
    document to the smallest ladder rung >= its token count (documents
    longer than the top rung are clamped = truncated), and report per
    bucket the doc count, kept tokens, padding waste (rung - length),
    and truncated tokens.  This is the planning query behind
    length-bucketed batching / padding-efficiency dashboards.

    A literal CASE ladder over an integer column: map-side partial
    aggregation into at most ``len(ladder)`` groups — at 100 TB the
    exchange carries ~7 rows per map task.  All sums are BIGINT (exact,
    order-independent)."""
    n = F.col(tokens_col).cast("long")
    chain = F.when(n <= ladder[0], F.lit(ladder[0]))
    for rung in ladder[1:]:
        chain = chain.when(n <= rung, F.lit(rung))
    top = ladder[-1]
    bucket = chain.otherwise(F.lit(top)).cast("long")
    clipped = F.least(n, F.lit(top).cast("long"))
    return (
        df.select(
            bucket.alias("bucket"),
            clipped.alias("_kept"),
            (bucket - clipped).alias("_pad"),
            F.greatest(n - F.lit(top).cast("long"), F.lit(0).cast("long")).alias("_trunc"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_kept").alias("kept_tokens"),
            F.sum("_pad").alias("padding_tokens"),
            F.sum("_trunc").alias("truncated_tokens"),
        )
    )


def pack_concat_chunks(
    df: DataFrame,
    budget: int,
    key: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 8,
    salt: str = "pack0",
) -> DataFrame:
    """Concat-and-chunk sample packing (the GPT-pretraining scheme):
    within each shard, documents are laid out in shuffled order as one
    virtual token stream which is then cut into ``budget``-token bins;
    a document starts in bin ``floor(cum_before / budget)`` at offset
    ``cum_before % budget`` (documents may span bin boundaries — the
    training loader handles the split, this op owns the layout).

    Returns (key, n_tokens, shard, bin_id, offset).  The layout is a
    pure function of (corpus content, budget, n_shards, salt): the
    cumulative sum is over exact BIGINTs in a total deterministic
    order, so any engine reproduces it bit-for-bit."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard, order = _shard_and_rank(key, n_shards, salt)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h").asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    # integer `div`, not floor(double /): a float64 quotient loses exact
    # integers past 2^53 — a per-shard token stream at full corpus scale
    # is within reach of that
    return (
        df.withColumn("shard", shard)
        .withColumn("_h", order)
        .withColumn("_cum", cum_before)
        .withColumn("bin_id", F.expr(f"_cum div {int(budget)}"))
        .withColumn("offset", F.pmod(F.col("_cum"), F.lit(budget)).cast("long"))
        .select(key, tokens_col, "shard", "bin_id", "offset")
    )
