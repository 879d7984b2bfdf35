"""Bucketed (hash-clustered) tables: shuffle-free co-located joins.

The reference co-locates a series' data by construction (each series
lives in its own NB+tree, stdb/storage/nbtree.h) — joins and
aggregations over one series never move data.  The Spark analog for
FACT-to-FACT joins is Hive-style bucketing: both tables are written
pre-hash-clustered on the join key into the same bucket count, so a
subsequent equi-join matches bucket files pairwise and the plan carries
NO Exchange on either side — at 100 TB that deletes the single largest
shuffle in the workload (fact-fact joins move both tables otherwise).

Bucketing complements the layouts in ``sources/storage.py``:
storage.write_samples partitions by (day, metric) for PRUNING; this
module clusters by join key for CO-LOCATION.  Both are write-time
choices that trade one ingest-side sort/cluster pass for every
downstream join/aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table.  ``sort_cols``
    default to the bucket key — sorted buckets additionally let the
    join run as a zero-sort merge join and give row-group min/max
    pruning on the key."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(int(n_buckets), bucket_col)
        .sortBy(*(sort_cols or (bucket_col,)))
        .saveAsTable(table)
    )


def ensure_bucketed(
    spark: SparkSession,
    table: str,
    build: "callable",
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Idempotent accessor: build + persist the bucketed table on first
    use (ingest-side ETL, exactly like the partitioned layout and the
    presigned-LSH artifacts), read it back afterwards.

    Bucket metadata lives in the session catalog; with the default
    in-memory catalog a NEW session forgets the table while its
    warehouse directory persists on disk.  Reading the bare directory
    would silently lose the bucketing (and the shuffle-free join), so a
    stale location is removed and the table rebuilt instead."""
    if not spark.catalog.tableExists(table):
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
        if wh:
            import os

            stale = os.path.join(wh, table.lower())
            if os.path.isdir(stale):
                shutil.rmtree(stale, ignore_errors=True)
        write_bucketed(build(), table, bucket_col, n_buckets, sort_cols)
    return spark.table(table)
