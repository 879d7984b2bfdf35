"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``stdb_spark/``; the query registry (one entry
per implemented operator from SURVEY.md §2 plus the LLM-data-pipeline
operators) is assembled in ``stdb_spark.workloads``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: begin-aligned group-aggregate downsample (the engine's
    signature operator) on sf0.001."""
    from stdb_spark.workloads import tssuite

    return tssuite.QUERIES["ts_group_aggregate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stdb_spark import workloads

    return dict(workloads.QUERIES)


def oracle_sql() -> dict[str, str]:
    from stdb_spark import workloads

    return dict(workloads.ORACLES)
