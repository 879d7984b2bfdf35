"""stdb_spark — a PySpark-native spatial-temporal analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the obstd/stdb time-series database (reference surveyed in SURVEY.md),
re-expressed on the Spark DataFrame/SQL stack:

- storage        -> Parquet/Delta (time-partitioned narrow fact tables)
- query planner  -> Catalyst (we only build the logical plan)
- merge/order    -> shuffle sort
- join-on-time   -> groupBy(ts).pivot(metric)
- apply pipeline -> window/aggregate expressions (pandas UDF where needed)

Public entry points:
    stdb_spark.session.get_spark()
    stdb_spark.engine.Engine         (JSON query language executor)
    stdb_spark.model                 (narrow schema + table adapters)
    stdb_spark.functions.*           (dedup / similarity / text / multimodal)
"""

__version__ = "0.1.0"
