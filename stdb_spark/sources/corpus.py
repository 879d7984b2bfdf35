"""JSONL corpus source — the interchange format of training-data
pipelines (one JSON object per line; Dolma/C4/RedPajama-style dumps
ship as .jsonl.gz shards).

The reference ingests over RESP/OpenTSDB sockets (protocolparser.h);
a document corpus instead arrives as line-delimited JSON files, so the
"protocol parser" here is Spark's native JSON datasource — JVM-side,
splittable, predicate-pushdown-capable.

Scale rules this module enforces:

- **Schema is ALWAYS explicit.**  ``spark.read.json`` without a schema
  runs a full inference pass over the data first — at 100 TB that is a
  second complete scan before the first real one.  ``read_jsonl``
  refuses to infer.
- **Corrupt lines are quarantined, not fatal.**  PERMISSIVE mode with a
  ``_corrupt_record`` column: a billion-line crawl dump always has a
  few broken records, and failing the job on line 10^9 is not an
  option.  Callers split good/bad with ``is_corrupt``.
- Writing shards: one file per Spark partition, so upstream
  partitioning controls shard size (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema (refusing the
    inference scan).  Corrupt lines land in ``_corrupt_record`` with
    every schema column null instead of failing the read."""
    full = (
        T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
        if keep_corrupt
        else schema
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def is_corrupt(df: DataFrame) -> F.Column:
    return F.col(CORRUPT_COL).isNotNull()


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write one .json file per partition (shard size = upstream
    partitioning; no coalesce-to-1 driver bottleneck)."""
    df.write.mode("overwrite").json(path)
