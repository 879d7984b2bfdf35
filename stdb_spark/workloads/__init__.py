"""Oracle-checked workload suite.

Each module contributes ``QUERIES`` (name -> fn(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL over the driver's
pre-registered parquet views).  ``__spark_entry__`` re-exports the
merged registries.

Cross-engine determinism rules used throughout (see also
operators/aggregates.py):

- timestamps: DuckDB reads the parquet TIMESTAMP(NANOS) column at µs
  resolution; the Spark side truncates ts to whole microseconds
  (ts div 1000 * 1000) before querying so both engines see identical
  instants; outputs are epoch microseconds (BIGINT).
- float sums: computed through DECIMAL in both engines (exact, order
  independent), cast to DOUBLE at the end.
- single-op float math (sub/mul/div/sqrt of identical operands) is IEEE
  deterministic and needs no special handling.
- hashes: md5 only (Spark xxhash64 has no DuckDB twin).
- every ORDER BY ... LIMIT has a deterministic total order (explicit
  tie-break columns).
"""

from __future__ import annotations

import functools

from stdb_spark import model
from stdb_spark.workloads import docsuite, relsuite, tssuite


def _with_confs(fn):
    """Every registered query applies the engine's runtime confs to the
    injected session FIRST — not just the ones that route through
    model.load_table.  (A streaming replay over an already-cached layout
    reads parquet directly; without this it would run on the bare
    session's 200 shuffle partitions.)"""

    @functools.wraps(fn)
    def inner(spark, sf_dir):
        model.ensure_session_confs(spark)
        return fn(spark, sf_dir)

    return inner


QUERIES = {}
ORACLES = {}
for _m in (tssuite, relsuite, docsuite):
    QUERIES.update({k: _with_confs(v) for k, v in _m.QUERIES.items()})
    ORACLES.update(_m.ORACLES)
