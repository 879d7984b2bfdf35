"""Local replica of the driver's correctness gate: run every
queries() entry at sf0.001 and compare against oracle_sql() via DuckDB —
row count, column names, and exact values after canonical ordering."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


# Queries whose floats involve transcendental functions evaluated by
# each engine's own libm (ln in unigram_logprob), or a wide-decimal →
# double final conversion (ts_integral_daily: the JVM rounds the exact
# DECIMAL(38,10) sum correctly, DuckDB double-rounds via int128→double
# then a scale divide — can differ in the last ulp): no amount of
# decimal-sum discipline fixes either.  For these, compare exactly the
# way the driver's hash does — round(x, 6) — instead of bitwise.
# Everything else stays bit-exact.
LIBM_TOLERANT = {
    "doc_unigram_logprob",
    "ts_integral_daily",
    "doc_bm25_search",
    "doc_hybrid_search",  # carries the same ln()-derived bm25 column
    "doc_char_entropy",  # ln() per bigram
    "ts_periodogram",  # cos/sin per sample
    "ts_variance_decomposition",  # SB terms quantize on a repr-sensitive grid
    "ts_weekend_effect",  # same moment-quotient sensitivity in v1/v2
}


def _values_equal(a, b, tolerant=False) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if tolerant:
            return round(a, 6) == round(b, 6)  # the driver-gate comparison
        return a == b  # exact: the suite is designed for bit parity
    return a == b


@pytest.fixture(scope="module")
def entry_mod():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


@pytest.fixture(scope="module")
def con():
    return _duck(SF_DIR)


def _run_one(spark, con, qfn, sql, tolerant=False):
    got = qfn(spark, SF_DIR).toPandas()
    want = con.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        for i, (x, y) in enumerate(zip(g[col], w[col])):
            xx = None if pd.isna(x) else x
            yy = None if pd.isna(y) else y
            if isinstance(xx, float) or isinstance(yy, float):
                xx = float(xx) if xx is not None else None
                yy = float(yy) if yy is not None else None
            assert _values_equal(xx, yy, tolerant), (
                f"col {col} row {i}: {x!r} != {y!r}"
            )


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def _param_ids():
    import sys

    sys.path.insert(0, "/root/repo")
    from stdb_spark import workloads

    return sorted(workloads.ORACLES)


@pytest.mark.parametrize("name", _param_ids())
def test_oracle_parity(spark, con, entry_mod, name):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    _run_one(spark, con, qs[name], sqls[name], tolerant=name in LIBM_TOLERANT)


def test_rows_only_queries_run(spark, entry_mod):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    for name in set(qs) - set(sqls):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
