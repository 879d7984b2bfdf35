#!/usr/bin/env python
"""Dump .explain("formatted") for the r12-touched queries into
plans/r12/<name>_<label>.txt (label = before|after).

VERDICT r11 directive #8: queries whose result is assembled by a
driver-dispatched kernel (pagerank, triangles) additionally dump the
KERNEL-INPUT plan — the DataFrame feeding repartition(1).mapInPandas —
so exchange counts stay auditable instead of a bare `Scan ExistingRDD`.

Usage: python tools/gen_plans_r12.py <label> [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")

NAMES = [
    "doc_minhash_precision_recall",
    "doc_bpe_train",
    "doc_bpe_fertility",
    "emb_dominant_eigen_portable",
]


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pagerank_kernel_input(spark, sf):
    """The edge list feeding pagerank's single-task kernel — rebuilt
    exactly as relsuite._rel_pagerank builds it."""
    from stdb_spark import model

    t = model.load_tables(spark, sf, ("orders", "lineitem"))
    pairs = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def triangles_kernel_input(spark, sf):
    """The co-purchase edge list feeding the triangle census kernel."""
    from stdb_spark.workloads import relsuite

    return relsuite.copurchase_edges(spark, sf)


KERNEL_INPUTS = {
    "rel_supplier_pagerank": pagerank_kernel_input,
    "rel_part_triangles": triangles_kernel_input,
}


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:] or NAMES
    os.makedirs(OUT, exist_ok=True)

    from stdb_spark.session import get_spark
    from stdb_spark.workloads import QUERIES

    spark = get_spark("stdb-plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name in KERNEL_INPUTS:
            df = KERNEL_INPUTS[name](spark, SF)
            path = os.path.join(OUT, f"{name}_kernel_input_{label}.txt")
        else:
            df = QUERIES[name](spark, SF)
            path = os.path.join(OUT, f"{name}_{label}.txt")
        with open(path, "w") as fh:
            fh.write(fmt(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
