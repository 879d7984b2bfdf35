"""sf10 probe: cached vs Hive-bucketed edge layout for the PageRank
cluster-loop regime (VERDICT r9 directive #6).

Builds the rel_supplier_pagerank edge list from the sf10 scale-up
(~117M doubled edges, ~4M nodes — crosses both size-dispatch
boundaries, so the distributed join loop runs), then measures
pagerank_exact under edge_layout="cache" vs "bucketed", N runs each,
alternating.  Asserts the top-20 (node, pr) rows are bit-identical
across layouts, prints per-layout medians as JSON.

Usage: python tools/pagerank_bucketed_probe.py [runs] [sf_dir]
Heap: exports STDB_SPARK_DRIVER_MEM=24g like tools/scale_rehearsal.py
so the numbers are comparable with the r9 rehearsal's 140.4 s record.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("STDB_SPARK_DRIVER_MEM", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from stdb_spark import model

    t = model.load_tables(spark, sf_dir, ("orders", "lineitem"))
    pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
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


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".cache", "sf10")

    from pyspark.sql import functions as F

    from stdb_spark.operators import graph
    from stdb_spark.session import get_spark

    spark = get_spark("pagerank-bucketed-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def once(layout):
        t0 = time.perf_counter()
        pr = graph.pagerank_exact(build_edges(spark, sf_dir), iterations=5,
                                  edge_layout=layout)
        top = (
            pr.orderBy(F.col("pr").desc(), F.col("node").asc())
            .limit(20)
            .collect()
        )
        dt = round(time.perf_counter() - t0, 1)
        return dt, [(r.node, r.pr) for r in top]

    times = {"cache": [], "bucketed": []}
    tops = {}
    for i in range(runs):
        for layout in ("cache", "bucketed"):
            dt, top = once(layout)
            times[layout].append(dt)
            if layout in tops:
                assert tops[layout] == top, f"{layout} run {i} diverged"
            tops[layout] = top
            print(f"run {i} {layout}: {dt}s", file=sys.stderr, flush=True)
    assert tops["cache"] == tops["bucketed"], "layouts disagree on ranks"
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "runs": runs,
                "heap": os.environ["STDB_SPARK_DRIVER_MEM"],
                "median_cache_s": statistics.median(times["cache"]),
                "median_bucketed_s": statistics.median(times["bucketed"]),
                "runs_cache": times["cache"],
                "runs_bucketed": times["bucketed"],
                "ranks_bit_identical": True,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
