"""3-run median timings for a query subset — the variance adjudicator.

Driver-vs-local bench drifts (r5 VERDICT "what's wrong" #3) can't be
separated from machine noise with single-shot timings.  This tool runs
each named query N times (after the same warm-up discipline bench.py
uses) and prints per-query min/median/max, so a >1.3x driver drift can
be either reproduced (median moved) or attributed to variance (median
stable, spread wide).

Usage: python tools/bench_medians.py [sf_dir] [runs] [name ...]
Defaults: sf0.1, 3 runs, the r5 top-20 + the four flagged drifters.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    # r5 driver top-10 by cost
    "rel_supplier_pagerank",
    "stream_resp_dictionary_ingest",
    "doc_dedup_cluster_sizes",
    "doc_dedup_clusters",
    "ts_shape_clusters",
    "doc_char_entropy",
    "emb_silhouette",
    "doc_dup_span_scrub",
    "doc_ngram_jaccard_pairs",
    "doc_hamming_near_dups",
    # rest of the r5 top-20
    "doc_ngram_novelty",
    "rel_basket_pairs",
    "doc_neardup_threshold_curve",
    "emb_lsh_recall_eval",
    "doc_hybrid_neardup",
    "doc_simhash",
    "doc_dup_spans",
    "ts_ewma",
    "rel_revenue_rollup",
    # the four >1.3x driver drifts flagged in r5
    "ts_variance_decomposition",
    "ts_staleness_monitor",
    "doc_boilerplate_lines",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = int(args[1]) if len(args) > 1 else 3
    names = args[2:] or DEFAULT

    from stdb_spark.session import get_spark
    from stdb_spark.workloads import QUERIES

    spark = get_spark("stdb-bench-medians")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    out = {}
    for name in names:
        fn = QUERIES[name]
        # warm pass: codegen + write-time artifacts, like bench.py
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED warm ({exc})", file=sys.stderr)
            continue
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "max": max(ts),
            "runs": ts,
        }
        print(
            f"{name}: median={out[name]['median']}s "
            f"(min {out[name]['min']}, max {out[name]['max']})",
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
