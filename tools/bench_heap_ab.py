"""Heap A/B adjudicator for the r9 suite-wide driver-bench drift
(VERDICT r9 directive #2).

Runs the FULL bench.py as a fresh subprocess — the driver's exact shape:
one cold JVM, warm passes, then the 249-query measured sweep — N times
per heap setting (STDB_SPARK_DRIVER_MEM=8g vs 12g), alternating A/B/A/B
so slow box-level drift cancels.  Per-query medians for the 15 worst
r8->r9 drifters plus the full-suite total are printed as the
BENCH_NOTES table; each run's per-query detail JSON is a scratch
artifact written to /tmp/bench_heap_<tag>.json (never BENCH_DETAIL.json,
which is the driver's record).

Usage: python tools/bench_heap_ab.py [runs_per_heap] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the 15 worst r8->r9 driver drifters (VERDICT r9 directive #2)
DRIFTERS = [
    "sp_quadkey_rollup",
    "doc_minhash_bbit",
    "ts_event_transitions",
    "ts_retention_matrix",
    "rel_q16_parts_supplier_relationship",
    "doc_chunk_windows",
    "rel_q2_min_cost_supplier",
    "emb_binary_recall_eval",
    "rel_benford_price_audit",
    "ts_lttb",
    "doc_bloom_incremental_dedup",
    "ts_event_funnel",
    "mm_thumbnail_stats",
    "doc_dup_span_scrub",
    "emb_truncated_dim_recall",
]


def run_once(heap: str, tag: str, sf_dir: str) -> dict:
    # per-run detail JSONs are scratch artifacts and live in /tmp on
    # purpose; only the aggregated medians table goes to stdout for
    # BENCH_NOTES
    detail = f"/tmp/bench_heap_{tag}.json"
    env = dict(
        os.environ,
        STDB_SPARK_DRIVER_MEM=heap,
        STDB_SPARK_BENCH_DETAIL=detail,
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        check=True,
    )
    with open(detail) as fh:
        return json.load(fh)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    records: dict[str, list[dict]] = {"8g": [], "12g": []}
    for i in range(runs):
        for heap in ("8g", "12g"):  # alternate so box drift cancels
            rec = run_once(heap, f"{heap}_{i}", sf_dir)
            records[heap].append(rec)
            print(
                f"run {i} heap={heap}: total={rec['value']}s "
                f"failed={len(rec.get('failed', []))}",
                file=sys.stderr,
                flush=True,
            )

    out: dict = {"runs_per_heap": runs, "sf_dir": sf_dir, "queries": {}}
    names = sorted(
        set(DRIFTERS) & set(records["8g"][0]["queries"])
    ) or sorted(records["8g"][0]["queries"])
    for heap in ("8g", "12g"):
        out[f"total_median_{heap}"] = round(
            statistics.median(r["value"] for r in records[heap]), 1
        )
    for n in names:
        row = {}
        for heap in ("8g", "12g"):
            vals = [r["queries"].get(n) for r in records[heap]]
            vals = [v for v in vals if v is not None]
            row[heap] = round(statistics.median(vals), 3) if vals else None
        if row["8g"] and row["12g"]:
            row["ratio_12g_over_8g"] = round(row["12g"] / row["8g"], 2)
        out["queries"][n] = row
    missing = sorted(set(DRIFTERS) - set(records["8g"][0]["queries"]))
    if missing:
        out["not_in_headline"] = missing
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
