"""Static-plan broadcast audit at the big replica: for every registry
entry, build the query plan against the 100x corpus
(tools/gen_scale.py -> .cache/sf10) WITHOUT executing it, and flag any
BroadcastExchange whose build side reads a FACT table.

Why a dedicated sweep: the session raises
spark.sql.autoBroadcastJoinThreshold to 64 MB (right for the
dimension-table joins), but Catalyst's STATIC size estimate for a
derived subtree (post-explode, post-aggregate, post-distinct) is often
a wild under-estimate of the built HashedRelation — and a statically
chosen BroadcastHashJoin is NOT demotable by AQE when it sits on a
non-shuffle path.  The failure is invisible at sf0.1 and an abrupt
driver OOM at scale ("Not enough memory to build and broadcast the
table", first observed on doc_neardup_threshold_curve at the r11 100x
rehearsal).

A chosen broadcast ALWAYS carries a small static estimate (that is why
the planner chose it), so thresholding the estimate can never catch
the failure.  The checkable property is provenance: a broadcast whose
subtree only reads dimension tables (region/nation/part/supplier) or
driver-bounded artifacts (centroid tables, top-k pools) is safe at any
scale; a broadcast whose subtree reads a fact table (documents,
embeddings, lineitem, orders, events, customer, or a corpus-derived
cache) rests on an estimate that scales with the data and must be
adjudicated — either the subtree is bounded by construction (a global
1-row aggregate, a TakeOrdered pool) or the join needs a shuffle pin.
Each flag prints the subtree's fact sources plus whether a bounding
operator (Limit / TakeOrdered / scalar Aggregate) sits above them, so
adjudication is one look per flag.

Usage: python tools/broadcast_audit.py [big_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# streaming replays and write-path entries execute work when CALLED —
# a plan-only audit cannot build them without running the replay; the
# scale story for those is the rehearsal tables in BENCH_NOTES.
SKIP_PREFIXES = ("stream_", "ingest_")


FACT_TABLES = (
    "documents",
    "embeddings",
    "lineitem",
    "orders",
    "events",
    "customer",
)
BOUNDING = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit", "Limit")


# a build side that is a NARROW chain over a base-table scan (filter,
# projection, column-adding Arrow eval — nothing that multiplies or
# collapses row counts) keeps an HONEST size estimate: Catalyst scales
# the scan's file size by column/selectivity ratios, so Spark flips
# the join to shuffle by itself once the table outgrows the threshold,
# at any scale.  The unreliable estimates are the subtrees containing
# row-count-TRANSFORMING ops (Generate/Aggregate/Join/Window/
# Expand/Distinct), where the propagated estimate is fiction.
SCAN_ONLY = {
    "Scan parquet",
    "Scan parquet ",
    "Filter",
    "Project",
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
    "ArrowEvalPython",
    "BatchEvalPython",
}


def _subtree_fact_info(node):
    """(fact sources read, bounding ops, scan_only) of a build side."""
    import re

    text = node.treeString()
    facts = sorted(
        {
            t
            for t in FACT_TABLES
            # parquet locations end in /<table>.parquet (testdata) or
            # /<table> (replica dirs); derived caches embed the table
            # name in the artifact dir
            if re.search(rf"[/_]{t}(\.parquet)?[\],/]", text)
        }
    )
    bounds = sorted({b for b in BOUNDING if b in text})
    # a grouping-free (scalar) HashAggregate is also bounded: keys=[]
    if re.search(r"HashAggregate\(keys=\[\]", text):
        bounds.append("ScalarAggregate")
    names = set()

    def _collect(n):
        names.add(n.nodeName())
        for i in range(n.children().size()):
            _collect(n.children().apply(i))

    _collect(node)
    scan_only = all(
        n in SCAN_ONLY or n.startswith("WholeStageCodegen") for n in names
    )
    transforming = sorted(
        n
        for n in names
        if n not in SCAN_ONLY and not n.startswith("WholeStageCodegen")
    )
    return facts, bounds, scan_only, transforming


def _walk(node, hits, depth=0):
    # pre-preparation sparkPlan has no BroadcastExchange nodes yet —
    # the broadcast choice lives in the join node's buildSide
    name = node.nodeName()
    if "BroadcastHashJoin" in name or "BroadcastNestedLoopJoin" in name:
        side = node.buildSide().toString()
        child = node.children().apply(0 if side == "BuildLeft" else 1)
        est = None
        try:
            link = child.logicalLink()
            if link.isDefined():
                est = int(link.get().stats().sizeInBytes().toString())
        except Exception:
            pass
        facts, bounds, scan_only, transforming = _subtree_fact_info(child)
        hits.append((est, facts, bounds, scan_only, transforming))
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), hits, depth + 1)


def main() -> None:
    os.environ.setdefault("STDB_SPARK_DRIVER_MEM", "24g")
    args = sys.argv[1:]
    big = args[0] if args and os.path.isdir(args[0]) else ".cache/sf10"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not os.path.isdir(big):
        raise SystemExit("run tools/gen_scale.py first")

    from stdb_spark.session import get_spark
    from stdb_spark.workloads import QUERIES

    spark = get_spark("broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = names or [
        n for n in QUERIES if not n.startswith(SKIP_PREFIXES)
    ]
    flagged, errs, n_bcast = [], [], 0
    for name in names:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, big)
            plan = df._jdf.queryExecution().sparkPlan()
        except Exception as e:  # noqa: BLE001 — per-entry isolation
            errs.append((name, str(e).splitlines()[0][:120]))
            continue
        hits = []
        _walk(plan, hits)
        n_bcast += len(hits)
        fact_ones = [
            (est, facts, bounds, so, tr)
            for est, facts, bounds, so, tr in hits
            if facts and not so
        ]
        mark = ""
        if fact_ones:
            flagged.append((name, fact_ones))
            mark = " FLAG " + "; ".join(
                f"[{','.join(facts)}]"
                + (f" bounded-by {','.join(bounds)}" if bounds else " UNBOUNDED")
                + f" via {','.join(tr)}"
                + (f" est~{est / 1e6:.1f}MB" if est is not None else "")
                for est, facts, bounds, _, tr in fact_ones
            )
        print(
            f"{name:36s} {len(hits)} bcast "
            f"({time.perf_counter() - t0:5.2f}s){mark}",
            flush=True,
        )
    print(
        json.dumps(
            {
                "n_entries": len(names),
                "n_broadcasts": n_bcast,
                "flagged": [
                    {
                        "name": n,
                        "subtrees": [
                            {"est": e, "facts": f, "bounds": b, "via": tr}
                            for e, f, b, _, tr in hits
                        ],
                    }
                    for n, hits in flagged
                ],
                "errors": [{"name": n, "err": e} for n, e in errs],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
