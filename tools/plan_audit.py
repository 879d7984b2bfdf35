"""Sweep every (batch) registry entry's physical plan for duplicated
expensive expressions — the r7 pathology detector.

Three Catalyst behaviors make an expensive expression silently evaluate
many times per row in this engine (all observed and fixed in r7):

1. Filter pushdown substitutes alias chains into scan-side predicates
   with NO cost guard (the RESP parse carried ~30 copies of the full
   split/replace/zip chain inside a single-task scan Filter).
2. InferFiltersFromGenerate synthesizes size(e) > 0 under explodes and
   pushdown inlines the generator input (excluded engine-wide now).
3. Higher-order functions block whole-stage codegen, so no codegen
   subexpression elimination rescues an expression referenced N times
   in one projection (shingles_col's 8 tokenize copies).

Usage: python tools/plan_audit.py [sf_dir] [threshold]
Prints entries whose plan carries >= threshold copies of any watched
construct (default 8).  Exit 0 always — this is a report, not a gate;
dedup-style plans legitimately repeat md5 across branches.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCHED = (
    "split(",
    "regexp_replace(",
    "regexp_extract",
    "md5(",
    "sentences(",
    "transform(",
    "zip_with(",
    "aggregate(",
    "format_string(",
)

# "aggregate(" must mean the HOF *expression*, not physical operator
# names (HashAggregate(/ObjectHashAggregate(/SortAggregate( appear once
# per aggregation and would inflate every groupBy plan — r7 ADVICE).
# Count it only when not preceded by a letter.
_AGG_EXPR = re.compile(r"(?<![A-Za-z])aggregate\(")


def _count(plan: str, key: str) -> int:
    if key == "aggregate(":
        return len(_AGG_EXPR.findall(plan))
    return plan.count(key)


# An UNPARTITIONED window spec funnels its whole input through one task
# (VERDICT r10 directive #3).  In plan text the partition columns come
# first inside windowspecdefinition(...); if the very first argument
# already carries an ASC/DESC ordering marker there are no partition
# keys.  Every hit must be adjudicated bounded (bucket histograms,
# TakeOrdered top-k pools, post-aggregate dim tables) — sf-proportional
# hits are scale bugs.
_UNPART_WINDOW = re.compile(
    r"windowspecdefinition\([^,()]*#\d+[^,()]* (?:ASC|DESC) NULLS"
)


def _unpartitioned_windows(plan: str) -> int:
    return len(_UNPART_WINDOW.findall(plan))


def main() -> int:
    from stdb_spark.session import get_spark
    from stdb_spark import workloads as w

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    unpart = []
    for name, fn in w.QUERIES.items():
        if name.startswith("stream_"):
            continue  # streaming plans need a started sink
        try:
            plan = (
                fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as exc:  # report, don't die mid-sweep
            print(f"ERR {name}: {str(exc)[:100]}")
            continue
        hot = {k: _count(plan, k) for k in WATCHED if _count(plan, k) >= threshold}
        if hot:
            flagged.append((max(hot.values()), name, hot))
        nw = _unpartitioned_windows(plan)
        if nw:
            unpart.append((name, nw))
    flagged.sort(reverse=True)
    for _, name, hot in flagged:
        print(f"{name:40s} {hot}")
    print(f"{len(flagged)} entries with >= {threshold} copies of a watched construct")
    print(f"{len(unpart)} entries with an unpartitioned window spec:")
    for name, nw in sorted(unpart):
        print(f"  {name:40s} x{nw}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
