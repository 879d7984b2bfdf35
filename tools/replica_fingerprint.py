#!/usr/bin/env python
"""Order-insensitive row-content fingerprint of a testdata directory —
the FIXTURES.md F8 pin for the .cache/sf1 scale replica.  Parquet FILE
bytes are not reproducible across regenerations (writer metadata, task
ordering); the row CONTENT is (tools/gen_scale.py is seed-free and
deterministic), so the pin hashes md5 over `table:count:sum(row-hash)`
with tables sorted by name.

Usage: python tools/replica_fingerprint.py [dir]   (default .cache/sf1)
"""
import hashlib
import os
import sys

import duckdb

TABLES = sorted(
    ["region", "nation", "customer", "supplier", "part", "orders",
     "lineitem", "events", "documents", "embeddings"]
)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/sf1"
    con = duckdb.connect()
    parts, total = [], 0
    for t in TABLES:
        src = os.path.join(root, f"{t}.parquet")
        if os.path.isdir(src):
            src = os.path.join(src, "*.parquet")
        cnt, h = con.execute(
            f"SELECT count(*), sum(hash(to_json(t)::VARCHAR))"
            f" FROM read_parquet('{src}') t"
        ).fetchone()
        parts.append(f"{t}:{cnt}:{h}")
        total += cnt
    print(hashlib.md5("|".join(parts).encode()).hexdigest(), total)


if __name__ == "__main__":
    main()
