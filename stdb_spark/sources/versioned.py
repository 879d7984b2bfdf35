"""Versioned table storage with time travel — a minimal commit log
over parquet snapshots.

The reference's durability story is WAL + volumes + recovery
(stdb/storage/volume.cc, input log replay); the lakehouse analog this
package ships instead is immutable parquet + a tiny manifest head, the
same commit-protocol shape as Delta's ``_delta_log``:

    <root>/v=<k>/part-*.parquet    immutable data files of version k
    <root>/_manifest.json          {"current": k, "versions": [...]}

A writer stages the new version directory COMPLETELY, then atomically
replaces the manifest (``os.replace``, fsync'd) as the last step — a
concurrent reader resolves the manifest once and reads either the old
snapshot or the new one, never a torn mix.  Readers pin a version at
resolve time, so long queries are snapshot-isolated across concurrent
COMMITS; vacuum, however, deletes dropped versions' data immediately
after trimming the manifest, so a reader pinned to a version outside
``keep_last`` can fail mid-scan — run vacuum with a retention horizon
longer than your slowest reader, exactly as lakehouse vacuums do.

Versions here are full snapshots: the package's delta/merge path is
``storage.upsert_latest`` (merge-on-read) — compose the two by
committing the collapsed result of an upsert as the next version.
At 100 TB a snapshot commit is still one parallel parquet write of the
changed table, and time travel costs nothing at read time (the as-of
resolve touches one JSON head, then scans exactly one version's
files — no log replay).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class VersionNotFound(LookupError):
    pass


class CorruptManifest(RuntimeError):
    pass


class ConcurrentWrite(RuntimeError):
    pass


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_manifest.json")


def _read_head(root: str) -> dict:
    """Parse the manifest head; missing file -> empty head (the caller
    decides whether that is acceptable), unparseable -> raise."""
    p = _manifest_path(root)
    if not os.path.exists(p):
        return {"current": 0, "versions": []}
    with open(p) as f:
        raw = f.read()
    try:
        return json.loads(raw)
    except ValueError as exc:
        raise CorruptManifest(
            f"unparseable manifest at {p!r}: {exc}"
        ) from exc


def _read_manifest(root: str) -> dict:
    """A missing manifest is an empty table ONLY when no version data
    exists yet; a manifest that is missing or unparseable next to
    existing ``v=*`` directories raises instead of silently resetting
    history (a reset head would let the next commit overwrite v=1 —
    the dirs may also be a crashed first commit's orphans, which the
    caller resolves by clearing the table root)."""
    p = _manifest_path(root)
    if not os.path.exists(p):
        if os.path.isdir(root) and any(
            e.startswith("v=") for e in os.listdir(root)
        ):
            raise CorruptManifest(
                f"{root} has version data but no readable manifest head"
            )
        return {"current": 0, "versions": []}
    return _read_head(root)


def _commit_manifest(root: str, manifest: dict) -> None:
    """Atomic durable head swap: stage to a temp file in the same
    directory, fsync its data, ``os.replace`` (POSIX-atomic) onto the
    manifest path, then fsync the directory so the rename itself is
    durable before the commit is reported."""
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(root))
    dfd = os.open(root, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def write_version(df: DataFrame, root: str, note: str = "") -> int:
    """Commit ``df`` as the next version of the table at ``root``.
    Returns the committed version number (1-based).  The data write
    completes before the manifest moves, so a crash mid-write leaves an
    orphan ``v=<k>`` directory (re-written by the retried commit) and
    an intact previous head.

    Single-writer protocol: the staged version directory is claimed
    with an exclusive ``mkdir`` and the head is re-read immediately
    before the swap — a racing committer that claimed the same number
    or already advanced the head raises :class:`ConcurrentWrite`
    instead of silently clobbering data (Delta detects the same
    conflict via create-if-absent of the next log entry; serialize
    writers externally to avoid the abort)."""
    os.makedirs(root, exist_ok=True)
    m = _read_manifest(root)
    v = int(m["current"]) + 1
    vdir = os.path.join(root, f"v={v}")
    try:
        os.mkdir(vdir)  # exclusive claim of this version number
    except FileExistsError:
        raise ConcurrentWrite(
            f"v={v} directory already exists at {root}: either another "
            "writer is staging it, or a crashed commit left an orphan — "
            "remove the directory (or clear the table root) to retry"
        ) from None
    df.write.mode("overwrite").parquet(vdir)
    n_rows = df.sparkSession.read.parquet(vdir).count()
    # relaxed head re-read: OUR staged v-dir would trip the strict
    # missing-manifest heuristic on a first commit
    head = _read_head(root)
    if int(head["current"]) != v - 1:
        raise ConcurrentWrite(
            f"head moved to {head['current']} while staging v={v} at {root}"
        )
    head["versions"].append(
        {"v": v, "n_rows": int(n_rows), "note": note, "ts": time.time()}
    )
    head["current"] = v
    _commit_manifest(root, head)
    return v


def versions(root: str) -> list[dict]:
    return list(_read_manifest(root)["versions"])


def read_version(
    spark: SparkSession, root: str, as_of: int | None = None
) -> DataFrame:
    """Snapshot read: latest version, or time travel to ``as_of``."""
    m = _read_manifest(root)
    v = int(m["current"]) if as_of is None else int(as_of)
    live = {e["v"] for e in m["versions"]}
    if v not in live:
        raise VersionNotFound(
            f"version {v} not in table at {root} (have {sorted(live)})"
        )
    return spark.read.parquet(os.path.join(root, f"v={v}"))


def vacuum(
    root: str, keep_last: int = 2, older_than_s: float | None = None
) -> list[int]:
    """Drop all but the newest ``keep_last`` versions: manifest first
    (so no NEW reader can resolve a version about to disappear), then
    the data directories.  Deletion is immediate for the versions it
    drops — an already-pinned reader of a dropped version fails
    mid-scan — so pass ``older_than_s`` as the retention horizon
    (lakehouse-vacuum style): versions committed within the last
    ``older_than_s`` seconds are retained even beyond ``keep_last``,
    which protects any reader that resolved its snapshot within the
    horizon.  Returns the dropped version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    m = _read_manifest(root)
    keep = set(sorted((e["v"] for e in m["versions"]))[-keep_last:])
    if older_than_s is not None:
        horizon = time.time() - float(older_than_s)
        keep |= {e["v"] for e in m["versions"] if e.get("ts", 0) > horizon}
    dropped = [e["v"] for e in m["versions"] if e["v"] not in keep]
    m["versions"] = [e for e in m["versions"] if e["v"] in keep]
    _commit_manifest(root, m)
    for v in dropped:
        shutil.rmtree(os.path.join(root, f"v={v}"), ignore_errors=True)
    return dropped


def optimize(
    spark: SparkSession, root: str, target_files: int = 1
) -> int:
    """Small-file compaction as a COMMIT (the Delta OPTIMIZE shape):
    read the current snapshot, rewrite it into ``target_files`` files,
    and commit the rewrite as the next version.  Readers keep snapshot
    isolation (the old version's files are untouched until vacuum);
    content is byte-identical rows, only the file layout changes.
    Streaming ingest via :func:`stream_commit_snapshots` leaves one
    small snapshot per epoch — a nightly optimize + vacuum keeps the
    table's read amplification bounded."""
    cur = read_version(spark, root)
    v = write_version(
        cur.coalesce(int(target_files)), root, note="optimize"
    )
    return v


def diff_versions(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level change feed between two snapshots: full outer join on
    the key, each row classified added / removed / changed / unchanged
    (changed = any SHARED non-key column differs, null-safe).  Keys
    must be non-null.  Versions may have evolved schemas: columns
    present in only one side are ignored by the value comparison (a
    pure column addition with unchanged shared values reads as
    unchanged — schema evolution is not a row rewrite).  One key
    exchange; at scale both sides prune to the compared versions'
    files only."""
    from pyspark.sql import functions as F

    a = read_version(spark, root, v_from)
    b = read_version(spark, root, v_to)
    missing = [k for k in key_cols if k not in a.columns or k not in b.columns]
    if missing:
        raise ValueError(f"key columns absent in a compared version: {missing}")
    val_cols = [
        c for c in a.columns if c not in key_cols and c in b.columns
    ]
    a2 = a.select(
        *[F.col(c).alias(f"_a_{c}") for c in a.columns]
    )
    b2 = b.select(
        *[F.col(c).alias(f"_b_{c}") for c in b.columns]
    )
    cond = [
        a2[f"_a_{k}"].eqNullSafe(b2[f"_b_{k}"]) for k in key_cols
    ]
    j = a2.join(b2, cond, "full_outer")
    in_a = F.col(f"_a_{key_cols[0]}").isNotNull()
    in_b = F.col(f"_b_{key_cols[0]}").isNotNull()
    same_vals = None
    for c in val_cols:
        eq = F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
        same_vals = eq if same_vals is None else (same_vals & eq)
    if same_vals is None:
        same_vals = F.lit(True)
    change = (
        F.when(in_a & ~in_b, "removed")
        .when(~in_a & in_b, "added")
        .when(same_vals, "unchanged")
        .otherwise("changed")
    )
    key_out = [
        F.coalesce(F.col(f"_a_{k}"), F.col(f"_b_{k}")).alias(k)
        for k in key_cols
    ]
    return j.select(*key_out, change.alias("change"))
