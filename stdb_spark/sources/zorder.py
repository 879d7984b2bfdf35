"""Z-order (Morton) clustering: multi-dimensional row-group pruning.

A single-column sort gives parquet min/max pruning on ONE dimension;
a query narrow in the other dimension still touches every file.  The
reference's R-tree (stdb/index/rtree.h:594-712) solves this with a
spatial tree; the write-time Spark analog is Morton-interleaving the
two cell coordinates and range-partitioning + sorting the table by the
interleaved key.  Nearby (x, y) cells then land in the same files, so
BOTH columns carry tight per-file/row-group min/max stats and an MBR
query prunes on lon AND lat — no index structure, just layout.

This is how Delta/Iceberg OPTIMIZE ZORDER works; vanilla Spark has no
native operator, so the key is built from bit arithmetic (shift/and/or
— whole-stage-codegen'd) and the clustering is repartitionByRange +
sortWithinPartitions.  One ingest-side pass, every later range query
benefits (same trade as storage.write_samples / presigned LSH).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cell_x: Column, cell_y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative cell ids into a
    single Morton code (x in even positions, y in odd).  2*bits
    shift/and/or terms — pure JVM arithmetic inside codegen."""
    if not (1 <= bits <= 31):
        raise ValueError("bits must be in [1, 31]")
    x = cell_x.cast("long")
    y = cell_y.cast("long")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_cells(
    lon: Column,
    lat: Column,
    cell_deg: float,
    lon_origin: float = -180.0,
    lat_origin: float = -90.0,
) -> tuple[Column, Column]:
    """Non-negative grid cell ids from raw coordinates (fixed origin so
    the ids — and therefore the Morton code — are stable across
    ingests)."""
    cx = F.floor((lon - F.lit(lon_origin)) / F.lit(cell_deg))
    cy = F.floor((lat - F.lit(lat_origin)) / F.lit(cell_deg))
    return cx, cy


def write_zordered(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 0.01,
    n_files: int = 32,
    bits: int | None = None,
) -> None:
    """Cluster ``df`` by the Morton code of (lon, lat) and write
    ``n_files`` parquet files, each covering a compact 2-D region.  The
    key is a transient layout column — dropped before write; pruning
    rides the ordinary lon/lat min/max statistics.

    ``bits`` auto-sizes to cover the full coordinate range at
    ``cell_deg`` resolution — a too-small fixed width would silently
    alias distant cells onto one code and scatter the clustering."""
    if bits is None:
        import math

        bits = max(1, math.ceil(math.log2(360.0 / cell_deg + 1)))
    if bits > 31:
        raise ValueError(
            f"cell_deg={cell_deg} needs {bits} bits/axis (> 31); "
            "use a coarser clustering cell"
        )
    cx, cy = zorder_cells(F.col(lon), F.col(lat), cell_deg)
    z = morton_key(cx, cy, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(int(n_files), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
