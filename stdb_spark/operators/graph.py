"""Graph analytics over DataFrame edge lists: exact fixed-point
PageRank.

The reference has no graph operators at all; its nearest neighbor is
the dedup suite's connected components (functions/dedup.py), which
iterates hash-min label propagation.  PageRank is the other canonical
iterative graph kernel a data-curation pipeline reaches for (source
authority for quality weighting, influence ranking over interaction
graphs), and it showcases the second iterative-algorithm shape: a
per-round join + aggregate instead of CC's per-round min-fold.

Exactness: floating-point PageRank is order-dependent (float sums), so
cross-engine bit parity is impossible.  This implementation runs in
INTEGER fixed point instead — ranks are BIGINT multiples of 1/SCALE,
every contribution is one floor division `(pr * dampN) div (dampD *
outdeg)`, and sums are exact BIGINT adds.  Truncation deliberately
leaks a little mass per round (each floor drops < 1 unit); that loss
IS the spec, identically reproducible in any engine with integer
division — which is what makes a full SQL oracle possible (unrolled
CTE iterations in DuckDB match bit-for-bit).

Scale shape (per iteration): one co-partitioned join of the
(src-partitioned, persisted) degree-annotated edge list against the
rank table, one groupBy(dst) aggregate — i.e. one shuffle of the rank
updates per round, the same per-round cost envelope as dedup's CC.
Ranks are localCheckpointed every round so the plan stays flat; at
cluster scale use a reliable checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # ranks are BIGINT multiples of 1e-12


#: below this node count the rank table rides each iteration's join as
#: an explicit broadcast (~30 MB at 1M nodes x ~30 B/row) — the edge
#: side then never exchanges; above it, ranks hash-join against the
#: src-partitioned edge list (the cluster-scale shape)
BROADCAST_RANKS_MAX_NODES = 1_000_000


def pagerank_exact(
    edges: DataFrame,
    iterations: int = 5,
    damp_num: int = 85,
    damp_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Exact integer fixed-point PageRank over a directed edge list.

    Returns (node, pr) with ``pr`` in BIGINT SCALE units.  Every node
    appearing as a source or destination participates; dangling nodes
    (no out-edges) simply contribute nothing (their mass evaporates,
    again deterministically).  ``damp_num/damp_den`` is the damping
    factor as an exact rational (default 85/100).

    Wall-time shape (r4 review: rounds x scheduling latency dominated
    locally): the caller's edge lineage is evaluated EXACTLY ONCE (the
    r4 version evaluated it twice — once for nodes, once for the
    degree join); the loop's exchanges are sized to the rank table
    (#nodes div 64k partitions, not the session's corpus-scale
    setting); and when the graph is small enough the ranks broadcast,
    so each round touches the cached edge list with zero edge-side
    exchange.  At cluster scale (n > BROADCAST_RANKS_MAX_NODES) the
    per-round shape is unchanged from r4: one co-partitioned join +
    one rank exchange.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    n_edges = e.count()  # materializes the caller lineage exactly once
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # graph-scale exchanges: ~1M edges per reduce task, floor of 4
    parts = max(4, min(int(old_parts), n_edges // 1_000_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        ).persist()
        n = nodes.count()  # one scalar — bounded driver work by design
        deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
        broadcast_ranks = n <= BROADCAST_RANKS_MAX_NODES
        ed = e.join(deg, "src")
        if not broadcast_ranks:
            # src-partitioned once; every iteration's hash join reuses
            # this layout (broadcast mode needs no layout at all)
            ed = ed.repartition("src")
        ed = ed.persist()
        teleport = (SCALE * (damp_den - damp_num)) // (damp_den * n)
        pr = nodes.withColumn("pr", F.lit(SCALE // n))
        prev = None
        for it in range(int(iterations)):
            rank_side = F.broadcast(pr) if broadcast_ranks else pr
            contribs = (
                ed.join(rank_side, ed.src == pr.node)
                .select(
                    "dst",
                    F.expr(
                        f"(pr * {damp_num}L) div ({damp_den}L * outdeg)"
                    ).alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            pr = (
                nodes.join(contribs, nodes.node == contribs.dst, "left")
                .select(
                    "node",
                    (F.lit(teleport) + F.coalesce(F.col("s"), F.lit(0))).alias(
                        "pr"
                    ),
                )
            )
            if checkpoint and (
                (it + 1) % int(checkpoint_every) == 0
                or it + 1 == int(iterations)
            ):
                # eager: materialize up to here, then release the previous
                # checkpoint's blocks — otherwise every invocation pins
                # iterations x |nodes| of storage for the session's life
                # (same discipline as dedup's CC, functions/dedup.py:492).
                # Checkpointing every `checkpoint_every` rounds instead of
                # every round halves the sequential materialization jobs
                # while keeping at most that many rounds of lineage live.
                pr = pr.localCheckpoint(eager=True)
                if prev is not None:
                    prev.unpersist()
                prev = pr
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    # release the edge/node caches unconditionally: with checkpointing
    # the final ranks are already materialized; without it the caller's
    # first action recomputes the (cheap) edge projection instead of
    # pinning two DataFrames for the session's lifetime
    e.unpersist()
    ed.unpersist()
    nodes.unpersist()
    return pr


def pagerank_oracle_sql(
    edges_cte: str,
    iterations: int = 5,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """The DuckDB oracle for :func:`pagerank_exact`: unrolled CTE
    iterations over ``edges_cte`` (a CTE body yielding (src, dst))
    reproducing the same integer floor arithmetic bit-for-bit."""
    parts = [
        f"WITH e AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"p0 AS (SELECT node, {SCALE} // (SELECT n FROM nn) AS pr FROM nodes)",
    ]
    tele = (
        f"(SELECT ({SCALE} * {damp_den - damp_num}) // ({damp_den} * n) "
        "FROM nn)"
    )
    for k in range(1, int(iterations) + 1):
        parts.append(
            f"p{k} AS (SELECT n.node, {tele} + coalesce(c.s, 0) AS pr "
            "FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, sum((p.pr * {damp_num}) // "
            f"({damp_den} * d.outdeg)) AS s "
            f"FROM e JOIN deg d ON e.src = d.src "
            f"JOIN p{k - 1} p ON p.node = e.src GROUP BY e.dst"
            ") c ON n.node = c.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, CAST(pr AS BIGINT) AS pr FROM p{int(iterations)}"
