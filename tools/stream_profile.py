#!/usr/bin/env python
"""Micro-batch breakdown profiler for the stream_* replay queries.

Replays the same transforms `_replay_stream` runs, but keeps the
StreamingQuery handle and prints each micro-batch's durationMs split
(addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets) plus stateOperators metrics — the decomposition VERDICT
r11 directive #3 asks for before touching the streaming floor.

Usage: python tools/stream_profile.py [--sf DIR] [--runs N]
       [geofence|topk|dict|respevents ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def replay(spark, path, transform, sink_name, mode, files_per_trigger,
           state_width=None, extra_conf=None):
    from stdb_spark import model

    if state_width is not None:
        child = spark.newSession()
        model.ensure_session_confs(child)
        child.conf.set("spark.sql.shuffle.partitions", str(int(state_width)))
        spark = child
    for k, v in (extra_conf or {}).items():
        spark.conf.set(k, v)
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", str(files_per_trigger)
    ).parquet(path)
    out = transform(sdf)
    if sink_name in [t.name for t in spark.catalog.listTables()]:
        spark.catalog.dropTempView(sink_name)
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progress = [json.loads(p.json) for p in q.recentProgress]
    return wall, progress, spark.table(sink_name).count()


def summarize(name, wall, progress, n_rows):
    print(f"== {name}: wall {wall:.3f}s, {len(progress)} micro-batches, {n_rows} sink rows")
    for p in progress:
        d = p.get("durationMs", {})
        so = p.get("stateOperators", [])
        state = "; ".join(
            f"{s.get('operatorName','?')}: commit={s.get('commitTimeMs')}ms rows={s.get('numRowsTotal')}"
            for s in so
        )
        print(
            f"  batch {p.get('batchId')}: rows={p.get('numInputRows')} "
            f"triggerMs={d.get('triggerExecution')} addBatch={d.get('addBatch')} "
            f"getBatch={d.get('getBatch')} latestOffset={d.get('latestOffset')} "
            f"planning={d.get('queryPlanning')} walCommit={d.get('walCommit')} "
            f"commitOffsets={d.get('commitOffsets')} {state}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra k=v session conf for the replay child")
    args = ap.parse_args()
    names = args.names or ["geofence", "topk", "dict"]
    extra = dict(kv.split("=", 1) for kv in args.conf)

    from stdb_spark import model
    from stdb_spark.session import get_spark
    from stdb_spark.workloads import tssuite
    from stdb_spark.workloads import QUERIES

    spark = get_spark("stdb-stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    layout = tssuite._layout_path(spark, args.sf)

    def geofence_tf(sdf):
        from stdb_spark.streaming.ingest import streaming_geofence_visits

        u = F.col("tags")["user"]
        tu = F.expr("ts div 1000")
        lon = F.lit(116.0) + (u.cast("long") % 40) * F.lit(0.01) + (
            tu % 100
        ) * F.lit(1e-5)
        lat = F.lit(39.0) + F.expr("CAST(tags['user'] AS LONG) div 40") * F.lit(
            0.01
        ) + (tu % 7) * F.lit(1e-4)
        ins = (
            lon.between(116.05, 116.20) & lat.between(39.0, 39.02)
        ).cast("int")
        pts = sdf.filter(F.col("metric") == "click").select(
            u.alias("u"), tu.alias("ts"), ins.alias("ins")
        )
        return streaming_geofence_visits(pts, key_cols=("u",))

    def topk_tf(sdf):
        from stdb_spark.streaming.ingest import streaming_windowed_counts

        return streaming_windowed_counts(
            sdf.withColumn("ts", F.expr("(ts div 1000) * 1000")),
            window="1 day",
            max_lateness="30 days",
        )

    spec = {
        "geofence": (geofence_tf, "p_geo_sink", "append", 75, 8),
        "topk": (topk_tf, "p_topk_sink", "complete", 75, 8),
    }
    # warm everything once through the registered queries
    for nm, q in (("geofence", "stream_geofence_visits"),
                  ("topk", "stream_windowed_topk"),
                  ("dict", "stream_resp_dictionary_ingest")):
        if nm in names:
            try:
                QUERIES[q](spark, args.sf).write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"warm {q} failed: {e}", file=sys.stderr)

    for name in names:
        if name == "dict":
            # registered fn owns its child session; time it whole
            for r in range(args.runs):
                t0 = time.perf_counter()
                QUERIES["stream_resp_dictionary_ingest"](spark, args.sf).write.format(
                    "noop"
                ).mode("overwrite").save()
                print(f"== dict run {r}: wall {time.perf_counter()-t0:.3f}s (whole query)")
            continue
        tf, sink, mode, fpt, width = spec[name]
        for r in range(args.runs):
            wall, prog, n = replay(
                spark, layout, tf, f"{sink}_{r}", mode, fpt, width, extra
            )
            summarize(f"{name} run {r}", wall, prog, n)


if __name__ == "__main__":
    main()
