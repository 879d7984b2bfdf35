#!/usr/bin/env python
"""Regenerate PLANS.md: physical plans of representative queries at
sf0.01 with AQE disabled so whole-stage-codegen spans are visible."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stdb_spark.session import get_spark  # noqa: E402
from stdb_spark.workloads import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.01"
PICK = [
    ("ts_select_range", "select: filter+projection pushdown to scan, then ordered output"),
    ("ts_group_aggregate", "group-aggregate: begin-aligned buckets, partial->final hash agg, one exchange"),
    ("ts_join_pivot", "join: ts-alignment as pivot — zero join operators"),
    ("rel_q5_local_supplier_volume", "multi-way join: dims broadcast, facts shuffle"),
    ("doc_minhash_lsh_candidates", "minhash+LSH: tokenize ONCE into a column (r7), explode -> flat hashes -> exchange-reused aggregation"),
    ("emb_ann_bruteforce", "ANN brute force: TakeOrderedAndProject, no global sort"),
    ("ts_asof_join", "as-of join: union + window fill — one shuffle, no range join"),
    ("ts_interval_join", "interval join: bucketized equi-join — shuffled hash join, no nested loop"),
    ("ts_aggregate_summary_pushdown", "aggregate from write-time summaries: two tiny scans + broadcast, no leaf rows"),
    ("emb_ann_lsh_presigned", "ANN over write-time signatures: bucket equality reaches PushedFilters"),
    ("doc_hamming_near_dups", "simhash near-dup: postings shuffle over 4 pigeonhole blocks, full recall"),
    ("rel_q7_volume_shipping", "double-role dimension: nation broadcast twice under aliases, one agg exchange"),
    ("rel_q17_small_quantity_revenue", "decorrelated per-part average: groupBy on the join key shares its exchange"),
    ("doc_contamination", "decontamination: benchmark postings broadcast, corpus side never shuffles"),
    ("doc_hash_sample", "deterministic sample: map-side md5 filter, zero shuffles"),
    ("ts_gapfill_interpolate", "gap fill: one anchor exchange + one lead() window, grid generated map-side by explode"),
    ("ts_corr_metrics", "cross-metric correlation: pivot exchange + decimal moment sums, scalar finish"),
    ("ts_sessionize", "sessionize: ONE user exchange feeds lag, running sum, and the per-session rollup"),
    ("ts_funnel", "funnel: chained whole-partition window mins stack on one exchange, tiny stage agg"),
    ("ts_m4_downsample", "M4 downsample: struct anchors, partial->final agg on one (series,bucket) exchange"),
    ("doc_tfidf_top_terms", "tf-idf: one (doc,term) exchange, broadcast vocab idf, decimal-exact ranking window"),
    ("doc_ngram_jaccard_capped", "capped Jaccard: stop-shingle postings dropped before the chained-explode pair emission"),
    ("ts_ewma", "EWMA: hash-partition-batched applyInPandas — one Arrow group per shuffle partition, not per series"),
    ("rel_q21_suppliers_waiting", "waiting supplier: EXISTS/NOT EXISTS as fact self semi/anti joins sharing one key"),
    ("doc_pack_sequences", "sample packing: one shard exchange, window cumsum, zero joins"),
    ("stream_enrich_join", None),  # streaming — plan not printable offline; skipped below
    ("ts_rank_ntile", "rank/ntile: one per-series window sort, rank filter before the output projection"),
    ("doc_c4_line_filter", "C4 line filter: split/filter/rejoin as map-side array ops — zero exchanges"),
    ("doc_source_mixture", "source mixture: CASE weights + hash draw + explode(sequence) — zero exchanges"),
    ("emb_ann_int8", "int8 ANN: map-side quantize + exact int64 dot, TakeOrderedAndProject"),
    ("doc_ngram_novelty", "n-gram novelty: ONE shingle exchange (count,min-doc ownership), no postings self-join"),
    ("ts_seasonal_decompose", "seasonal decompose: three stacked window stages, decimal means, no joins"),
    ("ts_concurrency", "peak concurrency: two-phase prefix sum — bucket-partitioned run sums + tiny offset window"),
    ("ts_changepoints", "Page-Hinkley: decimal run-sum minus rn*mean on one series exchange"),
    ("ts_integral_daily", "trapezoid integral: lag window + bucket agg share ONE series exchange (partitioning satisfies both)"),
    ("ts_mad_outliers", "MAD outliers: two exact-percentile windows + rollup on one series exchange"),
    ("ts_bollinger", "Bollinger bands: decimal moment sums in a row frame, one series exchange"),
    ("doc_dup_spans", "dup spans: md5 gram digests map-side, gram-partitioned count window + rollup — one gram exchange, no join, no pair blowup"),
    ("doc_winnowing", "winnowing: sliding min-hash selection as pure array exprs — zero exchanges"),
    ("emb_semantic_dedup_blas", "SemDeDup (production): ONE cell exchange into a blocked-BLAS matmul applyInPandas"),
    ("emb_semantic_dedup", "SemDeDup (exact gate twin): integer cell assignment, pair join re-spread by explicit repartition before the fold"),
    ("ts_ohlc_from_summaries", "OHLC rollup from the summary store: combine-only aggregate, ZERO leaf scans"),
    ("ts_distinct_users_hll_portable", "portable HLL: md5 registers, integer MAX merge + exact harmonic sum — all JVM exprs"),
    ("emb_ann_pq", "PQ ADC: byte codes + broadcast distance table, TakeOrderedAndProject"),
    ("doc_dup_span_scrub", "substring scrub: gram-partitioned first/count window + shuffle-pinned covered-position anti-join — linear, no pairs, nothing broadcastable"),
    ("ingest_upsert_merge", "upsert: union + one key-window keep-latest, no join"),
    ("ts_xcorr_lead_lag", "cross-correlation: count agg exchange, tiny post-agg lead window, integer moments"),
    ("ts_heavy_hitters_sketch", "Misra-Gries: mapInPandas partition summaries, <=k rows shuffled per partition"),
    ("ts_subsequence_match", "subsequence search: W-term lag chain + rank on one series exchange"),
    ("rel_order_value_deciles", "two-phase ntile: bucketed rank + broadcast histogram offsets, no ntile operator, no single-partition sort"),
    ("rel_rfm_segments", "3x two-phase ntile over the customer aggregate — every row-scale window partitioned"),
    ("doc_boilerplate_lines", "TakeOrdered-then-rank: unpartitioned window sees only the 20 survivors"),
    ("doc_curriculum_phases", "curriculum quartiles: two-phase ntile over quality scores at corpus scale"),
    ("sp_knn_grid", "grid KNN phase 2: bbox predicates reach PushedFilters, TakeOrdered(k)"),
    ("ingest_resp_roundtrip", "RESP parse: JVM split/slice/arrays_zip/explode — row-protocol zip, no Python"),
    ("ts_event_funnel", "windowed funnel: cumulative conditional-min windows stack on ONE user exchange, tiny stage histogram"),
    ("ingest_resp_events_roundtrip", "RESP event-body ingest: one parse pass emits value XOR body per element, all JVM exprs; PDU validity folded into the explode generator (r7: no Filter node, no scan-side re-parse)"),
    ("rel_q9_product_type_profit", "derived partsupp in-plan: part x range(4) broadcast cross, cents-decimal profit, dims broadcast"),
    ("rel_supplier_pagerank", "PageRank (small regime): one dispatch count + ONE Arrow task runs the whole integer loop"),
    ("doc_chunk_windows", "RAG chunking: explode(sequence) + substring, flatMap shape — zero exchanges"),
    ("ts_lttb", "exact-integer LTTB: one hash exchange, sequential kernel per series inside Arrow frames"),
    ("ts_retention_matrix", "retention matrix: one scan, one user exchange — cohort via whole-partition min window, no self-join"),
    ("ts_time_rollup", "time-hierarchy ROLLUP: single Expand into one partial->final cell aggregate"),
    ("rel_revenue_rollup", "region/nation ROLLUP: facts pre-aggregated to 25 cells BEFORE Expand; dims broadcast"),
    ("rel_supplier_pagerank", "exact PageRank: single edge-lineage eval, graph-scaled exchanges, broadcast ranks below 1M nodes (co-partitioned join above)"),
    # r7 additions
    ("ts_distinct_users_hll_rollup", "HLL rollup over MATERIALIZED register parquet: max-merge + exact integer harmonic sum, broadcast LC table — raw events never rescanned"),
    ("mm_image_features", "media features: Arrow-batched mapInPandas over binary payloads, exact-int mean/std emitted as plain doubles"),
    ("doc_quality_score", "quality features: tokens -> features -> score as THREE projections, tokenize evaluated once per row (r7: was 12 inlined copies)"),
    # r8 additions
    ("sp_od_matrix", "OD matrix: endpoints from min/max(ts) — TWO hash aggregates, no window, no self-join"),
    ("sp_quadkey_rollup", "multi-zoom density: coarse zoom re-aggregates fine-cell PARTIALS (exchange on the tiny fine aggregate, fact scanned once)"),
    ("ts_value_drift_kl", "KL drift: (metric,bin) agg + per-metric totals window + decimal term sum — one fact exchange"),
    # rel_part_triangles / rel_part_communities_lpa: the registry
    # callables collect scalars / cut lineage internally, so their
    # top-level plans are LocalTableScan — their internal lineages are
    # recorded by the graph-family section appended in main()
    ("mm_image_tiles", "patch stats: Arrow-batched mapInPandas, integer tile sums, zero exchanges"),
    ("ingest_malformed_quarantine", "PERMISSIVE quarantine: corrupt rows recover keys from the raw line, clean rows parse in the scan"),
    # r11 rewrites (VERDICT r10 directives #3/#6)
    ("rel_abc_analysis", "Pareto ABC: two-phase bucket-histogram cumsum — the only unpartitioned window sits over the log2-band histogram"),
    ("emb_silhouette", "silhouette: broadcast centroid join, ONE vector-scale exchange (prefix-partitioning satisfies both groupings)"),
    ("rel_brand_revenue_share", "share-of-total: 1-row total aggregate crossJoin-broadcast back; rollup exchange reused under AQE, no window"),
    ("doc_char_entropy", "bigram entropy: single per-doc aggregate, no totals join"),
]


def main() -> None:
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out = [
        "# PLANS — physical plans of representative queries (sf0.01, AQE off to show codegen spans)",
        "",
        "Generated by `python tools/gen_plans.py`. `*(n)` prefixes mark",
        "whole-stage-codegen stages; see tests/test_plans.py for the asserted",
        "properties (pushdown, broadcast, partial aggregation, exchange reuse).",
        "",
    ]
    for name, note in PICK:
        if note is None:  # streaming entries have no offline plan
            continue
        df = QUERIES[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    # graph-family internal lineages (r8 VERDICT directive #9): the
    # registry callables materialize scalars / checkpoint per round, so
    # their top-level plans are LocalTableScan — record the un-persisted
    # internal plans the persist fixes are verifiable against instead.
    from stdb_spark.operators import graph
    from stdb_spark.workloads.relsuite import copurchase_edges

    for name, note, df in [
        (
            "rel_part_triangles (internal: triangle_plan)",
            "degree-oriented wedge join: orientation (two deg joins), wedge self-join at the"
            " source, ONE closing probe, count — high-degree endpoints never enumerate"
            " wedges (intermediate bounded by m^1.5).  In triangle_count_exact the edge"
            " input and deg are persisted so the caller's edge lineage runs once.",
            graph.triangle_plan(copurchase_edges(spark, SF)),
        ),
        (
            "rel_part_communities_lpa (internal: lpa_round_plan)",
            "one distributed LPA round: ONE edge-label join + one (id,lbl) count exchange +"
            " one self-label union + one per-id window pick (count desc, lbl asc).  In"
            " label_propagation_exact the edge list is persisted, each round is cut with an"
            " eager localCheckpoint, and graphs under 20M edges take a single Arrow-kernel"
            " task instead.",
            graph.lpa_round_plan(copurchase_edges(spark, SF)),
        ),
    ]:
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
