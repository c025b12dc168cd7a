#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r12.md per-query checklist table from the round's
before/after official BENCH_detail artifacts plus the disposition map."""
import json, sys

before = json.load(open(sys.argv[1]))["queries"]
after = json.load(open(sys.argv[2]))["queries"]

CHANGED = {
    "q124_source_overlap": "grouped collect_set pass + fanOut (commit 1)",
    "q25_ngram_jaccard": "map-side verification sets (commit 2)",
    "q44_dup_clusters": "map-side verification sets (commit 2)",
    "q118_neardup_pipeline": "map-side verification sets (commit 2)",
    "q72_histogram": "Ranked small-input gate (commit 3)",
    "q94_spend_deciles": "Ranked small-input gate (commit 3)",
    "q99_percent_rank": "Ranked small-input gate (commit 3)",
    "q107_peak_concurrency": "Ranked small-input gate (commit 3)",
    "q131_gini_spend": "Ranked small-input gate (commit 3)",
    "q60_tfidf": "id-keyed tf exchange (commit 4)",
    "q76_surprisal": "id-keyed tf exchange (commit 4)",
    "q91_bm25": "id-keyed tf exchange (commit 4)",
    "q113_pagerank": "driver power-iteration kernel (commit 5)",
}
EXAMINED = {
    "q85_pretrain_pipeline": "fanOut variant measured WORSE (1.21 vs 1.54) — rejected",
    "q42_stream_tumbling": "micro-batch commit floor (r12 streaming pass; tmpfs, probed)",
    "q62_stream_interval_join": "state width 4, 2 micro-batches minimal; RocksDB ruled out",
    "q63_stream_upsert": "staged input memoized; residual = upsert commit protocol",
    "q77_stream_enrich": "stream-static broadcast join, stateless — floor",
    "q117_stream_dedup": "single-batch dedup state — floor",
    "q111_copurchase_lift": "single-grouped-pass rework inherited (r12 session 1)",
    "q103_table_checksum": "canonical-string floor (r11 probe), accepted",
    "q121_bucketed_join": "rep-1 bucketed write IS the amortization; min is honest",
    "q71_scd2": "3-fold merge job floor; lazy-checkpoint variant judged not worth risk",
    "q96_pareto": "skyline window runs over per-x minima (already aggregated)",
    "q31_cdc_merge_stats": "one of 2 static SMJs; AQE handles at runtime",
    "q108_name_edit_pairs": "blocked edit-distance pairs; Σ block² by design (r11)",
    "q127_record_linkage": "same blocked-pair family; bench-scale warmed",
    "q97_recursive_reach": "driver BFS + recursive twin, gated (r11)",
    "q130_ivf_recall": "both neighbor sets materialized once; exchange-reuse shape",
    "q45_asof_join": "union+window linear as-of; per-user partitioned window",
    "q70_asof_forward": "same as-of shape, reversed order",
    "q66_profile": "single-pass multi-distinct Expand profile — one agg by design",
    "q32_dq_rules": "rule fan-out over one cloned-session view; floor",
    "q30_cdc_changes": "full-outer merge classify, one PK shuffle",
    "q33_meta_etl": "FK-graph synthesized joins, broadcast dims",
    "q01_pricing_summary": "Money long-cents partials (Q01Probe, r10); floor",
    "q48_local_supplier_volume": "5-way broadcast star join; floor",
    "q24_minhash_lsh": "codegen MinHashExpr + banded join (r11 shape)",
    "q128_funnel_rates": "funnel window chain; 14 exch static but sub-agg sized",
    "q88_funnel": "same funnel family",
    "q126_seasonal_anomaly": "dim-grid densification cross joins pinned tiny",
}

rows = []
for q in sorted(before):
    b, a = before[q], after.get(q)
    if q in CHANGED:
        note = "CHANGED — " + CHANGED[q]
    elif q in EXAMINED:
        note = "examined — " + EXAMINED[q]
    else:
        note = "audited (ExplainAudit sweep) — floor class, scans pruned/pushed"
    rows.append((q, b, a, note))

print("| query | before s | after s | disposition |")
print("|---|---|---|---|")
for q, b, a, note in rows:
    print(f"| {q} | {b:.2f} | {a:.2f} | {note} |")
bt = sum(before.values()); at = sum(v for v in after.values())
print(f"\nTotals: before {bt:.1f}s -> after {at:.1f}s (same-day official pair runs; "
      "per-change evidence is the same-session A/B probes above).")
