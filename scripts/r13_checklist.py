#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r13 per-query checklist table from two
BENCH_detail-format files (baseline and closing official runs)."""
import json
import sys

CHANGED = {
    "q42_stream_tumbling": "CHANGED — memory state store + staging policy (S2/S3)",
    "q62_stream_interval_join": "CHANGED — memory state store + staging policy (S2/S3)",
    "q117_stream_dedup": "CHANGED — memory state store + staging policy (S2/S3)",
    "q63_stream_upsert": "CHANGED — staging policy declared + schema-provided snapshot read (S3/S4)",
    "q77_stream_enrich": "CHANGED — staging policy (S3); stateless, no provider",
    "q60_tfidf": "CHANGED — tf exchange size gate (S5)",
    "q76_surprisal": "CHANGED — tf exchange size gate (S5)",
    "q91_bm25": "CHANGED — tf exchange size gate (S5)",
    "q79_vocab_oov": "CHANGED — tf exchange size gate (S5, consumer)",
    "q113_pagerank": "CHANGED — count-gate before the kernel collect (S6.1)",
    "q72_histogram": "examined — Ranked ×4 estimate factor; plain path unchanged at sf0.1 (S6.2)",
    "q94_spend_deciles": "examined — Ranked ×4 estimate factor (S6.2)",
    "q99_percent_rank": "examined — Ranked ×4 estimate factor (S6.2)",
    "q107_peak_concurrency": "examined — Ranked ×4 estimate factor (S6.2)",
    "q131_gini_spend": "examined — Ranked ×4 estimate factor (S6.2)",
    "q25_ngram_jaccard": "examined — jaccard projected-text estimate; shape unchanged (S6.3)",
    "q44_dup_clusters": "examined — jaccard projected-text estimate (S6.3)",
    "q118_neardup_pipeline": "examined — rollup decomposition probed and REJECTED (S7)",
    "q112_trade_triangles": "examined — tradeEdges reorder probed and REJECTED (S7)",
    "q111_copurchase_lift": "examined — accepted at 1.40× vs DuckDB, spread evidence (S7)",
    "q71_scd2": "examined — determinism canary pins the r12 lazy checkpoints (S6.4)",
    "q103_table_checksum": "examined — canonical-string floor, stands (S7)",
    "q121_bucketed_join": "examined — rep-1 bucketed write IS the amortization (r12)",
}

def main(base_path, close_path):
    base = json.load(open(base_path))["queries"]
    close = json.load(open(close_path))["queries"]
    print("| query | baseline s | closing s | disposition |")
    print("|---|---|---|---|")
    for q in sorted(set(base) | set(close)):
        d = CHANGED.get(q, "audited — r12 ExplainAudit disposition stands; drift-band delta only")
        b = f"{base[q]:.2f}" if q in base else "—"
        c = f"{close[q]:.2f}" if q in close else "—"
        print(f"| {q} | {b} | {c} | {d} |")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
