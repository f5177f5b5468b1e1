#!/usr/bin/env python3
"""Per-family scaling ratios between two Bench JSON files (VERDICT r5 #5).

Usage: python3 tools/scale_ratios.py BENCH_A.json BENCH_B.json [scale_factor]

Prints a markdown table of per-family total seconds in A and B, the B/A
ratio, and flags super-linear outliers (ratio > scale_factor). The battery
is grouped into operator families so a 5x data scale-up reads as "joins
scaled 2.9x, LSH dedup scaled 4.8x" instead of 101 separate numbers.
"""
import json
import sys

FAMILIES = {
    "relational scan/agg/join": [
        "q01_pricing_summary", "q02_market_share", "q04_semi_join",
        "q05_merge_upsert", "q06_union_choice", "q07_subtract",
        "q08_apply_mapping", "q09_split_rows", "q10_field_ops",
        "q11_unnest", "q12_relationalize", "q13_unbox_json", "q14_date_dim",
        "q15_collect_set", "q16_month_join", "q17_scd2_cols",
        "q27_fact_snapshot", "q29_nest_unnest", "q30_argmax",
        "q35_drop_null_fields", "q36_ddb_unnest", "q37_filter_rows",
        "q39_salted_join", "q43_hash_split", "q53_unbox_avro",
        "q58_rollup", "q59_pivot", "q60_unpivot", "q70_cube_agg",
        "q72_intersect", "q84_match_catalog", "q95_percentiles"],
    "windows / top-k": [
        "q03_cum_window", "q40_topk_per_group", "q61_lag_delta",
        "q67_topk_heap", "q71_rank_windows", "q85_cap_per_group",
        "q86_token_budget"],
    "text analysis": [
        "q19_text_stats", "q26_language_id", "q31_text_quality",
        "q41_repetition", "q44_tfidf", "q45_redact_pii", "q48_char_entropy",
        "q49_bigram_lm", "q52_chunk_tokens", "q55_corpus_stats",
        "q62_vocab_stats", "q88_collapse_repeats", "q89_vocab_coverage"],
    "dedup / similarity": [
        "q20_exact_dedup", "q21_ngram_jaccard", "q22_minhash_pairs",
        "q23_simhash_pairs", "q33_fingerprint", "q42_decontaminate",
        "q47_dup_clusters", "q51_dup_segments", "q54_cluster_survivors",
        "q64_bloom_decontaminate", "q87_strip_segments", "q92_dup_spans",
        "q102_exact_jaccard"],
    "embedding ANN / semantic": [
        "q24_cosine_pairs", "q25_lsh_topk", "q32_embedding_dedup",
        "q34_ivf_topk", "q68_semantic_prune"],
    "fuzzy / entity / retrieval": [
        "q90_fuzzy_join", "q91_entity_resolve", "q96_bm25_topk"],
    "sketches / stats": [
        "q46_source_sketch", "q63_heavy_hitters", "q69_kmv_distinct",
        "q74_cms_estimate", "q77_kmv_rollup", "q78_profile",
        "q80_hist_quantiles", "q82_skew_analyze", "q83_expectations",
        "q100_drift_psi"],
    "graph": ["q73_pagerank", "q81_shortest_paths", "q98_triangles"],
    "temporal / sessionize": [
        "q18_event_rollup", "q38_sessionize", "q56_asof_join",
        "q57_range_join", "q99_funnel"],
    "streaming": [
        "q28_stream_rollup", "q76_stream_interval_join", "q94_stream_enrich"],
    "incremental / diff": [
        "q79_incremental_rollup", "q93_snapshot_diff", "q97_incremental_join"],
    "curation mix/pack": ["q65_weighted_mix", "q66_pack_chunks"],
    "multimodal": ["q50_multimodal", "q101_multimodal_dims",
        "q103_audio_meta"],
    "layout": ["q75_zorder_stats", "q118_compact_roundtrip",
        "q124_pruned_scan"],
}

# r6s3/r7 additions, grouped by the same taxonomy
FAMILIES["relational scan/agg/join"] += [
    "q113_stratified_sample", "q114_scd2_merge", "q126_k_anonymity",
    "q127_fk_audit", "q137_schema_drift", "q139_golden_records",
    "q141_bloom_semi_join", "q147_hierarchy"]
FAMILIES["windows / top-k"] += [
    "q110_rolling_window", "q125_rolling_median", "q142_windowed_distinct",
    "q144_weighted_median", "q146_winsorized_sum"]
FAMILIES["text analysis"] += ["q121_nfc_normalize"]
FAMILIES["dedup / similarity"] += [
    "q105_cluster_split", "q109_index_dedup", "q111_merge_clusters",
    "q138_match_distribution", "q143_detector_agreement",
    "q148_curation_gate", "q149_match_proportions", "q115_negative_samples"]
FAMILIES["embedding ANN / semantic"] += [
    "q116_centroid_outliers", "q119_int8_quant", "q129_mmr_diverse"]
FAMILIES["fuzzy / entity / retrieval"] += [
    "q106_phrase_search", "q131_retrieval_eval", "q136_trending",
    "q150_bm25_stored_index"]
FAMILIES["sketches / stats"] += [
    "q122_anomaly_threshold", "q134_z_outliers"]
FAMILIES["temporal / sessionize"] += [
    "q104_session_window", "q107_hopping_window", "q123_event_transitions",
    "q128_audience_curve", "q130_resample_ffill", "q133_feature_join",
    "q135_session_paths", "q145_cohort_retention"]
FAMILIES["streaming"] += [
    "q108_stream_dedup", "q117_stream_rollup_fold", "q140_stream_sessions",
    "q151_chained_ingest"]
FAMILIES["incremental / diff"] += [
    "q112_retract_rollup", "q120_snapshot_time_travel", "q132_cdc_apply"]
# round-7 session-2 additions
FAMILIES["text analysis"] += ["q152_bpe_merges", "q155_bpe_accounting"]
FAMILIES["dedup / similarity"] += ["q153_dsir_select"]
FAMILIES["fuzzy / entity / retrieval"] += ["q154_hybrid_rrf"]


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    qa = json.load(open(a_path))["queries"]
    qb = json.load(open(b_path))["queries"]

    covered = {q for qs in FAMILIES.values() for q in qs}
    missing = sorted(set(qa) - covered)
    if missing:
        print(f"WARNING: unassigned queries (add to FAMILIES): {missing}")

    # compare only queries present in BOTH runs — a query added between
    # captures would otherwise inflate one side of its family's ratio
    common = set(qa) & set(qb)
    dropped = sorted((set(qa) | set(qb)) - common)
    if dropped:
        print(f"NOTE: only in one run, excluded: {dropped}")
    rows = []
    for fam, qs in FAMILIES.items():
        both = [q for q in qs if q in common]
        ta = sum(qa[q] for q in both)
        tb = sum(qb[q] for q in both)
        rows.append((fam, len(both), ta, tb,
                     tb / ta if ta > 0 else float("nan")))
    rows.sort(key=lambda r: -r[3])

    print("| family | queries | A sec | B sec | ratio B/A | note |")
    print("|---|---|---|---|---|---|")
    for fam, n, ta, tb, r in rows:
        note = "SUPER-LINEAR" if r > scale else ("sub-linear" if r < scale * 0.6 else "")
        print(f"| {fam} | {n} | {ta:.2f} | {tb:.2f} | {r:.2f}x | {note} |")
    ta_tot = sum(r[2] for r in rows)
    tb_tot = sum(r[3] for r in rows)
    print(f"| **total** | {sum(r[1] for r in rows)} | {ta_tot:.2f} | "
          f"{tb_tot:.2f} | {tb_tot / ta_tot:.2f}x | data scale {scale:.0f}x |")

    worst = sorted(((qb[q] / qa[q], q, qa[q], qb[q]) for q in common
                    if qa[q] > 0.3), reverse=True)[:8]
    print("\nLargest per-query ratios (A >= 0.3 s):")
    for r, q, ta, tb in worst:
        print(f"  {q}: {ta:.2f} -> {tb:.2f} s ({r:.2f}x)")


if __name__ == "__main__":
    main()
