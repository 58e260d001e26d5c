#!/usr/bin/env bash
# Repeatable 100x-replica scale sweep -> BENCH_100X.json.
#
# The scale story (what matters at 100 TB) used to live as prose in
# BASELINE.md from hand-run campaign sessions; this makes it a
# committed artifact regenerated in one command:
#
#   tools/bench_100x.sh            # full sweep vs WARM_FLOORS_100X.json
#
# Steps: (1) generate the dissimilar 100x replica of sf0.1 (per-replica
# alphabet-permuted documents, sign-flipped embeddings, offset keys —
# tools/gen_sf1.py) unless it already exists; (2) run graft.Bench over
# the curated scale-relevant cell list below against the committed
# 100x floor ledger. Bench's own verdict machinery (gauge-bracketed
# ambient detection + end-of-sweep solo replay of every non-ok cell)
# adjudicates each cell in-file, so the committed artifact carries no
# unexplained overs.
#
# Bootstrap / floor maintenance (floors only ratchet down):
#   python3 tools/update_floors.py --floors WARM_FLOORS_100X.json BENCH_100X.json
set -euo pipefail
cd "$(dirname "$0")/.."

REPLICA="${GRAFT_REPLICA_DIR:-/tmp/graft_sf10}"
FACTOR="${GRAFT_REPLICA_FACTOR:-100}"

if [ ! -f "$REPLICA/lineitem.parquet" ]; then
  echo "[bench_100x] generating ${FACTOR}x replica at $REPLICA"
  python3 tools/gen_sf1.py /root/testdata/sf0.1 "$REPLICA" "$FACTOR"
fi

# Scale-relevant cells: every family whose 100x behavior the engine
# design argues about (shuffle-bound joins, banded dedup, ANN indexes,
# streaming state, connected components, TPC-H shapes), plus the two
# contention anchors. Catalog/inspection cells (cubeschema, profile_*)
# are excluded — their cost is metadata, not data.
QUERIES=$(tr -d ' \n' <<'EOF'
sql_q1,sql_q2,sql_q3,sql_q4,sql_q5,sql_q6,sql_q7,sql_q8,sql_q9,sql_q10,
sql_q11,sql_q12,sql_q13,sql_q14,sql_q15,sql_q16,sql_q17,sql_q18,sql_q19,
sql_q20,sql_q21,sql_q22,
dedup_exact,dedup_canonical,dedup_minhash,dedup_simhash,dedup_ngram,
dedup_clusters,dedup_incremental,dedup_incremental_near,dedup_substring,
dedup_strip,
embed_rproj,embed_centroids,embed_neardup,embed_semdedup,
embed_decontaminate,embed_hard_negatives,embed_hard_negatives_ivf,
simsearch_brute,simsearch_lsh,simsearch_ivf,simsearch_ivfpq,
simsearch_ivf_persisted,simsearch_ivf_append,simsearch_ivf_stream,
text_stats,text_tfidf,text_bm25,text_lm_score,text_vocab,
text_repetition,text_bpe_pairs,text_bpe_roundtrip,text_bpe_bytes,
lang_id,quality_score,fingerprint,
corpus_gopher_filter,corpus_boilerplate,corpus_chunks,
corpus_decontaminate,corpus_pack_sequences,corpus_span_dedup,
corpus_shards,corpus_stream_ingest,
corpus_stratified_sample,corpus_weighted_sample,
corpus_weighted_stratified,corpus_mixture,corpus_split_leakfree,
corpus_repetition,corpus_diff,corpus_domains,
pipeline_corpus,pipeline_corpus2,pipeline_corpus3,pipeline_corpus4,
pipeline_redact,
events_hourly,events_sessions,events_funnel,events_retention,
events_anomaly,events_stream_pipeline,events_stream_sessions,
events_stream_hourly,
events_stream_aggstate,events_stream_anomaly,
events_stream_anomaly_evict,events_stream_cdc,events_stream_compact,
events_stream_dedup,events_stream_dedup_wm,events_stream_enrich,
events_stream_join,events_stream_session_log,
events_stream_session_log_evict,events_stream_session_window,
events_stream_sessions_evict,events_stream_sink,
dedup_incremental_near_stream,sink_partitioned,
dq_report,sample_stratified,group_topk_rows,
grouping_cube,grouping_rollup,pivot_priority,
setop_intersect,setop_anti,window_lead,
join_topk,join_bucketed,join_asof,join_asof_native,join_range,
join_skew_salted,join_skew_hotkeys,join_dpp,
graph_pagerank,
scd2_history,scd2_incremental,scd2_pit_join,cdc_apply,zorder_cluster,
agg_incremental,agg_skew_salted,
quantile_exact,quantile_exact_grouped,quantile_bins,
sketch_hll,sketch_countmin,sketch_topk,sketch_quantile,group_topk,
window_running,window_range,window_ntile,
timeseries_resample,timeseries_trend,
apply_fft,apply_moving_avg,reduce_avg,aggregate_sum,subset_index,
permute_reverse,mergecubes_concat,rollup_drilldown,intercube_sum,
workflow_massive
EOF
)

SPARK_GRAFT_SF_DIR="$REPLICA" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_WARM=/root/testdata/sf0.001 \
SPARK_GRAFT_FLOORS=WARM_FLOORS_100X.json \
SPARK_GRAFT_OUT_FULL=BENCH_100X.json \
SPARK_GRAFT_OUT_SUMMARY=BENCH_100X_SUMMARY.json \
SPARK_GRAFT_QUERIES="$QUERIES" \
sbt -batch "runMain graft.Bench"
