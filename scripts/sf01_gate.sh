#!/bin/bash
# Extended 10x oracle gate: every round-4 query whose DuckDB oracle is
# linear-ish in the input (quadratic brute-force oracles -- minhash
# true-Jaccard, dbscan eps-pairs, phash pair closure, semdedup
# cell-pairs -- stay at the sf0.01 driver gate by design: the ENGINE
# side is benched at sf0.1+ by bench.py / the scale probes; the oracle
# is deliberately brute-force and does not scale).
# Runs one query per process so a slow row can't hide the others.
set -u
Q="${@:-mixture_sample mixture_tokens pack_sequences pack_patches \
shard_by_bytes zonal_stats zonal_overlap boilerplate decontaminate \
tfidf_terms cms_registers cms_lookup quantiles_exact weighted_sample \
bloom_registers bloom_contains interval_join gap_fill exact_substr \
exact_substr_trim sessionize session_stats asof_join funnel retention \
events_pivot percentiles topk_per_group json_extract rolling_window \
session_window lm_score mask_pii aspect_bucket char_entropy \
histogram hll_registers sample_hash assign_split stratified_sample \
clip_filter clip_topq clip_threshold clip_calibrated write_sharded \
chunk_docs zorder_key zorder_scan}"
for q in $Q; do
  echo "--- $q"
  timeout 900 python scripts/check_correctness.py /root/testdata/sf0.1 "$q" \
    2>&1 | grep -E "MATCH|MISMATCH|rror" | head -3
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && echo "--- $q FAILED rc=$rc (124 = timeout)"
done
