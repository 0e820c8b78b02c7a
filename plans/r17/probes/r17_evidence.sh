#!/bin/bash
# r17 round-end evidence chain — sequential, one Spark JVM at a time.
set -x
cd /root/repo

python tools/selfcheck.py --sf /root/testdata/sf0.01 2>/dev/null \
  | grep -E "^(PASS|FAIL|rows)|ok; fail" > SELFCHECK_r17_sf0.01_full.log
echo "=== sf0.01 done: $(tail -1 SELFCHECK_r17_sf0.01_full.log)"

python tools/selfcheck.py --sf /root/testdata/sf0.01 --driver-config 2>/dev/null \
  | grep -E "^(PASS|FAIL|rows|session)|ok; fail" > SELFCHECK_r17_sf0.01_full_driverconf.log
echo "=== sf0.01 driverconf done: $(tail -1 SELFCHECK_r17_sf0.01_full_driverconf.log)"

python tools/selfcheck.py --sf /root/testdata/sf0.1 2>/dev/null \
  | grep -E "^(PASS|FAIL|rows)|ok; fail" > SELFCHECK_r17_sf0.1_full.log
echo "=== sf0.1 done: $(tail -1 SELFCHECK_r17_sf0.1_full.log)"

python tools/scale_spotcheck.py --out SELFCHECK_r17_sf1.log --replicas 10 \
  dedup_jaccard_retention_curve dedup_minhash_eval dedup_cluster_components \
  dedup_ngram_jaccard dedup_near_minhash ann_ivf_kmeans graph_pagerank_topk \
  stream_stateful_profile emb_gram_matrix knn_hard_negatives 2>/dev/null >/dev/null
echo "=== sf1 spotcheck done"

python tools/scale_spotcheck.py --out SELFCHECK_r17_sf3.log --replicas 30 \
  dedup_jaccard_retention_curve dedup_minhash_eval dedup_exact_substring_spans \
  docs_dedup_lines_global dedup_near_minhash docs_eval_substring_contamination \
  dedup_ngram_jaccard stream_stateful_profile emb_gram_matrix knn_hard_negatives \
  2>/dev/null >/dev/null
echo "=== sf3 spotcheck done"

python tools/empty_probe.py 2>/dev/null > EMPTYPROBE_r17.log
echo "=== emptyprobe rc=$? : $(tail -1 EMPTYPROBE_r17.log)"

python -m pytest tests/ -x -q 2>/dev/null | tail -2 > /tmp/pytest_r17_end.log
echo "=== pytest done: $(cat /tmp/pytest_r17_end.log)"
