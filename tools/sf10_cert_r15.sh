#!/bin/bash
# Round-15 sf10 certificate extension (round-14 verdict item 2): the
# remaining top-cost plans with no 100x arm. Runs each query value-exact
# vs DuckDB at target/sf10, then 2-pass benches at sf1 and sf10 for the
# growth rows.
set -e
Q="q300_bitext_margin,q137_recursive_cte,q176_mad_outliers,q270_substring_dedup,q283_substring_curation,q305_winnowing,q150_training_pipeline,q141_interpolate_fill,q109_star_clusters,q242_incremental_clusters,q362_graph_walk_ann"

cd /root/repo
echo "[cert] verify at sf10"
rm -rf /tmp/verify_sf10_r15
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/sf10 /tmp/verify_sf10_r15 $Q" 2>&1 | grep "\[verify\]" || true
python3 tools/compare_oracle.py target/sf10 /tmp/verify_sf10_r15

for SF in target/sf1 target/sf10; do
  tag=$(basename "$SF")
  echo "[cert] bench at $tag"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$Q" \
    sbt -batch "runMain graft.Bench" > /tmp/cert_bench_${tag}.log 2>&1
  cp target/bench_times.json /tmp/cert_bench_${tag}.json
done
echo "[cert] done"
