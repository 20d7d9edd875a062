#!/bin/bash
# Round-16 (round-14 verdict item 5, second carry-over): the q58 growth-law
# midpoint. The sf1 (2k vectors) -> sf10 (200k vectors) pair shows 30x at
# 100x vectors, attributed to the ~64*n*tables pair-budget law plus fixed
# costs the 2k arms amortize poorly; a measured ~20k-vector midpoint makes
# the law a three-point data row instead of a prose argument.
# target/sf10mid was generated in round 15 (same generator lineage as
# sf1/sf10, 20,000 embeddings) but never measured.
set -e
cd /root/repo
Q=q58_dedup_embedding_lsh
mkdir -p tools/logs

echo "[q58mid] verify at sf10mid"
rm -rf /tmp/verify_sf10mid
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/sf10mid /tmp/verify_sf10mid $Q" 2>&1 | grep "\[verify\]" || true
python3 tools/compare_oracle.py target/sf10mid /tmp/verify_sf10mid \
  | tee tools/logs/q58_sf10mid_compare.log

echo "[q58mid] bench at sf10mid (2-pass, min of passes is the record)"
SPARK_GRAFT_SF_DIR=target/sf10mid SPARK_GRAFT_BENCH_ONLY="$Q" \
  sbt -batch "runMain graft.Bench" > tools/logs/q58_sf10mid_bench.log 2>&1
grep -E '"metric"' tools/logs/q58_sf10mid_bench.log | tail -4
echo "[q58mid] done"
