#!/bin/bash
# Round-16: finish the sf10 state-store provider arms that round 15's
# bench window cut off (q44 rocksdb died mid-run; q45/q87 never started).
# One query per JVM — the on-heap provider retains finished queries' state
# maps until maintenance unloads them, so multi-query drives conflate
# footprints. Emits to tools/logs/ (committed), not /tmp (round 15's lesson).
set -e
cd /root/repo
mkdir -p tools/logs

run_arm() {
  local q=$1 prov=$2
  echo "[state] sf10 $q $prov ($(date +%H:%M:%S))"
  { time SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_BENCH_ONLY="$q" \
    SPARK_GRAFT_STATE_PROVIDER=$prov \
    sbt -batch "runMain graft.StreamStateBench" \
    > tools/logs/state_sf10_${q}_${prov}.log 2>&1 ; } \
    2> tools/logs/state_sf10_${q}_${prov}.time
}

run_arm q44_stream_session_window rocksdb
run_arm q45_stream_dedup hdfs
run_arm q45_stream_dedup rocksdb
run_arm q87_stream_sessionize hdfs
run_arm q87_stream_sessionize rocksdb
echo "[state] done"
