#!/bin/bash
# Round-15 RocksDB state-store arm (round-14 verdict item 3): run the full
# stateful streaming family (now incl. q87's flatMapGroupsWithState
# sessionizer) under BOTH providers at sf1, and the heavy three at sf10 one
# query per JVM (the on-heap provider retains finished queries' state maps
# until maintenance unloads them, so multi-query drives conflate footprints).
set -e
cd /root/repo
HEAVY="q44_stream_session_window q45_stream_dedup q87_stream_sessionize"

echo "[state] sf1 full family, hdfs provider"
SPARK_GRAFT_SF_DIR=target/sf1 sbt -batch "runMain graft.StreamStateBench" \
  > /tmp/state_sf1_hdfs.log 2>&1
echo "[state] sf1 full family, rocksdb provider"
SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_STATE_PROVIDER=rocksdb \
  sbt -batch "runMain graft.StreamStateBench" > /tmp/state_sf1_rocksdb.log 2>&1

for q in $HEAVY; do
  for prov in hdfs rocksdb; do
    echo "[state] sf10 $q $prov ($(date +%H:%M:%S))"
    { time SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_BENCH_ONLY="$q" \
      SPARK_GRAFT_STATE_PROVIDER=$prov \
      sbt -batch "runMain graft.StreamStateBench" \
      > /tmp/state_sf10_${q}_${prov}.log 2>&1 ; } 2> /tmp/state_sf10_${q}_${prov}.time
  done
done
echo "[state] done"
