#!/bin/bash
# Interleaved bench A/B between r13 HEAD (worktree at .worktrees/r13) and the
# current HEAD, all sessions inside ONE host window (round-14 verdict item 1:
# attribute the two-round s/query drift to host contention vs code).
#
# Pattern: A B A B — each letter a full 2-pass graft.Bench session at sf0.1.
# Per-side record = per-query min folded across that side's 4 passes (the
# same de-noising rule as every BENCH_LOCAL record). Because the sessions
# interleave, any host-level contention hits both sides equally; a per-query
# delta that survives the fold is CODE, not host.
#
# Usage: bash tools/bench_ab.sh [out_prefix]   (default /tmp/ab)
set -e
OUT="${1:-/tmp/ab}"
# run() cd's into each side's checkout, so a relative OUT silently points
# somewhere else (or nowhere) inside the worktree — force absolute
case "$OUT" in /*) ;; *) OUT="$(pwd)/$OUT" ;; esac
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

echo "[ab] pre-building both HEADs"
(cd /root/repo/.worktrees/r13 && sbt -batch compile >/dev/null)
(cd /root/repo && sbt -batch compile >/dev/null)

run() { # side dir iteration
  local side="$1" dir="$2" i="$3"
  echo "[ab] session ${side}${i} ($(date +%H:%M:%S))"
  (cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" \
    > "${OUT}_${side}${i}.log" 2>&1)
  cp "$dir/target/bench_times.json" "${OUT}_${side}${i}.json"
}

for i in 1 2; do
  run r13 /root/repo/.worktrees/r13 "$i"
  run cur /root/repo "$i"
done
echo "[ab] done: ${OUT}_{r13,cur}{1,2}.json"
