#!/bin/bash
# Interleaved A/B at 10.5M turns (VERDICT r6 items #1/#2/#3/#6):
# alternate the round-6 engine (git worktree @ e83c4a8, running the
# SAME extended ladder script) with the round-7 tree, >= 2 reps per
# side, fully serialized — one Spark session at a time. The ladder
# covers kernel/distributed/filtered/boolean/near/fuzzy/wildcard/
# query_string/suggest/sorted, REPS=3 min per surface.
set -u
CONVS=${CONVS:-1500000}
LOG=${LOG:-/root/repo/BENCH/ab_r6_r7_10m.log}
echo "# interleaved A/B, $CONVS convs, $(date -u +%FT%TZ)" >> "$LOG"
for rep in 1 2; do
  for side in r6 r7; do
    dir=/root/repo
    [ "$side" = r6 ] && dir=/tmp/wt_r6
    echo "## rep=$rep side=$side $(date -u +%FT%TZ)" >> "$LOG"
    (cd "$dir" && python scripts/bench_query_scale.py "$CONVS" 2>/dev/null \
      | grep -a '^{' | sed "s/^/{\"side\": \"$side\", \"rep\": $rep, /; s/{\"side\": \"$side\", \"rep\": $rep, {/{\"side\": \"$side\", \"rep\": $rep, /" ) >> "$LOG"
  done
done
echo "# done $(date -u +%FT%TZ)" >> "$LOG"
