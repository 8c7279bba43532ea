#!/bin/bash
# Round-3 fifth device agenda:
#   1. vpupeak (fixed: in-kernel fori so per-program overhead is noise)
#   2. reposebench with the pull-cache refit (steady-state line)
#   3. bench.py — final headline with the round's final defaults
LOGDIR=/tmp/vkrt_r3e
mkdir -p "$LOGDIR"
cd /root/repo || exit 1

if [ -f /tmp/r3d.pid ]; then
  P=$(cat /tmp/r3d.pid)
  echo "$(date -u) waiting on r3d pid $P" >> "$LOGDIR/driver_r3e.log"
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi

echo "$(date -u) vpupeak start" >> "$LOGDIR/driver_r3e.log"
timeout 3600 python -m benchmarks.scratch.vpupeak > "$LOGDIR/vpupeak2.log" 2>&1
echo "$(date -u) vpupeak rc=$?" >> "$LOGDIR/driver_r3e.log"

echo "$(date -u) reposebench start" >> "$LOGDIR/driver_r3e.log"
timeout 3600 python -m benchmarks.scratch.reposebench 8 \
  > "$LOGDIR/repose3.log" 2>&1
echo "$(date -u) reposebench rc=$?" >> "$LOGDIR/driver_r3e.log"

echo "$(date -u) bench start" >> "$LOGDIR/driver_r3e.log"
timeout 3600 python bench.py > "$LOGDIR/bench_final.json" 2> "$LOGDIR/bench.err"
echo "$(date -u) bench rc=$? $(cat "$LOGDIR/bench_final.json" 2>/dev/null)" >> "$LOGDIR/driver_r3e.log"

echo "$(date -u) ALL DONE" >> "$LOGDIR/driver_r3e.log"
mkdir -p /root/repo/benchmarks/scratch/logs_r3
cp -f "$LOGDIR"/*.log "$LOGDIR"/bench_final.json /root/repo/benchmarks/scratch/logs_r3/ 2>/dev/null
