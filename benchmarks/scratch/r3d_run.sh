#!/bin/bash
# Round-3 fourth device agenda: after the defer A/B (r3c), collect
#   1. vpupeak    — VPU speed-of-light for the roofline note
#   2. reposebench — re-measure re-pose cost after the fused-dispatch
#                    refit (host mirrors + one jitted scatter)
LOGDIR=/tmp/vkrt_r3d
mkdir -p "$LOGDIR"
cd /root/repo || exit 1

if [ -f /tmp/r3c.pid ]; then
  P=$(cat /tmp/r3c.pid)
  echo "$(date -u) waiting on r3c pid $P" >> "$LOGDIR/driver_r3d.log"
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

echo "$(date -u) vpupeak start" >> "$LOGDIR/driver_r3d.log"
timeout 3600 python -m benchmarks.scratch.vpupeak > "$LOGDIR/vpupeak.log" 2>&1
echo "$(date -u) vpupeak rc=$?" >> "$LOGDIR/driver_r3d.log"

echo "$(date -u) reposebench start" >> "$LOGDIR/driver_r3d.log"
timeout 3600 python -m benchmarks.scratch.reposebench 6 \
  > "$LOGDIR/repose2.log" 2>&1
echo "$(date -u) reposebench rc=$?" >> "$LOGDIR/driver_r3d.log"

echo "$(date -u) ALL DONE" >> "$LOGDIR/driver_r3d.log"
mkdir -p /root/repo/benchmarks/scratch/logs_r3
cp -f "$LOGDIR"/*.log /root/repo/benchmarks/scratch/logs_r3/ 2>/dev/null
