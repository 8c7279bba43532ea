#!/bin/bash
# Round-3 TPU recovery pipeline: poll for a device claim; when it succeeds,
# run the queued device agenda in priority order, logging to $LOGDIR.
#   1. bench.py            — anykill (default-on) regression check
#   2. isect_ab city d4    — decides the VKRT_ISECT / VKRT_KEYPACK flips
#   3. isect_ab cornell d3 — headline-config sweep
LOGDIR=/tmp/vkrt_recovery
mkdir -p "$LOGDIR"
cd /root/repo || exit 1

echo "$(date -u) waiting for TPU" >> "$LOGDIR/driver.log"
for i in $(seq 1 2000); do
  if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u) TPU recovered (probe $i)" >> "$LOGDIR/driver.log"
    break
  fi
  sleep 45
  if [ "$i" = 2000 ]; then echo "$(date -u) gave up" >> "$LOGDIR/driver.log"; exit 1; fi
done

echo "$(date -u) bench start" >> "$LOGDIR/driver.log"
timeout 3600 python bench.py > "$LOGDIR/bench.json" 2> "$LOGDIR/bench.err"
echo "$(date -u) bench rc=$? $(cat "$LOGDIR/bench.json" 2>/dev/null)" >> "$LOGDIR/driver.log"

echo "$(date -u) city sweep start" >> "$LOGDIR/driver.log"
timeout 5400 python -m benchmarks.scratch.isect_ab city 1280x720 4 \
  > "$LOGDIR/city_sweep.log" 2>&1
echo "$(date -u) city sweep rc=$?" >> "$LOGDIR/driver.log"

echo "$(date -u) cornell sweep start" >> "$LOGDIR/driver.log"
timeout 5400 python -m benchmarks.scratch.isect_ab cornell 1280x720 3 \
  > "$LOGDIR/cornell_sweep.log" 2>&1
echo "$(date -u) cornell sweep rc=$?" >> "$LOGDIR/driver.log"
echo "$(date -u) DONE" >> "$LOGDIR/driver.log"

echo "$(date -u) reposebench start" >> "$LOGDIR/driver.log"
timeout 3600 python -m benchmarks.scratch.reposebench 6 \
  > "$LOGDIR/repose.log" 2>&1
echo "$(date -u) reposebench rc=$?" >> "$LOGDIR/driver.log"

echo "$(date -u) suite start" >> "$LOGDIR/driver.log"
timeout 7200 python -m benchmarks.suite > "$LOGDIR/suite.log" 2>&1
echo "$(date -u) suite rc=$?" >> "$LOGDIR/driver.log"
echo "$(date -u) ALL DONE" >> "$LOGDIR/driver.log"

# preserve results in the repo (the round driver auto-commits leftovers)
mkdir -p /root/repo/benchmarks/scratch/logs_r3
cp -f "$LOGDIR"/*.log "$LOGDIR"/bench.json /root/repo/benchmarks/scratch/logs_r3/ 2>/dev/null
echo "$(date -u) logs copied into repo" >> "$LOGDIR/driver.log"
cp -f "$LOGDIR/driver.log" /root/repo/benchmarks/scratch/logs_r3/
