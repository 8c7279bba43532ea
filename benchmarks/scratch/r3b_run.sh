#!/bin/bash
# Round-3 second device agenda (after the recovery pipeline's bench +
# isect sweeps): decide the remaining default flips and collect the
# still-missing round-3 evidence, in priority order:
#   1. bench.py                 — regression check with PURE_ANY default-on
#                                 (the depth-3 headline's last bounce rides
#                                 the specialized pure-any row path)
#   2. envsweep hybrid PURE_ANY — decides VKRT_PURE_ANY (hybrid shadow/AO
#                                 visibility batch is the big .any consumer)
#   3. envsweep cornell CLUSTER — 64 vs 128 on the headline config (city
#                                 already measured: 128 wins 1.7%)
#   4. reposebench              — VERDICT item 9 evidence (re-pose ms)
#   5. full suite               — round-3 final table
LOGDIR=/tmp/vkrt_r3b
mkdir -p "$LOGDIR"
cd /root/repo || exit 1

echo "$(date -u) waiting for TPU" >> "$LOGDIR/driver_r3b.log"
for i in $(seq 1 400); do
  if timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u) TPU claim ok (probe $i)" >> "$LOGDIR/driver_r3b.log"
    break
  fi
  sleep 45
  if [ "$i" = 400 ]; then echo "$(date -u) gave up" >> "$LOGDIR/driver_r3b.log"; exit 1; fi
done

echo "$(date -u) bench start" >> "$LOGDIR/driver_r3b.log"
timeout 3600 python bench.py > "$LOGDIR/bench.json" 2> "$LOGDIR/bench.err"
echo "$(date -u) bench rc=$? $(cat "$LOGDIR/bench.json" 2>/dev/null)" >> "$LOGDIR/driver_r3b.log"

echo "$(date -u) pureany hybrid sweep start" >> "$LOGDIR/driver_r3b.log"
timeout 7200 python -m benchmarks.scratch.envsweep hybrid 1280x720 4 \
  "PURE_ANY=0;PURE_ANY=1" > "$LOGDIR/pureany_sweep.log" 2>&1
echo "$(date -u) pureany sweep rc=$?" >> "$LOGDIR/driver_r3b.log"

echo "$(date -u) cornell cluster sweep start" >> "$LOGDIR/driver_r3b.log"
timeout 5400 python -m benchmarks.scratch.envsweep cornell 1280x720 3 \
  "CLUSTER=64;CLUSTER=128" > "$LOGDIR/cluster_cornell.log" 2>&1
echo "$(date -u) cornell cluster rc=$?" >> "$LOGDIR/driver_r3b.log"

echo "$(date -u) reposebench start" >> "$LOGDIR/driver_r3b.log"
timeout 3600 python -m benchmarks.scratch.reposebench 6 \
  > "$LOGDIR/repose.log" 2>&1
echo "$(date -u) reposebench rc=$?" >> "$LOGDIR/driver_r3b.log"

echo "$(date -u) suite start" >> "$LOGDIR/driver_r3b.log"
timeout 10800 python -m benchmarks.suite > "$LOGDIR/suite.log" 2>&1
echo "$(date -u) suite rc=$?" >> "$LOGDIR/driver_r3b.log"
echo "$(date -u) ALL DONE" >> "$LOGDIR/driver_r3b.log"

mkdir -p /root/repo/benchmarks/scratch/logs_r3
cp -f "$LOGDIR"/*.log /root/repo/benchmarks/scratch/logs_r3/ 2>/dev/null
cp -f "$LOGDIR/bench.json" /root/repo/benchmarks/scratch/logs_r3/bench_r3b.json 2>/dev/null
echo "$(date -u) logs copied into repo" >> "$LOGDIR/driver_r3b.log"
cp -f "$LOGDIR/driver_r3b.log" /root/repo/benchmarks/scratch/logs_r3/
