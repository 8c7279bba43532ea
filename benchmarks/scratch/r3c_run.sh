#!/bin/bash
# Round-3 third device agenda: waits for the r3b pipeline (PID in
# /tmp/r3b.pid) to release the chip, then A/Bs the deferred winner
# resolve (VKRT_DEFER_RESOLVE) on the Cornell headline config — the
# resolve-path attr machinery is ~half the bounce-trace cost there,
# and phase-B gating should reclaim most of it.
LOGDIR=/tmp/vkrt_r3c
mkdir -p "$LOGDIR"
cd /root/repo || exit 1

if [ -f /tmp/r3b.pid ]; then
  P=$(cat /tmp/r3b.pid)
  echo "$(date -u) waiting on r3b pid $P" >> "$LOGDIR/driver_r3c.log"
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

echo "$(date -u) defer sweep start" >> "$LOGDIR/driver_r3c.log"
timeout 7200 python -m benchmarks.scratch.envsweep cornell 1280x720 3 \
  "DEFER_RESOLVE=0;DEFER_RESOLVE=1" > "$LOGDIR/defer_sweep.log" 2>&1
echo "$(date -u) defer sweep rc=$?" >> "$LOGDIR/driver_r3c.log"

# city is a plain-trace scene (no resolve) — no defer leg there.
echo "$(date -u) ALL DONE" >> "$LOGDIR/driver_r3c.log"
mkdir -p /root/repo/benchmarks/scratch/logs_r3
cp -f "$LOGDIR"/*.log /root/repo/benchmarks/scratch/logs_r3/ 2>/dev/null
