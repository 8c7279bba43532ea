"""Round-5 batched on-device measurements, window 2 — one process, one claim.

Window 1 found: post-corr pools run at ~6 visits/block (was 510), CORR_REP
is a no-op (39.8/40.0/39.9 ms) and rows=32 a 6.2% loss — the frame is
bound by per-visit kernel work and stage composition now, not footprint or
program count. This window re-decides the pre-corr optima and attributes
the time the isolated stage timings do not explain:

  1. stagebench2 city     (cumulative pipelines: find the ~70 ms/bounce gap)
  2. stagebench2 cornell  (same on the headline)
  3. envsweep city d4     (CLUSTER 128 vs 64 vs +rows16, post-corr re-decide)
  4. envsweep cornell d3  (resolve+shade-kernel vs plain+XLA pipeline, and
                           deferred resolve, both stale pre-corr decisions)
  5. poolstats cornell    (post-corr visit counts; crashed in window 1 on a
                           stale shade_call kwarg, now fixed)
"""
import sys
import time

import benchmarks.scratch.stagebench2 as stagebench2
import benchmarks.scratch.envsweep as envsweep
import benchmarks.scratch.poolstats as poolstats


def run(label, mod, argv):
    print(f"\n===== {label}: {' '.join(argv)} =====", flush=True)
    sys.argv = [label] + argv
    t0 = time.time()
    try:
        mod.main()
    except Exception as e:
        import traceback
        print(f"[{label}] FAILED: {e}", flush=True)
        traceback.print_exc()
    print(f"===== {label} done in {time.time()-t0:.0f}s =====", flush=True)


run("stagebench2-city", stagebench2, ["city"])
run("stagebench2-cornell", stagebench2, ["cornell"])
run("envsweep-city", envsweep,
    ["city", "1280x720", "4",
     "CLUSTER=128;CLUSTER=64;CLUSTER=64,BLOCK_ROWS=16;BLOCK_ROWS=16"])
run("envsweep-cornell", envsweep,
    ["cornell", "1280x720", "3", ";ATTR_BUDGET=1;DEFER_RESOLVE=1"])
run("poolstats-cornell", poolstats, ["cornell"])
print("ALL DONE", flush=True)
