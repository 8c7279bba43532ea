"""Round-5 batched on-device measurements — one process, one claim.

Runs, in order (most valuable first in case of a crash):
  1. poolstats city      (visit counts for the post-corr fused/shadow pools)
  2. correp_ab cornell   (CORR_REP 1/2/4 on the headline config)
  3. envsweep cornell    (block_rows 16 vs 32)
  4. poolstats cornell   (refresh)
"""
import sys
import time

import benchmarks.scratch.poolstats as poolstats
import benchmarks.scratch.correp_ab as correp_ab
import benchmarks.scratch.envsweep as envsweep


def run(label, mod, argv):
    print(f"\n===== {label}: {' '.join(argv)} =====", flush=True)
    sys.argv = [label] + argv
    t0 = time.time()
    try:
        mod.main()
    except Exception as e:  # keep going; later stages still valuable
        import traceback
        print(f"[{label}] FAILED: {e}", flush=True)
        traceback.print_exc()
    print(f"===== {label} done in {time.time()-t0:.0f}s =====", flush=True)


run("poolstats-city", poolstats, ["city"])
run("correp-cornell", correp_ab, ["cornell", "1280x720", "3"])
run("envsweep-cornell-rows", envsweep, ["cornell", "1280x720", "3",
                                        ";BLOCK_ROWS=32"])
run("poolstats-cornell", poolstats, ["cornell"])
print("ALL DONE", flush=True)
