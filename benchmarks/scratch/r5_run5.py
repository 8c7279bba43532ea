"""Round-5 window 5: city kernel-block re-sweep UNDER the sandwich path.

Pre-sandwich the city frame was shading-dominated, so block_rows moved it
<1% (envsweep window 2). With the gather-fed kernel the frame is
trace-launch heavy again and the pools run ~6 visits/block — per-program
fixed cost is now a live term, so 16/32-row programs (half/quarter the
programs per launch) get a fresh interleaved A/B.
"""
import sys
import time

import benchmarks.scratch.envsweep as envsweep


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


run("envsweep-city-rows-sandwich", envsweep,
    ["city", "1280x720", "4", ";BLOCK_ROWS=16;BLOCK_ROWS=32"])
print("ALL DONE", flush=True)
