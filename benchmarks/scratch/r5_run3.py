"""Round-5 batched on-device measurements, window 3 — one process, one claim.

The gather-fed shade kernel ("sandwich") landed: plain trace + XLA
attr-gather feeder + packed BSDF/NEE kernel for city-scale and
baseColor-only-textured scenes. This window measures it where it was
built to win, and records the gather-vs-math split of the old stage:

  1. sandwich_ab city d4    (XLA shading vs gather-fed kernel, interleaved)
  2. sandwich_ab cornell d3 (regression guard: resolve+kernel path with the
                             new albedo plumbing must not regress)
  3. stagebench3 city       (gathers vs BSDF math vs texture split)
"""
import sys
import time

import benchmarks.scratch.sandwich_ab as sandwich_ab
import benchmarks.scratch.stagebench3 as stagebench3


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


run("sandwich-city", sandwich_ab, ["city", "1280x720", "4"])
run("sandwich-cornell", sandwich_ab, ["cornell", "1280x720", "3"])
run("stagebench3-city", stagebench3, ["city"])
print("ALL DONE", flush=True)
