"""Round-5 window 4: the sandwich A/B, with the jit-cache fix.

Window 3's sandwich_ab silently timed one executable twice (jax.jit
wrappers over the same callable share the trace cache — verified with a
minimal repro); variants are now distinct closures.
"""
import sys
import time

import benchmarks.scratch.sandwich_ab as sandwich_ab


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
print("ALL DONE", flush=True)
