"""Round-3: where does the incoherent-pool trace time go?

Takes the REAL city/cornell d=1 bounce pool (poolstats machinery) and runs
the production-structure kernel variants on it:

  scan_only  — static super-word votes only (the fixed per-program floor)
  votes_only — + per-voted-super cluster vote words (no triangle work)
  flat       — + cluster visits (tile extraction + row-gated-less MT)

flat vs the production closest_packed_plain (sortceiling asis) also shows
what row-gating + packed IO add/save. The deltas attribute the ~320 ms/
bounce city fused trace to votes vs visits.

Usage: python -m benchmarks.scratch.votecheck [cornell|city]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys

import numpy as np
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer, LANES
from benchmarks.scratch.poolstats import pools
from benchmarks.scratch.variants import make_call, slope_time


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "city"
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    pt = make_pallas_tracer(scene)
    print(f"{which}: tris={scene.num_tris} levels={pt.cs.level_counts}")

    for label, packed in pools(scene, pt, 1280, 720, 3):
        if not label.startswith("bounce d=1"):
            continue
        p = np.asarray(packed)
        o = jnp.asarray(np.stack(
            [p[:, k * LANES:(k + 1) * LANES].ravel() for k in range(3)], -1))
        d = jnp.asarray(np.stack(
            [p[:, k * LANES:(k + 1) * LANES].ravel() for k in range(3, 6)], -1))
        for v in ["scan_only", "votes_only", "flat"]:
            call = make_call(pt.cs, v)
            dt = slope_time(call, o, d)
            print(f"  {label} {v:10s}: {dt * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
