"""In-process A/B of incremental near-to-far cluster votes (inc_vote).

Cross-process readings on this box drift +/-40% (device/tunnel state), so
both variants are jitted and timed in ONE process, interleaved, on the
REAL pools (poolstats machinery).

Usage: python -m benchmarks.scratch.incvote_ab [cornell|city]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.intersect import T_MIN
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from benchmarks.scratch.poolstats import pools


def timeit(fn, iters=8):
    out = fn()
    assert out.size <= 16
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "city"
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    pt = make_pallas_tracer(scene)
    pt0 = pt._replace(inc_vote=False)
    pt1 = pt._replace(inc_vote=True)
    print(f"{which}: tris={scene.num_tris} levels={pt.cs.level_counts}")

    for label, packed in pools(scene, pt, 1280, 720, 3):
        if label not in ("primary", "bounce d=1", "bounce d=2"):
            continue
        use_res = pt.resolves_attrs

        def mk(p):
            if use_res:
                return jax.jit(
                    lambda r=packed, p=p: jnp.sum(
                        p.closest_packed(r, T_MIN)[:, :128]
                    )
                )
            return jax.jit(
                lambda r=packed, p=p: jnp.sum(
                    p.closest_packed_plain(r, T_MIN)[:, :128]
                )
            )

        f0, f1 = mk(pt0), mk(pt1)
        # interleave: warm both, then alternate measurement batches
        a0, a1 = timeit(f0), timeit(f1)
        b0, b1 = timeit(f0), timeit(f1)
        print(f"  {label:11s}: inc=0 {min(a0, b0):7.1f} ms   "
              f"inc=1 {min(a1, b1):7.1f} ms   "
              f"(runs {a0:.0f}/{b0:.0f} vs {a1:.0f}/{b1:.0f})")


if __name__ == "__main__":
    main()
