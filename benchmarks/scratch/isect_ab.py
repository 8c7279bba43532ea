"""Round-3: Möller-Trumbore vs Baldwin-Weber intersector, interleaved A/B.

The incoherent-pool trace is VPU-ALU-bound on per-visit intersection math
(510 visits/block on the city; STATUS round-3), so the per-pair op count is
~frame time. Baldwin-Weber precomputes a world->barycentric transform per
triangle (12 floats vs 9): trace-time work drops from 3 cross products + 2
dots to one plane solve + two affine evaluations.

This box's TPU-through-tunnel throughput drifts +/-40% across processes, so
the ONLY trustworthy comparison is same-process interleaved timing. ISECT
is an import-time switch; we load a SECOND, independent instance of the
trace module (own module dict — importlib.reload would mutate the first
one's globals in place and break its live tracer) with VKRT_ISECT=bw and
interleave both kernels on the SAME captured production pools.

Usage: python -m benchmarks.scratch.isect_ab [cornell|city] [WxH] [depth]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import importlib.util
import os
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
import vkrt_tpu.ops.pallas.trace as T_MT


def load_variant(isect):
    old = os.environ.get("VKRT_ISECT")
    os.environ["VKRT_ISECT"] = isect
    try:
        spec = importlib.util.spec_from_file_location(
            f"trace_{isect}", T_MT.__file__
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        if old is None:
            os.environ.pop("VKRT_ISECT", None)
        else:
            os.environ["VKRT_ISECT"] = old


def timeit(fn, iters=6):
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
    res = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    w, h = (int(x) for x in res.split("x"))
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))

    assert T_MT.ISECT == "mt"
    T_BW = load_variant("bw")
    pt_mt = T_MT.make_pallas_tracer(scene)
    pt_bw = T_BW.make_pallas_tracer(scene)
    print(f"{which}: tris={scene.num_tris} resolve_mt={pt_mt.resolves_attrs} "
          f"resolve_bw={pt_bw.resolves_attrs}", flush=True)

    # Whole PRODUCTION frames, one jit program per variant (pool-level
    # timing needed dozens of eager compiles through the tunnel and hung
    # on the compile service; the frame is also the number that matters).
    from vkrt_tpu.models.pathtracer import pathtrace_frame
    from vkrt_tpu.ops.rng import tea
    from vkrt_tpu.utils.camera import (
        Camera, pixel_coords, tile_perm,
    )

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    seeds = tea(pid, jnp.uint32(1))
    cam = Camera().matrices(w, h)
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    def frame_fn(pt):
        def f():
            out, _ = pathtrace_frame(
                scene, pt, cam, 1, accum, clear, width=w, height=h,
                samples=1, depth=depth, pix=pix, seeds=seeds,
            )
            return jnp.sum(out[:, 0])
        return jax.jit(f)

    fns = {"mt": frame_fn(pt_mt), "bw": frame_fn(pt_bw)}
    acc = {k: [] for k in fns}
    for k, f in fns.items():
        t0 = time.perf_counter()
        jax.device_get(f())
        print(f"{k}: compile+frame0 {time.perf_counter() - t0:.1f}s",
              flush=True)
    for _ in range(4):
        for k, f in fns.items():
            acc[k].append(timeit(f))
        print("  ".join(f"{k} {v[-1]:7.1f} ms" for k, v in acc.items()),
              flush=True)
    print(f"frame depth={depth}: mt {min(acc['mt']):.1f} ms  "
          f"bw {min(acc['bw']):.1f} ms  -> bw/mt = "
          f"{min(acc['bw']) / min(acc['mt']):.3f}")


if __name__ == "__main__":
    main()
