"""Round-3: trace-kernel variant sweep, interleaved in ONE process.

Variants (import-time env switches on ops/pallas/trace):
  mt      Möller-Trumbore (round-3 production)
  bw      Baldwin-Weber precomputed transform (VKRT_ISECT=bw)
  mt+kp   MT + key-packed plain winner selection (VKRT_KEYPACK=1)
  bw+kp   both

The incoherent-pool trace is VPU-ALU-bound on per-visit intersection math
(510 visits/block on the city; STATUS round-3), so per-pair op count ~
frame time. This box's TPU-through-tunnel throughput drifts +/-40% across
processes, so the ONLY trustworthy comparison is same-process interleaved
timing: each variant is a SECOND independent instance of the trace module
(own module dict — importlib.reload would mutate the first one's globals
in place and break its live tracers), and whole production frames are
jitted per variant and timed alternately.

Usage: python -m benchmarks.scratch.isect_ab [cornell|city] [WxH] [depth] \
           [variants, default "mt,bw,mt+kp,bw+kp"]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import importlib.util
import os
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
import vkrt_tpu.ops.pallas.trace as T_BASE


def load_variant(spec):
    """'mt', 'bw', 'mt+kp', 'bw+kp' -> independent trace-module instance."""
    isect = "bw" if spec.startswith("bw") else "mt"
    kp = spec.endswith("+kp")
    saved = {k: os.environ.get(k) for k in ("VKRT_ISECT", "VKRT_KEYPACK")}
    os.environ["VKRT_ISECT"] = isect
    os.environ["VKRT_KEYPACK"] = "1" if kp else "0"
    try:
        spec_ = importlib.util.spec_from_file_location(
            f"trace_{spec.replace('+', '_')}", T_BASE.__file__
        )
        mod = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


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
    variants = (sys.argv[4] if len(sys.argv) > 4
                else "mt,bw,mt+kp,bw+kp").split(",")
    w, h = (int(x) for x in res.split("x"))
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))

    from vkrt_tpu.models.pathtracer import pathtrace_frame
    from vkrt_tpu.ops.rng import tea
    from vkrt_tpu.utils.camera import Camera, pixel_coords, tile_perm

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    seeds = tea(pid, jnp.uint32(1))
    cam = Camera().matrices(w, h)
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    fns = {}
    for spec in variants:
        mod = T_BASE if spec == "mt" else load_variant(spec)
        pt = mod.make_pallas_tracer(scene)
        if spec == variants[0]:
            print(f"{which}: tris={scene.num_tris} "
                  f"resolve={pt.resolves_attrs}", flush=True)

        def f(pt=pt):
            out, _ = pathtrace_frame(
                scene, pt, cam, 1, accum, clear, width=w, height=h,
                samples=1, depth=depth, pix=pix, seeds=seeds,
            )
            return jnp.sum(out[:, 0])

        fns[spec] = jax.jit(f)

    for k, f in fns.items():
        t0 = time.perf_counter()
        jax.device_get(f())
        print(f"{k}: compile+frame0 {time.perf_counter() - t0:.1f}s",
              flush=True)
    acc = {k: [] for k in fns}
    for _ in range(4):
        for k, f in fns.items():
            acc[k].append(timeit(f))
        print("  ".join(f"{k} {v[-1]:7.1f}" for k, v in acc.items())
              + "  ms", flush=True)
    base = min(acc[variants[0]])
    print(f"frame depth={depth} best-of-4: " + "  ".join(
        f"{k} {min(v):.1f} ms ({min(v) / base:.3f}x)" for k, v in acc.items()
    ))


if __name__ == "__main__":
    main()
