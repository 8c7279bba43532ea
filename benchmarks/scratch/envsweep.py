"""Round-3: generalized interleaved env-knob sweep in ONE process.

Same rationale as isect_ab.py (this box's TPU-through-tunnel throughput
drifts +/-40% across process launches, so only same-process interleaved
frames are a trustworthy comparison), generalized to ANY set of the
trace module's import-time env knobs: each variant is an independent
module instance of ops/pallas/trace loaded under its own env, with its
own tracer + jitted production frame, and whole frames are timed
alternately round-robin.

Usage:
  python -m benchmarks.scratch.envsweep [cornell|city] [WxH] [depth] \
      "VARIANT;VARIANT;..."
where VARIANT is a comma-separated list of KEY=VAL env overrides, e.g.
  "CLUSTER=64;CLUSTER=128"
  "ISECT=bw;ISECT=bw,CLUSTER=128;ISECT=bw,BLOCK_ROWS=16"
(keys get the VKRT_ prefix automatically; the first variant is the
baseline for the ratio column; an empty string = current defaults).
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

KNOBS = ("VKRT_CLUSTER", "VKRT_BLOCK_ROWS", "VKRT_ISECT", "VKRT_KEYPACK",
         "VKRT_INC_VOTE", "VKRT_GROUP_GATE", "VKRT_PURE_ANY",
         "VKRT_DEFER_RESOLVE", "VKRT_ATTR_BUDGET")


def load_variant(spec: str):
    """'CLUSTER=128,ISECT=bw' -> independent trace-module instance."""
    overrides = {}
    for kv in filter(None, spec.split(",")):
        k, v = kv.split("=")
        k = k if k.startswith("VKRT_") else f"VKRT_{k}"
        assert k in KNOBS, k
        overrides[k] = v
    saved = {k: os.environ.get(k) for k in KNOBS}
    os.environ.update(overrides)
    try:
        name = "trace_" + spec.replace("=", "").replace(",", "_") or "base"
        spec_ = importlib.util.spec_from_file_location(name, T_BASE.__file__)
        mod = importlib.util.module_from_spec(spec_)
        # dataclasses (TraceSpec) resolve string annotations through
        # sys.modules[cls.__module__] — register the copy before exec
        sys.modules[name] = mod
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
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    variants = (sys.argv[4] if len(sys.argv) > 4
                else "CLUSTER=64;CLUSTER=128").split(";")
    w, h = (int(x) for x in res.split("x"))
    hybrid = which == "hybrid"  # hybrid effects on the city (the .any pool)
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
    accum4 = jnp.zeros((n, 4), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    fns = {}
    for spec in variants:
        mod = load_variant(spec)
        pt = mod.make_pallas_tracer(scene)
        print(f"[{spec or 'default'}] CLUSTER={mod.CLUSTER} "
              f"BLOCK_ROWS={mod.BLOCK_ROWS} ISECT={mod.ISECT} "
              f"KEYPACK={mod.KEYPACK} PURE_ANY={mod.PURE_ANY} "
              f"levels={pt.cs.level_counts} "
              f"resolve={pt.resolves_attrs}", flush=True)

        if hybrid:
            from vkrt_tpu.models.hybrid import hybrid_frame

            def f(pt=pt):
                _, out, _, _ = hybrid_frame(
                    scene, pt, cam, 1, accum4, clear, width=w, height=h,
                    depth=depth, use_shadows=True, use_ao=True,
                    use_gi=True, use_denoiser=False, pix=pix, seeds=seeds,
                    corr=True,  # production default (corr_sampler)
                )
                return jnp.sum(out[:, 0])
        else:
            def f(pt=pt):
                out, _ = pathtrace_frame(
                    scene, pt, cam, 1, accum, clear, width=w, height=h,
                    samples=1, depth=depth, pix=pix, seeds=seeds,
                    corr=True,  # production default (corr_sampler)
                )
                return jnp.sum(out[:, 0])

        fns[spec] = jax.jit(f)

    for k, f in fns.items():
        t0 = time.perf_counter()
        jax.device_get(f())
        print(f"[{k or 'default'}] compile+frame0 "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    acc = {k: [] for k in fns}
    for _ in range(4):
        for k, f in fns.items():
            acc[k].append(timeit(f))
        print("  ".join(f"[{k}] {v[-1]:7.1f}" for k, v in acc.items())
              + "  ms", flush=True)
    base = min(acc[variants[0]])
    print(f"{which} frame depth={depth} best-of-4: " + "  ".join(
        f"[{k or 'default'}] {min(v):.1f} ms ({min(v) / base:.3f}x)"
        for k, v in acc.items()
    ))


if __name__ == "__main__":
    main()
