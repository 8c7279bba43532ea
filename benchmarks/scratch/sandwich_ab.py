"""Round-5 gather-fed shade-kernel ("sandwich") A/B on city-class scenes.

stagebench2 attributed ~60% of the city frame to the composed XLA shading
stage (+106 ms/bounce); the sandwich moves the BSDF/NEE/carry math into
the packed shade kernel, leaving only the attribute gathers + baseColor
fetch in XLA (ops/pallas/shade.py round-5 modes). VKRT_SHADE_KERNEL is
read at trace time, so both variants jit in ONE process (interleaved
frames — the only trustworthy comparison on this box).

Usage: python -m benchmarks.scratch.sandwich_ab [city|cornell] [WxH] [depth]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.models.pathtracer import pathtrace_frame
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.utils.camera import Camera, pixel_coords, tile_perm


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
    w, h = (int(x) for x in res.split("x"))
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    pt = make_pallas_tracer(scene)
    print(f"{which}: {scene.num_tris} tris resolve={pt.resolves_attrs}",
          flush=True)

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    seeds = tea(pid, jnp.uint32(1))
    cam = Camera().matrices(w, h)
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    fns, spot = {}, {}
    for flag in ("0", "1"):
        os.environ["VKRT_SHADE_KERNEL"] = flag

        # distinct function object per variant: jax.jit caches by callable
        # identity, so jitting ONE shared closure twice would silently hand
        # variant B variant A's executable (observed: bit-identical sums
        # and a 0.6 s "compile")
        def make_frame():
            def frame():
                out, _ = pathtrace_frame(
                    scene, pt, cam, 1, accum, clear, width=w, height=h,
                    samples=1, depth=depth, pix=pix, seeds=seeds, corr=True,
                )
                return jnp.sum(out[:, 0])
            return frame

        f = jax.jit(make_frame())
        t0 = time.perf_counter()
        s = jax.device_get(f())  # traces under this flag
        assert np.isfinite(s), f"non-finite frame sum under flag {flag}"
        spot[flag] = float(s)
        print(f"[kernel={flag}] compile+frame0 {time.perf_counter()-t0:.1f}s"
              f"  sum={s:.4f}", flush=True)
        fns[flag] = f
    os.environ.pop("VKRT_SHADE_KERNEL", None)
    rel = abs(spot["0"] - spot["1"]) / max(abs(spot["0"]), 1e-9)
    print(f"frame-sum rel diff xla-vs-kernel: {rel:.2e}", flush=True)

    acc = {k: [] for k in fns}
    for _ in range(4):
        for k, f in fns.items():
            acc[k].append(timeit(f))
        print("  ".join(f"[kernel={k}] {v[-1]:7.1f}" for k, v in acc.items())
              + "  ms", flush=True)
    base = min(acc["0"])
    print(f"{which} d{depth} best-of-4: " + "  ".join(
        f"[kernel={k}] {min(v):.1f} ms ({min(v)/base:.3f}x)"
        for k, v in acc.items()))


if __name__ == "__main__":
    main()
