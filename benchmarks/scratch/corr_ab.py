"""Round-4: correlated per-block sampler A/B, interleaved in ONE process.

The bounce-pool trace is visit-count-bound (510 voted visits/block on the
city at 0.17-0.25 octant purity, STATUS r3); the correlated sampler shares
each block's lobe/light/hemisphere draws so its bounce directions cohere
and its NEE shadow rays target one light. This harness times whole
production frames with corr on/off alternately in one process (cross-
process throughput drifts +/-40% on this box).

Usage: python -m benchmarks.scratch.corr_ab [cornell|city|bigcity] [WxH] [depth]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod


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
    scene = {
        "cornell": scene_mod.load_cornell,
        "city": lambda: scene_mod.make_city(grid=96),
        "bigcity": lambda: scene_mod.make_city(grid=160),
    }[which]()

    from vkrt_tpu.models.pathtracer import pathtrace_frame
    from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
    from vkrt_tpu.ops.rng import tea
    from vkrt_tpu.utils.camera import Camera, pixel_coords, tile_perm

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    cam = Camera().matrices(w, h)
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    pt = make_pallas_tracer(scene)
    print(f"{which}: tris={scene.num_tris} resolve={pt.resolves_attrs} "
          f"cluster={pt.spec.cluster}", flush=True)

    fns = {}
    for name, corr in (("indep", False), ("corr", True)):
        def f(frame, corr=corr):
            seeds = tea(pid, jnp.uint32(frame))
            out, _ = pathtrace_frame(
                scene, pt, cam, frame, accum, clear, width=w, height=h,
                samples=1, depth=depth, corr=corr, pix=pix, seeds=seeds,
            )
            return jnp.sum(out[:, 0])

        fns[name] = jax.jit(f)

    frame = [1]

    def stepper(f):
        def g():
            frame[0] += 1
            return f(frame[0])
        return g

    for k, f in fns.items():
        t0 = time.perf_counter()
        jax.device_get(f(1))
        print(f"{k}: compile+frame0 {time.perf_counter() - t0:.1f}s",
              flush=True)
    acc = {k: [] for k in fns}
    for _ in range(4):
        for k, f in fns.items():
            acc[k].append(timeit(stepper(f)))
        print("  ".join(f"{k} {v[-1]:7.1f}" for k, v in acc.items())
              + "  ms", flush=True)
    base = min(acc["indep"])
    print(f"{which} depth={depth} best-of-4: " + "  ".join(
        f"{k} {min(v):.1f} ms ({min(v) / base:.3f}x)" for k, v in acc.items()
    ))


if __name__ == "__main__":
    main()
