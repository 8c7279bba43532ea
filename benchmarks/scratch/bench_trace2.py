"""Marginal-cost bench of the unified vote-tree trace kernel.

Measures the in-loop (slope) cost of one closest pass — excluding the axon
tunnel's per-dispatch/fetch latency — for four ray regimes:
  primary-scanline   (round-1 layout: 1024x1 pixel stripes per block)
  primary-tiled      (round-2 layout: 32x32 pixel tiles per block)
  incoherent         (random origins in scene bbox, random directions)
  incoherent-sorted  (same rays through the SortingTracer)

Usage: python -m benchmarks.scratch.bench_trace2 [cornell|city]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.sort_rays import make_sorting_tracer
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.utils.camera import Camera, generate_rays, pixel_coords, tile_perm


def slope_time(fn, o, d, reps_hi=8):
    def mk(reps):
        @jax.jit
        def run():
            def body(i, carry):
                oo, dd = carry
                out = fn(oo, dd)
                oo = jax.lax.optimization_barrier(oo + 1e-30 * out[:, None])
                return oo, dd
            oo, _ = jax.lax.fori_loop(0, reps, body, (o, d))
            return oo[0]
        return run
    f1, f8 = mk(1), mk(reps_hi)
    jax.device_get(f1()); jax.device_get(f8())
    t0 = time.perf_counter(); jax.device_get(f1()); t1 = time.perf_counter()
    jax.device_get(f8()); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps_hi - 1)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    scene = scene_mod.load_cornell() if which == "cornell" else scene_mod.make_city(grid=96)
    tracer = make_pallas_tracer(scene)
    sorter = make_sorting_tracer(tracer, scene)
    print(f"{which}: tris={scene.num_tris} clusters={tracer.cs.n_clusters} "
          f"levels={tracer.cs.level_counts}")

    W, H = 1280, 720
    n = (W * H) // 1024 * 1024
    cam = Camera().matrices(W, H)
    o_p, d_p = generate_rays(cam, W, H, jnp.full((W * H, 2), 0.5, jnp.float32))
    perm, _ = tile_perm(W, H)
    o_t = jnp.take(o_p, jnp.asarray(perm), axis=0)[:n]
    d_t = jnp.take(d_p, jnp.asarray(perm), axis=0)[:n]
    o_p, d_p = o_p[:n], d_p[:n]

    rng = np.random.default_rng(0)
    v0 = np.asarray(scene.tri_v0)
    lo, hi = v0.min(0), v0.max(0)
    o_i = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    d_i = rng.normal(size=(n, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    d_i = jnp.asarray(d_i)

    def closest(tr):
        return lambda o, d: tr.closest(o, d, T_MIN, T_MAX).t

    cases = [
        ("primary-scanline", closest(tracer), o_p, d_p),
        ("primary-tiled", closest(tracer), o_t, d_t),
        ("incoherent", closest(tracer), o_i, d_i),
        ("incoherent-sort", closest(sorter), o_i, d_i),
    ]
    only = sys.argv[2:]
    if only:
        cases = [c for c in cases if c[0] in only]
    for name, fn, o, d in cases:
        dt = slope_time(fn, o, d)
        print(f"  {name}: {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mrays/s")


if __name__ == "__main__":
    main()
