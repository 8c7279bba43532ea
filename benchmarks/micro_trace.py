"""Trace-kernel microbenchmarks: decompose where a trace pass spends time.

Measures, on real hardware:
  * the per-program floor (empty kernel, same block shapes as production)
  * closest/any pass cost on coherent (primary) vs incoherent (bounce) rays
  * scaling with rays-per-program (PROG_ROWS)

Usage: python -m benchmarks.micro_trace [--scene cornell|city] [--iters N]
Timing uses jax.device_get (block_until_ready is unreliable through the
axon tunnel).
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def timeit(fn, iters=8):
    import jax

    jax.device_get(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def bench_floor(n_rays: int, prog_rows: int, iters: int):
    """Empty kernel with production-shaped blocks: the per-program floor."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES = 128
    rows = n_rays // LANES
    grid = rows // prog_rows

    def kernel(rays_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

    rays = jnp.zeros((rows, 6 * LANES), jnp.float32)

    @jax.jit
    def run(rays):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((prog_rows, 6 * LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((prog_rows, 4 * LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 4 * LANES), jnp.float32),
        )(rays)

    dt = timeit(lambda: run(rays), iters)
    return dt, grid


def make_rays(scene, width, height, kind: str):
    """Primary rays, or incoherent rays approximating bounce-1 rays."""
    import jax.numpy as jnp
    from vkrt_tpu.utils.camera import Camera, generate_rays

    cam = Camera().matrices(width, height)
    n = width * height
    jitter = jnp.full((n, 2), 0.5, jnp.float32)
    orig, direction = generate_rays(cam, width, height, jitter)
    if kind == "primary":
        return orig, direction
    # incoherent: random origins in the scene bbox, random unit directions
    rng = np.random.default_rng(0)
    v0 = np.asarray(scene.tri_v0)
    lo, hi = v0.min(0), v0.max(0)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="cornell", choices=["cornell", "city"])
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--floor-only", action="store_true")
    args = p.parse_args(argv)

    from vkrt_tpu.utils.jaxcache import enable

    enable()
    import jax
    import jax.numpy as jnp

    n_rays = args.width * args.height
    n_rays -= n_rays % 1024
    print(f"backend={jax.default_backend()} rays={n_rays}")

    for prog_rows in (8, 16, 32, 64):
        dt, grid = bench_floor(n_rays, prog_rows, args.iters)
        print(
            f"floor prog_rows={prog_rows:3d} grid={grid:4d}: "
            f"{dt*1e3:7.2f} ms  ({dt/grid*1e6:6.2f} us/program, "
            f"{n_rays/dt/1e6:7.1f} Mrays/s ceiling)"
        )
    if args.floor_only:
        return

    from vkrt_tpu import scene as scene_mod
    from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
    from vkrt_tpu.ops.intersect import T_MAX, T_MIN

    scene = (scene_mod.load_cornell() if args.scene == "cornell"
             else scene_mod.make_city(grid=96))
    print(f"scene: {scene.num_tris} tris")
    tracer = make_pallas_tracer(scene)
    print(f"clusters={tracer.cs.n_clusters} levels={tracer.cs.level_counts}")

    for kind in ("primary", "incoherent"):
        o, d = make_rays(scene, args.width, args.height, kind)
        o, d = o[:n_rays], d[:n_rays]

        f_closest = jax.jit(lambda o, d: tracer.closest(o, d, T_MIN, T_MAX).t)
        dt = timeit(lambda: f_closest(o, d), args.iters)
        print(f"closest {kind:10s}: {dt*1e3:7.2f} ms  {n_rays/dt/1e6:6.2f} Mrays/s")

        f_any = jax.jit(lambda o, d: tracer.any(o, d, T_MIN, 100.0))
        dt = timeit(lambda: f_any(o, d), args.iters)
        print(f"any     {kind:10s}: {dt*1e3:7.2f} ms  {n_rays/dt/1e6:6.2f} Mrays/s")


if __name__ == "__main__":
    main()
