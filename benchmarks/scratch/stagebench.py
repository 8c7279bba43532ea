"""Round-3 frame stage split: where does the Cornell/city frame go?

Decomposes the production bench workload (tile-ordered pixels, fused
shadow+bounce traces) into stage costs by timing jitted sub-pipelines:

  * primary trace alone (resolve on/off)
  * shading stage in isolation (surface_* + sample_bsdf on realistic hits)
  * full frames at depth 1/2/3 -> per-bounce marginal cost

Usage: python -m benchmarks.scratch.stagebench [cornell|city] [WxH]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.models.pathtracer import pathtrace_frame
from vkrt_tpu.models.shading import (
    sample_bsdf,
    surface_at_hit,
    surface_from_attrs,
)
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.utils.camera import Camera, generate_rays, pixel_coords, tile_perm


def timeit(fn, iters=8):
    """Every timed fn MUST return a small array: device_get through the
    axon tunnel moves ~24 MB/s, so pulling an (N,) or (N,3) output adds
    19-57 ms of pure transfer to the reading (this bug inflated round-2's
    "111 ms/bounce shading" number; the real stage is ~5 ms)."""
    out = fn()
    assert out.size <= 16, "reduce outputs inside jit before timing"
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    res = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    w, h = (int(x) for x in res.split("x"))
    if which == "cornell":
        scene = scene_mod.load_cornell()
    else:
        scene = scene_mod.make_city(grid=96)  # ~143k tris, the suite config
    pt = make_pallas_tracer(scene)
    print(f"scene {which}: {scene.num_tris} tris, resolve={pt.resolves_attrs}")

    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    cam = Camera().matrices(w, h)
    n = w * h
    origin, direction = generate_rays(cam, w, h, jnp.full((n, 2), 0.5), pix=pix)
    seeds = tea(pid, jnp.uint32(1))

    # --- primary trace alone ---
    @jax.jit
    def prim_plain():
        hi = pt.closest(origin, direction, T_MIN, T_MAX)
        return jnp.sum(hi.t)

    print(f"primary trace (plain) : {timeit(prim_plain):8.1f} ms")
    if pt.resolves_attrs:
        @jax.jit
        def prim_res():
            hi, at = pt.closest_surface(origin, direction, T_MIN, T_MAX)
            return jnp.sum(hi.t) + jnp.sum(at.pos[:, 0])

        print(f"primary trace (resolve): {timeit(prim_res):8.1f} ms")

    # --- shading stage in isolation on the primary hits ---
    hi = jax.jit(lambda: pt.closest(origin, direction, T_MIN, T_MAX))()
    tri = jnp.maximum(hi.tri, 0)
    if pt.resolves_attrs:
        _, at = jax.jit(
            lambda: pt.closest_surface(origin, direction, T_MIN, T_MAX)
        )()

    @jax.jit
    def shade_gather():
        surf = surface_at_hit(scene, tri, hi.u, hi.v, direction)
        bs = sample_bsdf(scene, surf, direction, seeds,
                         jnp.ones((n,), bool))
        return jnp.sum(bs.weight) + jnp.sum(bs.emit_plus_nee)

    print(f"shade (gather+bsdf)   : {timeit(shade_gather):8.1f} ms")

    @jax.jit
    def shade_surface_only():
        surf = surface_at_hit(scene, tri, hi.u, hi.v, direction)
        return jnp.sum(surf.shading_normal) + jnp.sum(surf.base_color)

    print(f"  surface_at_hit only : {timeit(shade_surface_only):8.1f} ms")

    if pt.resolves_attrs:
        @jax.jit
        def shade_resolve():
            surf = surface_from_attrs(scene, at)
            bs = sample_bsdf(scene, surf, direction, seeds,
                             jnp.ones((n,), bool))
            return jnp.sum(bs.weight) + jnp.sum(bs.emit_plus_nee)

        print(f"shade (resolve+bsdf)  : {timeit(shade_resolve):8.1f} ms")

        @jax.jit
        def shade_resolve_surf():
            surf = surface_from_attrs(scene, at)
            return jnp.sum(surf.shading_normal) + jnp.sum(surf.base_color)

        print(f"  surface_from_attrs  : {timeit(shade_resolve_surf):8.1f} ms")

    # --- full frames at increasing depth: marginal per-bounce cost ---
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    prev = None
    for depth in (1, 2, 3):
        f = jax.jit(
            lambda d=depth: jnp.sum(pathtrace_frame(
                scene, pt, cam, 1, accum, clear, width=w, height=h,
                samples=1, depth=d, pix=pix, seeds=seeds,
                corr=True,  # production default (RenderSettings.corr_sampler)
            )[0])
        )
        ms = timeit(f, iters=4)
        extra = "" if prev is None else f"  (+{ms - prev:.1f} marginal)"
        print(f"frame depth={depth}        : {ms:8.1f} ms{extra}")
        prev = ms


if __name__ == "__main__":
    main()
