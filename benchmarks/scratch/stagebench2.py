"""Cumulative-pipeline frame decomposition (round 5).

poolstats r5 shows post-corr city pools at ~6 visits/block (was 510), yet
the measured d1 frame (175 ms) is ~3x the sum of its isolated stages
(primary 22 + shade 3.8 + shadow ~35). This harness times CUMULATIVE
jitted pipelines built from the production pieces so every marginal cost —
including XLA fusion/glue the isolated timings hide — is attributed:

  P     : primary trace
  PS    : + surface_at_hit + sample_bsdf (corr draws, production default)
  PSS   : + fused shadow any-trace
  FRAME1: pathtrace_frame depth=1 (the real thing)
  FRAME2/3: real frames at depth 2/3 (bounce marginals)

Usage: python -m benchmarks.scratch.stagebench2 [cornell|city] [WxH]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.models.pathtracer import pathtrace_frame
from vkrt_tpu.models.shading import sample_bsdf, surface_at_hit
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.rng import corr_draws, tea
from vkrt_tpu.utils.camera import Camera, generate_rays, pixel_coords, tile_perm


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
    w, h = (int(x) for x in res.split("x"))
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    pt = make_pallas_tracer(scene)
    print(f"{which}: {scene.num_tris} tris spec={pt.cs.spec}", flush=True)

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    seeds = tea(pid, jnp.uint32(1))
    cam = Camera().matrices(w, h)
    origin, direction = generate_rays(cam, w, h, jnp.full((n, 2), 0.5), pix=pix)
    corr_seed = tea(jnp.uint32(1), jnp.uint32(0x9E3779B9))
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    @jax.jit
    def f_p():
        hi = pt.closest(origin, direction, T_MIN, T_MAX)
        return jnp.sum(hi.t)

    def shade_part():
        hi = pt.closest(origin, direction, T_MIN, T_MAX)
        surf = surface_at_hit(scene, jnp.maximum(hi.tri, 0), hi.u, hi.v,
                              direction)
        bs = sample_bsdf(scene, surf, direction, seeds,
                         jnp.ones((n,), bool),
                         corr=corr_draws(n, corr_seed, 0))
        miss = ~hi.hit
        do_shadow = ~miss & ~bs.is_specular
        sh_d = jnp.where(do_shadow[:, None], bs.shadow_dir, 0.0)
        sh_lim = jnp.where(
            do_shadow, -jnp.maximum(bs.light_dist - 0.1, T_MIN), 0.0)
        return hi, surf, bs, do_shadow, sh_d, sh_lim

    @jax.jit
    def f_ps():
        hi, surf, bs, *_ = shade_part()
        return jnp.sum(bs.weight) + jnp.sum(bs.emit_plus_nee)

    @jax.jit
    def f_pss():
        hi, surf, bs, do_shadow, sh_d, sh_lim = shade_part()
        shadow_hit = pt.any(surf.world_pos, sh_d, T_MIN,
                            jnp.abs(sh_lim)) & do_shadow
        return jnp.sum(shadow_hit) + jnp.sum(bs.weight)

    print(f"P   (primary)          : {timeit(f_p):8.1f} ms", flush=True)
    print(f"PS  (+shade)           : {timeit(f_ps):8.1f} ms", flush=True)
    print(f"PSS (+shadow any)      : {timeit(f_pss):8.1f} ms", flush=True)

    prev = None
    for depth in (1, 2, 3):
        f = jax.jit(
            lambda d=depth: jnp.sum(pathtrace_frame(
                scene, pt, cam, 1, accum, clear, width=w, height=h,
                samples=1, depth=d, pix=pix, seeds=seeds, corr=True,
            )[0])
        )
        ms = timeit(f, iters=4)
        extra = "" if prev is None else f"  (+{ms - prev:.1f} marginal)"
        print(f"FRAME depth={depth}         : {ms:8.1f} ms{extra}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
