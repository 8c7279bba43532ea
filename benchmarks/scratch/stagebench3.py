"""Split the composed XLA shading stage: gathers vs BSDF math vs texture.

stagebench2 r5 found the city d1 frame is 60% XLA shading IN COMPOSITION
(+106 ms over the trace) while the old isolated timings (3.8 ms) were
constant-folded artifacts (closed-over concrete inputs let XLA evaluate the
whole stage at compile time). This harness keeps every pipeline
data-dependent on the live trace (nothing foldable) and splits the stage:

  P          : primary trace alone
  P+GATHER   : + surface_at_hit's attribute gathers + interpolation,
               WITHOUT texture fetch (scene stripped of textures)
  P+SURF     : + full surface_at_hit (gathers + texture fetch)
  P+BSDF     : + sample_bsdf on a SYNTHETIC surface derived from the trace
               (data-dependent, zero gathers) — the (N,3) math term
  P+SURF+BSDF: the full production stage (stagebench2's PS)

Usage: python -m benchmarks.scratch.stagebench3 [cornell|city] [WxH]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.models.shading import sample_bsdf, surface_at_hit, SurfaceSample
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
    # texture-free clone: every material's texture index parked at -1, so
    # surface_at_hit skips the fetch entirely (static python check)
    neg = jnp.full_like(scene.mat_base_tex, -1)
    scene_notex = scene._replace(mat_base_tex=neg, mat_mr_tex=neg,
                                 mat_normal_tex=neg, mat_emissive_tex=neg)
    pt = make_pallas_tracer(scene)
    print(f"{which}: {scene.num_tris} tris", flush=True)

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    seeds = tea(pid, jnp.uint32(1))
    cam = Camera().matrices(w, h)
    origin, direction = generate_rays(cam, w, h, jnp.full((n, 2), 0.5), pix=pix)
    corr_seed = tea(jnp.uint32(1), jnp.uint32(0x9E3779B9))

    def trace():
        return pt.closest(origin, direction, T_MIN, T_MAX)

    @jax.jit
    def f_p():
        hi = trace()
        return jnp.sum(hi.t)

    def f_surf(sc):
        def f():
            hi = trace()
            surf = surface_at_hit(sc, jnp.maximum(hi.tri, 0), hi.u, hi.v,
                                  direction)
            return (jnp.sum(surf.shading_normal) + jnp.sum(surf.base_color)
                    + jnp.sum(surf.world_pos))
        return jax.jit(f)

    @jax.jit
    def f_bsdf():
        hi = trace()
        t = hi.t[:, None]
        pos = origin + t * direction
        nrm_raw = jnp.stack(
            [hi.u, hi.v, jnp.maximum(1.0 - hi.u - hi.v, 0.3)], axis=1)
        nrm = nrm_raw / jnp.linalg.norm(nrm_raw, axis=1, keepdims=True)
        tan = jnp.stack([nrm[:, 1], -nrm[:, 0], jnp.zeros((n,))], axis=1)
        tan = tan / jnp.maximum(
            jnp.linalg.norm(tan, axis=1, keepdims=True), 1e-6)
        bin_ = jnp.cross(nrm, tan)
        surf = SurfaceSample(
            world_pos=pos, shading_normal=nrm, geo_normal=nrm,
            tangent=tan, binormal=bin_,
            base_color=jnp.abs(nrm), metallic=hi.u, roughness=hi.v,
            emissive=jnp.zeros((n, 3)),
            uv=jnp.stack([hi.u, hi.v], axis=1),
            mat_id=jnp.maximum(hi.tri, 0) % 4,
        )
        bs = sample_bsdf(scene, surf, direction, seeds,
                         jnp.ones((n,), bool),
                         corr=corr_draws(n, corr_seed, 0))
        return jnp.sum(bs.weight) + jnp.sum(bs.emit_plus_nee)

    @jax.jit
    def f_full():
        hi = trace()
        surf = surface_at_hit(scene, jnp.maximum(hi.tri, 0), hi.u, hi.v,
                              direction)
        bs = sample_bsdf(scene, surf, direction, seeds,
                         jnp.ones((n,), bool),
                         corr=corr_draws(n, corr_seed, 0))
        return jnp.sum(bs.weight) + jnp.sum(bs.emit_plus_nee)

    p = timeit(f_p)
    print(f"P                : {p:8.1f} ms", flush=True)
    g = timeit(f_surf(scene_notex))
    print(f"P+GATHER (notex) : {g:8.1f} ms  (+{g-p:.1f})", flush=True)
    s = timeit(f_surf(scene))
    print(f"P+SURF (tex)     : {s:8.1f} ms  (+{s-p:.1f}; tex {s-g:+.1f})",
          flush=True)
    b = timeit(f_bsdf)
    print(f"P+BSDF (no gath) : {b:8.1f} ms  (+{b-p:.1f})", flush=True)
    fl = timeit(f_full)
    print(f"P+SURF+BSDF      : {fl:8.1f} ms  (+{fl-p:.1f})", flush=True)


if __name__ == "__main__":
    main()
