"""A/B the interleaved corner_packed gather vs 7 separate takes, one
process, same device state. Usage: python -m benchmarks.scratch.gatherab"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import time
import jax, jax.numpy as jnp
from vkrt_tpu import scene as scene_mod
from vkrt_tpu.models.shading import sample_bsdf
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.utils.camera import Camera, generate_rays, pixel_coords, tile_perm


def timeit(fn, iters=10):
    out = fn(); assert out.size <= 16; jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    w, h = 1280, 720
    scene = scene_mod.make_city(grid=96)
    pt = make_pallas_tracer(scene)
    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    cam = Camera().matrices(w, h)
    origin, direction = generate_rays(cam, w, h, jnp.full((n, 2), 0.5), pix=pix)
    seeds = tea(jnp.asarray(perm).astype(jnp.uint32), jnp.uint32(1))
    hi = jax.jit(lambda: pt.closest(origin, direction, T_MIN, T_MAX))()
    tri = jnp.maximum(hi.tri, 0)

    import os
    from vkrt_tpu.models import shading
    for mode in ("1", "0", "1", "0"):
        os.environ["VKRT_PACKED_GATHER"] = mode

        @jax.jit
        def surf_only():
            s = shading.surface_at_hit(scene, tri, hi.u, hi.v, direction)
            return jnp.sum(s.shading_normal[:, 0]) + jnp.sum(s.base_color[:, 0])

        @jax.jit
        def full_shade():
            s = shading.surface_at_hit(scene, tri, hi.u, hi.v, direction)
            bs = sample_bsdf(scene, s, direction, seeds, jnp.ones((n,), bool))
            return jnp.sum(bs.weight[:, 0]) + jnp.sum(bs.emit_plus_nee[:, 0])

        print(f"packed={mode}: surface {timeit(surf_only):7.1f} ms   "
              f"shade {timeit(full_shade):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
