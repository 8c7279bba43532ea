"""CLUSTER-size sweep on the city's fused bounce+shadow trace (the
round-2 city bottleneck: ~389 ms at CLUSTER=64, ~120 cluster visits/block
from direction spread).

Run once per size (fresh process per compile):
  VKRT_CLUSTER=64 python -m benchmarks.scratch.clusterbench
  VKRT_CLUSTER=32 python -m benchmarks.scratch.clusterbench
"""
from vkrt_tpu.utils.jaxcache import enable; enable()
import time
import numpy as np, jax, jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas import trace as T
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.models.shading import sample_bsdf, surface_at_hit
from vkrt_tpu.utils.camera import Camera, generate_rays, tile_perm
from vkrt_tpu.ops.rng import seed_pixels


def timeit(fn, iters=5):
    jax.device_get(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    scene = scene_mod.make_city(grid=96)
    tracer = T.make_pallas_tracer(scene)
    print(f"CLUSTER={T.CLUSTER}: levels={tracer.cs.level_counts}")
    W, H = 1280, 720
    n = W * H
    cam = Camera(eye=(40.0, 25.0, 40.0), center=(0.0, 4.0, 0.0)).matrices(W, H)
    o, d = generate_rays(cam, W, H, jnp.full((n, 2), 0.5, jnp.float32))
    perm, _ = tile_perm(W, H)
    o = jnp.take(o, jnp.asarray(perm), axis=0)
    d = jnp.take(d, jnp.asarray(perm), axis=0)
    seed = seed_pixels(W, H, 2)

    t_p = timeit(jax.jit(lambda: tracer.closest(o, d, T_MIN, T_MAX).t))
    print(f"  primary trace: {t_p*1e3:8.2f} ms  {n/t_p/1e6:6.2f} Mrays/s")

    hi = tracer.closest(o, d, T_MIN, T_MAX)
    surf = surface_at_hit(scene, jnp.maximum(hi.tri, 0), hi.u, hi.v, d)
    bs = sample_bsdf(scene, surf, d, seed, jnp.ones((n,), bool))
    alive = hi.hit
    fo = jax.device_put(jnp.concatenate(
        [jnp.where(alive[:, None], surf.world_pos, 1e30), surf.world_pos]))
    fd = jax.device_put(jnp.concatenate(
        [jnp.where(alive[:, None], bs.next_dir, 0.0),
         jnp.where((alive & ~bs.is_specular)[:, None], bs.shadow_dir, 0.0)]))
    fl = jax.device_put(jnp.concatenate(
        [jnp.where(alive, T_MAX, -1.0),
         jnp.where(alive & ~bs.is_specular,
                   jnp.maximum(bs.light_dist - 0.1, T_MIN), 0.0)]))
    t_f = timeit(jax.jit(lambda: tracer.closest(fo, fd, T_MIN, T_MAX, t_lim=fl).t))
    print(f"  fused bounce+shadow: {t_f*1e3:8.2f} ms")
