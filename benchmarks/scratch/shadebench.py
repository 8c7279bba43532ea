"""Where do surface_at_hit's 66 ms go? Layout + gather micro-measurements.

Times, on real TPU:
  * elementwise vec math on (N,3) arrays vs component (N,) arrays
  * the corner-attribute gathers (jnp.take by hit triangle)
  * surface_at_hit / sample_bsdf end to end
Usage: python -m benchmarks.scratch.shadebench
"""
from vkrt_tpu.utils.jaxcache import enable; enable()
import time
import numpy as np, jax, jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.models.shading import sample_bsdf, surface_at_hit
from vkrt_tpu.ops.rng import seed_pixels


def timeit(fn, iters=8):
    jax.device_get(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    n = 921600
    rng = np.random.default_rng(0)
    a3 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ax, ay, az = (a3[:, i] for i in range(3))
    bx, by, bz = (b3[:, i] for i in range(3))

    @jax.jit
    def vec_n3():
        # ~20 elementwise ops in (N,3) form: normalize + cross + dots
        c = jnp.cross(a3, b3)
        d = jnp.sum(a3 * b3, axis=-1, keepdims=True)
        e = a3 - d * b3
        ln = jnp.sqrt(jnp.sum(e * e, axis=-1, keepdims=True))
        return e / jnp.maximum(ln, 1e-20) + c

    @jax.jit
    def vec_comp():
        cx = ay * bz - az * by
        cy = az * bx - ax * bz
        cz = ax * by - ay * bx
        d = ax * bx + ay * by + az * bz
        ex, ey, ez = ax - d * bx, ay - d * by, az - d * bz
        ln = jnp.sqrt(ex * ex + ey * ey + ez * ez)
        ln = jnp.maximum(ln, 1e-20)
        return ex / ln + cx + ey / ln + cy + ez / ln + cz

    t3 = timeit(vec_n3)
    tc = timeit(vec_comp)
    print(f"vec math (N,3):   {t3*1e3:7.2f} ms")
    print(f"vec math (N,) x3: {tc*1e3:7.2f} ms")

    scene = scene_mod.load_cornell()
    tri = jnp.asarray(rng.integers(0, scene.num_tris, n), jnp.int32)
    u = jnp.asarray(rng.random(n), jnp.float32)
    v = jnp.asarray(rng.random(n), jnp.float32) * (1 - u)

    @jax.jit
    def gathers():
        cn = jnp.take(scene.corner_normal, tri, axis=0)
        ctg = jnp.take(scene.corner_tangent, tri, axis=0)
        cuv = jnp.take(scene.corner_uv, tri, axis=0)
        v0 = jnp.take(scene.tri_v0, tri, axis=0)
        return cn.sum() + ctg.sum() + cuv.sum() + v0.sum()

    tg = timeit(gathers)
    print(f"corner gathers:   {tg*1e3:7.2f} ms")

    d3 = a3 / jnp.linalg.norm(a3, axis=-1, keepdims=True)
    surf_fn = jax.jit(lambda: surface_at_hit(scene, tri, u, v, d3).world_pos)
    ts = timeit(surf_fn)
    print(f"surface_at_hit:   {ts*1e3:7.2f} ms")

    seed = seed_pixels(1280, 720, 3)

    @jax.jit
    def shade():
        surf = surface_at_hit(scene, tri, u, v, d3)
        return sample_bsdf(scene, surf, d3, seed, jnp.ones((n,), bool)).next_dir

    tb = timeit(shade)
    print(f"surface+bsdf:     {tb*1e3:7.2f} ms")
