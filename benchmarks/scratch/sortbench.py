"""Measure the win/cost of secondary-ray sorting on real TPU.

Times, separately: the unsorted incoherent trace, the pre-sorted trace (pure
kernel-side win), the sort+permute machinery alone, and the full
SortingTracer round trip (sort + trace + unsort).

Usage: python -m benchmarks.scratch.sortbench [cornell|city]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.sort_rays import SortingTracer, ray_sort_keys
from vkrt_tpu.ops.intersect import T_MAX, T_MIN


def timeit(fn, iters=6):
    jax.device_get(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    tracer = make_pallas_tracer(scene)
    v0 = np.asarray(scene.tri_v0)
    lo = v0.min(0); hi = v0.max(0)
    print(f"{which}: {scene.num_tris} tris, bounds {lo.round(1)}..{hi.round(1)}")

    n = 921600
    rng = np.random.default_rng(3)
    # bounce-like: origins on scene surfaces (sampled tri verts + jitter),
    # directions uniform sphere; ~40% dead lanes parked like the fused path
    idx = rng.integers(0, len(v0), n)
    o = v0[idx] + rng.normal(0, 0.05, (n, 3))
    d = rng.normal(size=(n, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
    dead = rng.random(n) < 0.4
    o[dead] = 1e30; d[dead] = 0.0
    tl = np.where(dead, -1.0, T_MAX).astype(np.float32)
    o = jnp.asarray(o, jnp.float32); d = jnp.asarray(d, jnp.float32)
    tl = jnp.asarray(tl)

    st = SortingTracer(inner=tracer, lo=jnp.asarray(lo, jnp.float32),
                       hi=jnp.asarray(hi, jnp.float32))

    unsorted_fn = jax.jit(lambda: tracer.closest(o, d, T_MIN, T_MAX, t_lim=tl).t)
    t_uns = timeit(unsorted_fn)
    print(f"  unsorted trace:      {t_uns*1e3:8.2f} ms  {n/t_uns/1e6:6.2f} Mrays/s")

    @jax.jit
    def sort_only():
        keys = ray_sort_keys(o, d, st.lo, st.hi)
        _, perm = jax.lax.sort((keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return (jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0),
                jnp.take(tl, perm))
    t_sort = timeit(sort_only)
    print(f"  sort+permute only:   {t_sort*1e3:8.2f} ms")

    o_s, d_s, tl_s = jax.device_get(sort_only()) and sort_only()
    o_s, d_s, tl_s = jax.device_put(o_s), jax.device_put(d_s), jax.device_put(tl_s)
    sorted_fn = jax.jit(lambda: tracer.closest(o_s, d_s, T_MIN, T_MAX, t_lim=tl_s).t)
    t_srt = timeit(sorted_fn)
    print(f"  pre-sorted trace:    {t_srt*1e3:8.2f} ms  {n/t_srt/1e6:6.2f} Mrays/s")

    full_fn = jax.jit(lambda: st.closest(o, d, T_MIN, T_MAX, t_lim=tl).t)
    t_full = timeit(full_fn)
    print(f"  SortingTracer e2e:   {t_full*1e3:8.2f} ms  {n/t_full/1e6:6.2f} Mrays/s")

    # stable octant counting-sort: 9 buckets (8 octants + dead lanes),
    # original (tile) order preserved within each bucket -> blocks hold one
    # direction cone over consecutive source tiles; rank via cumsum, no sort
    def _part_perm(oo, dd, ttl):
        key = ((dd[:, 0] >= 0).astype(jnp.int32) * 4
               + (dd[:, 1] >= 0).astype(jnp.int32) * 2
               + (dd[:, 2] >= 0).astype(jnp.int32))
        key = jnp.where(ttl < 0, 8, key)
        onehot = (key[:, None] == jnp.arange(9)[None, :]).astype(jnp.int32)
        within = jnp.cumsum(onehot, axis=0) - onehot
        counts = within[-1] + onehot[-1]
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        pos = jnp.take(offs, key) + jnp.take_along_axis(
            within, key[:, None], axis=1
        )[:, 0]
        return jnp.zeros_like(pos).at[pos].set(
            jnp.arange(pos.shape[0], dtype=pos.dtype)
        ), pos

    @jax.jit
    def part_only():
        perm, pos = _part_perm(o, d, tl)
        return (jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0),
                jnp.take(tl, perm))
    t_part = timeit(part_only)
    print(f"  octant-part only:    {t_part*1e3:8.2f} ms")

    @jax.jit
    def part_trace():
        perm, pos = _part_perm(o, d, tl)
        hi = tracer.closest(jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0),
                            T_MIN, T_MAX, t_lim=jnp.take(tl, perm))
        return jnp.take(hi.t, pos)
    t_pt = timeit(part_trace)
    print(f"  octant-part e2e:     {t_pt*1e3:8.2f} ms  {n/t_pt/1e6:6.2f} Mrays/s")
