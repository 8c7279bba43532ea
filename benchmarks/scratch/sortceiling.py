"""Round-3: what would PERFECT ray reordering buy the fused trace?

Takes the REAL fused d=1/d=2 pools (benchmarks/scratch/poolstats machinery),
reorders lanes OFFLINE in numpy (free — excluded from timing) three ways,
and times the production packed trace on each:

  * asis       — production order (tile-major, shadow half appended)
  * octant     — stable sort by direction octant (what cheap binning buys)
  * oct+morton — octant-major, then origin-morton within octant (ideal)
  * compact    — live lanes first (dead-block early-out maximized)

The asis->best delta is the CEILING for any in-frame sorting scheme; round 2
measured the in-frame sort itself at 228-379 ms (XLA argsort+gather at pool
size), so the ceiling must exceed that by a lot to justify revisiting.

Usage: python -m benchmarks.scratch.sortceiling [cornell|city]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.intersect import T_MIN
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer, LANES
from benchmarks.scratch.poolstats import pools


def timeit(fn, iters=8):
    out = fn()
    assert out.size <= 16
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def morton(x, bits=8):
    """Interleave 3x bits-bit ints."""
    out = np.zeros_like(x[:, 0], dtype=np.uint64)
    for b in range(bits):
        for j in range(3):
            out |= ((x[:, j].astype(np.uint64) >> b) & 1) << (3 * b + j)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    pt = make_pallas_tracer(scene)
    tr_sum = jax.jit(
        lambda r: jnp.sum(pt.closest_packed(r, T_MIN)[:, :128])
    )

    trp_sum = jax.jit(
        lambda r: jnp.sum(pt.closest_packed_plain(r, T_MIN)[:, :128])
    )

    for label, packed in pools(scene, pt, 1280, 720, 3):
        if label == "primary":
            continue
        # bounce pools go through the resolve trace in production, shadow
        # pools through the plain trace (non-resolve scenes: plain for both)
        t_fn = (trp_sum if label.startswith("shadow")
                or not pt.resolves_attrs else tr_sum)
        p = np.asarray(packed)
        cols = [p[:, k * LANES:(k + 1) * LANES].ravel() for k in range(7)]
        o = np.stack(cols[0:3], axis=-1)
        d = np.stack(cols[3:6], axis=-1)
        t_lim = cols[6]
        live = t_lim > 0.0
        oct_ = (d[:, 0] >= 0) * 4 + (d[:, 1] >= 0) * 2 + (d[:, 2] >= 0)
        lo = np.where(live[:, None], o, np.inf).min(0)
        hi = np.where(live[:, None], o, -np.inf).max(0)
        q = ((o - lo) / np.maximum(hi - lo, 1e-9) * 255).clip(0, 255).astype(np.int64)
        mort = morton(q)

        orders = {
            "asis": np.arange(o.shape[0]),
            "compact": np.argsort(~live, kind="stable"),
            "octant": np.argsort(np.where(live, oct_, 255), kind="stable"),
            "oct+morton": np.lexsort((mort, np.where(live, oct_, 255))),
        }
        print(label)
        for name, idx in orders.items():
            arr = jnp.asarray(
                np.concatenate([c[idx].reshape(-1, LANES) for c in cols],
                               axis=1))
            ms = timeit(lambda a=arr: t_fn(a))
            print(f"  {name:11s}: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
