"""Cornell headline: kernel block rows x correlated-draw granularity.

block_rows=32 halves per-program fixed cost but makes a trace block span
FOUR 1024-ray draw bundles (the block's cluster footprint is their union);
CORR_REP=r makes r consecutive bundles share one draw row. The interesting
frontier is rep matched to the block (rows=16/rep=2, rows=32/rep=4): one
coherent bundle per kernel program at progressively lower fixed cost, at
the price of coarser correlation granularity (quality bounded the
corr_quality way — draws stay marginally uniform; accumulation averages
the structured noise at the same 1/N rate).

Same-process interleaved frames (tunnel throughput drifts +/-40% across
processes). Each variant gets its own trace-module instance (envsweep
loader) AND pins rng.CORR_REP while its jit traces — the rng table builder
late-binds through the module, and the traced constant bakes into the
compiled frame.

Usage: python -m benchmarks.scratch.rowsrep_ab [cornell|city] [WxH] [depth]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

import vkrt_tpu.ops.rng as rng
from vkrt_tpu import scene as scene_mod
from benchmarks.scratch.envsweep import load_variant
from vkrt_tpu.models.pathtracer import pathtrace_frame
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.utils.camera import Camera, pixel_coords, tile_perm

VARIANTS = [  # (block_rows, corr_rep)
    (16, 1),  # production default (spec_for_scene small-scene flip)
    (16, 2),
    (32, 2),
    (32, 4),
]


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
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    res = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    w, h = (int(x) for x in res.split("x"))
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    seeds = tea(pid, jnp.uint32(1))
    cam = Camera().matrices(w, h)
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    rep0 = rng.CORR_REP
    fns = {}
    for rows, rep in VARIANTS:
        mod = load_variant(f"BLOCK_ROWS={rows}")
        pt = mod.make_pallas_tracer(scene)
        assert pt.cs.spec.block_rows == rows

        def frame(pt=pt):
            out, _ = pathtrace_frame(
                scene, pt, cam, 1, accum, clear, width=w, height=h,
                samples=1, depth=depth, pix=pix, seeds=seeds, corr=True,
            )
            return jnp.sum(out[:, 0])

        rng.CORR_REP = rep  # baked into the jit trace below
        f = jax.jit(frame)
        t0 = time.perf_counter()
        jax.device_get(f())
        print(f"[rows={rows} rep={rep}] compile+frame0 "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        fns[(rows, rep)] = f
    rng.CORR_REP = rep0

    acc = {k: [] for k in fns}
    for _ in range(4):
        for k, f in fns.items():
            acc[k].append(timeit(f))
        print("  ".join(f"[{k[0]},{k[1]}] {v[-1]:7.1f}" for k, v in acc.items())
              + "  ms", flush=True)
    base = min(acc[VARIANTS[0]])
    print(f"{which} d{depth} best-of-4: " + "  ".join(
        f"[rows={k[0]} rep={k[1]}] {min(v):.1f} ms ({min(v)/base:.3f}x)"
        for k, v in acc.items()))


if __name__ == "__main__":
    main()
