"""CORR_REP A/B: how many 1024-ray blocks share one correlated draw row.

With spec_for_scene's round-4 block_rows=16 flip, a 2048-ray trace block
spans TWO 8-row draw blocks — its bounce directions form two coherent
bundles, and the block's cluster footprint is their union. rep=2 collapses
that to one bundle per trace block; rep=4 coarsens beyond the trace block
(should win nothing more, sanity bound).

Same-process interleaved frames (the only trustworthy comparison on this
box); CORR_REP is monkeypatched per variant before its jit traces — the
table builder late-binds through the module (ops/rng.block_table_rep).

Usage: python -m benchmarks.scratch.correp_ab [cornell|city] [WxH] [depth]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

import vkrt_tpu.ops.rng as rng
from vkrt_tpu import scene as scene_mod
from vkrt_tpu.models.pathtracer import pathtrace_frame
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.utils.camera import Camera, pixel_coords, tile_perm


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
    pt = make_pallas_tracer(scene)
    print(f"{which}: {scene.num_tris} tris, block_rows={pt.cs.spec.block_rows}",
          flush=True)

    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    seeds = tea(pid, jnp.uint32(1))
    cam = Camera().matrices(w, h)
    accum = jnp.zeros((n, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    def frame():
        out, _ = pathtrace_frame(
            scene, pt, cam, 1, accum, clear, width=w, height=h,
            samples=1, depth=depth, pix=pix, seeds=seeds, corr=True,
        )
        return jnp.sum(out[:, 0])

    fns = {}
    def make_frame():
        # distinct function object per variant: two jax.jit wrappers over
        # the SAME callable share the trace cache, so variant B silently
        # reuses variant A's executable (caught in sandwich_ab: identical
        # sums + 0.6s "compile"). The round-5 rep=1/2/4 "no-op" reading
        # taken before this fix was three runs of rep=1.
        def f():
            return frame()
        return f

    rep0 = rng.CORR_REP  # restore the env-configured value, not literal 1
    for rep in (1, 2, 4):
        rng.CORR_REP = rep
        f = jax.jit(make_frame())
        t0 = time.perf_counter()
        jax.device_get(f())  # traces under this rep
        print(f"[rep={rep}] compile+frame0 {time.perf_counter()-t0:.1f}s",
              flush=True)
        fns[rep] = f
    rng.CORR_REP = rep0

    acc = {k: [] for k in fns}
    for _ in range(4):
        for k, f in fns.items():
            acc[k].append(timeit(f))
        print("  ".join(f"[rep={k}] {v[-1]:7.1f}" for k, v in acc.items())
              + "  ms", flush=True)
    base = min(acc[1])
    print(f"{which} d{depth} best-of-4: " + "  ".join(
        f"[rep={k}] {min(v):.1f} ms ({min(v)/base:.3f}x)"
        for k, v in acc.items()))


if __name__ == "__main__":
    main()
