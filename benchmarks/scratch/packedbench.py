"""Round-3 packed-pipeline stage split.

The bounce loop is now trace->shade->trace->... entirely on packed
(rows, K*128) blocks (ops/pallas/shade.bounce_chain_packed). This times each
LAUNCH of that pipeline at bench shapes with REAL ray pools (bounce d's
rays come from actually running the previous shade), so the sum of stages
can be compared against the measured frame.

Usage: python -m benchmarks.scratch.packedbench [cornell|city] [WxH] [depth]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys
import time

import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.ops.pallas import shade as sh
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.utils.camera import Camera, generate_rays, pixel_coords, tile_perm


def timeit(fn, iters=8):
    """fn MUST return a tiny array (reduce inside jit!): device_get through
    the axon tunnel moves ~24 MB/s, so pulling a packed block out of the
    device costs 10-100x the kernel itself and poisons the measurement
    (round-3 find: a 66 MB resolve block made a 6 ms trace 'take' 350 ms)."""
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
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    w, h = (int(x) for x in res.split("x"))
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    pt = make_pallas_tracer(scene)
    assert sh.kernel_shading_available(scene, pt), "packed path gated off"
    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    cam = Camera().matrices(w, h)
    origin, direction = generate_rays(cam, w, h, jnp.full((n, 2), 0.5), pix=pix)
    seeds = tea(pid, jnp.uint32(1))
    print(f"{which} {w}x{h}: {scene.num_tris} tris")

    mat_tab, light_tab = sh.scene_tables(scene)
    params = jnp.zeros((1, 8), jnp.float32).at[0, :3].set(1.0)
    n_mats = int(scene.mat_base_color.shape[0])
    n_lights = int(scene.num_lights)
    act = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)

    ray0 = sh.pack_lanes(
        [origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         jnp.full((n,), T_MAX, jnp.float32)], n)
    carry0 = sh.pack_lanes(
        [jax.lax.bitcast_convert_type(seeds, jnp.float32),
         act, act, act, zeros, zeros, zeros, act, zeros, zeros, zeros,
         zeros, zeros, zeros, zeros], n)

    tr = jax.jit(lambda r: pt.closest_packed(r, T_MIN))
    tr_sum = jax.jit(lambda r: jnp.sum(pt.closest_packed(r, T_MIN)[:, :128]))
    trp = jax.jit(lambda r: pt.closest_packed_plain(r, T_MIN))
    trp_sum = jax.jit(
        lambda r: jnp.sum(pt.closest_packed_plain(r, T_MIN)[:, :128])
    )

    def shd(d, first, carry, rays, out, outsh):
        return sh.shade_call(
            mat_tab, light_tab, params, carry, rays, out,
            d=d, first=first, resolve_hd=(not first and d - 1 == 1),
            n_mats=n_mats, n_lights=n_lights, hitdist_weight=1.0,
            hitdist_accumulate=False, clamp_weights=False,
            t_min=T_MIN, t_max=T_MAX, interpret=False,
            trace_out_shadow=outsh)

    # stage-by-stage with REAL pools (split launches: resolve trace for
    # bounce rays, plain trace for shadow rays); every timed fn reduces to
    # a scalar
    carry, rays = carry0, ray0
    out_sh = None
    first = True
    total = 0.0
    for d in range(depth):
        t_tr = timeit(lambda r=rays: tr_sum(r))
        out = tr(rays)
        f = jax.jit(lambda c=carry, r=rays, o=out, s=out_sh, d=d, fi=first:
                    shd(d, fi, c, r, o, s))
        fs = jax.jit(
            lambda c=carry, r=rays, o=out, s=out_sh, d=d, fi=first:
            jnp.sum(shd(d, fi, c, r, o, s)[0][:, :128])
        )
        t_sh = timeit(fs)
        carry, nxt, shdw = f()
        live = float(jnp.sum(carry[:, sh.C_ACTIVE * 128:(sh.C_ACTIVE + 1) * 128]))
        t_shtr = timeit(lambda r=shdw: trp_sum(r))
        print(f"d={d}: trace({rays.shape[0]}r) {t_tr:7.1f} ms   "
              f"shade {t_sh:6.1f} ms   shadow-trace {t_shtr:6.1f} ms   "
              f"live {live/n*100:5.1f}%")
        total += t_tr + t_sh + t_shtr
        out_sh = trp(shdw)
        rays = nxt
        first = False
    print(f"stage sum: {total:7.1f} ms")


if __name__ == "__main__":
    main()
