"""Round-3: footprint statistics of the REAL fused bounce pools.

Generates the production packed pipeline's actual fused (bounce+shadow) ray
pools at depth 1 and 2, then measures, per 1024-lane kernel block:

  * dynamic cluster visits (variants.py flatcount kernel on hardware)
  * live-lane fraction and octant purity (numpy, from the pool itself)

This is the evidence base for the incoherent-pool work (VERDICT item 2):
visits/block >> per-ray footprint means block-granularity union work
dominates the fused trace.

Usage: python -m benchmarks.scratch.poolstats [cornell|city]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()  # noqa: E702
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer, LANES
from vkrt_tpu.ops.pallas import shade as sh
from vkrt_tpu.ops.rng import tea
from vkrt_tpu.utils.camera import Camera, generate_rays, pixel_coords, tile_perm
from benchmarks.scratch import variants as V


def pools(scene, pt, w, h, depth):
    """Return [(label, rays_packed)] for each trace launch of the frame."""
    n = w * h
    perm, _ = tile_perm(w, h)
    pix = jnp.take(pixel_coords(w, h), jnp.asarray(perm), axis=0)
    pid = jnp.asarray(perm).astype(jnp.uint32)
    cam = Camera().matrices(w, h)
    origin, direction = generate_rays(cam, w, h, jnp.full((n, 2), 0.5), pix=pix)
    seeds = tea(pid, jnp.uint32(1))
    mat_tab, light_tab = sh.scene_tables(scene)
    # params row: [clear rgb | clamp lo | clamp hi | pad] — clamp off is
    # the [-inf, +inf] identity (models.shading.clamp_bounds)
    params = (jnp.zeros((1, 8), jnp.float32)
              .at[0, :3].set(1.0)
              .at[0, 3].set(-jnp.inf)
              .at[0, 4].set(jnp.inf))
    act = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    ray = sh.pack_lanes(
        [origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         jnp.full((n,), T_MAX, jnp.float32)], n)
    carry = sh.pack_lanes(
        [jax.lax.bitcast_convert_type(seeds, jnp.float32),
         act, act, act, zeros, zeros, zeros, act, zeros, zeros, zeros,
         zeros, zeros, zeros, zeros], n)
    out_pools = [("primary", ray)]
    if not pt.resolves_attrs:
        # textured / over-budget scenes run the XLA bounce path in
        # production; evolve the pools the same way (surface_at_hit +
        # sample_bsdf on the plain trace results), INCLUDING the round-4
        # correlated per-block draws (production default) — without them
        # the measured footprint is the obsolete independent-draw one
        from vkrt_tpu.models.shading import sample_bsdf, surface_at_hit
        from vkrt_tpu.ops.rng import corr_draws, tea as _tea

        corr_seed = _tea(jnp.uint32(1), jnp.uint32(0x9E3779B9))
        o, di, sd = origin, direction, seeds
        active = jnp.ones((n,), bool)
        for d in range(depth):
            hi = pt.closest(o, di, T_MIN, T_MAX,
                            t_lim=jnp.where(active, T_MAX, -1.0))
            miss = ~hi.hit & active | ~active
            surf = surface_at_hit(scene, jnp.maximum(hi.tri, 0), hi.u, hi.v, di)
            bs = sample_bsdf(scene, surf, di, sd, (d == 0) | jnp.zeros((n,), bool),
                             corr=corr_draws(n, corr_seed, d))
            do_shadow = active & ~miss & ~bs.is_specular
            sh_o = jnp.where(do_shadow[:, None], surf.world_pos, 1e30)
            sh_d = jnp.where(do_shadow[:, None], bs.shadow_dir, 0.0)
            sh_l = jnp.where(do_shadow, jnp.maximum(bs.light_dist - 0.1, T_MIN), -1.0)
            out_pools.append((f"shadow d={d}", sh.pack_lanes(
                [sh_o[:, 0], sh_o[:, 1], sh_o[:, 2],
                 sh_d[:, 0], sh_d[:, 1], sh_d[:, 2], sh_l], n)))
            active = active & ~miss
            o = jnp.where(active[:, None], surf.world_pos, 1e30)
            di = jnp.where(active[:, None], bs.next_dir, 0.0)
            sd = bs.seed
            if d < depth - 1:
                out_pools.append((f"bounce d={d + 1}", sh.pack_lanes(
                    [o[:, 0], o[:, 1], o[:, 2], di[:, 0], di[:, 1], di[:, 2],
                     jnp.where(active, T_MAX, -1.0)], n)))
        return out_pools
    first = True
    out_sh = None
    # round-4 production default: correlated per-block draws ride as extra
    # params rows (bounce_chain_packed wiring) — footprints without them
    # are the obsolete independent-draw ones
    from vkrt_tpu.ops.rng import block_table_rep, tea as _tea

    corr_seed = _tea(jnp.uint32(1), jnp.uint32(0x9E3779B9))
    n_blocks = carry.shape[0] // sh.PROG_ROWS
    for d in range(depth):
        params_d = jnp.concatenate(
            [params, block_table_rep(n_blocks, corr_seed, d)], axis=0)
        out = pt.closest_packed(ray, T_MIN)
        carry, nxt, shdw = sh.shade_call(
            mat_tab, light_tab, params_d, carry, ray, out,
            d=d, first=first, resolve_hd=(not first and d - 1 == 1),
            n_mats=int(scene.mat_base_color.shape[0]),
            n_lights=int(scene.num_lights), hitdist_weight=1.0,
            hitdist_accumulate=False,
            t_min=T_MIN, t_max=T_MAX, interpret=False,
            trace_out_shadow=out_sh, corr=True)
        out_sh = pt.closest_packed_plain(shdw, T_MIN)
        out_pools.append((f"shadow d={d}", shdw))
        if d < depth - 1:
            ray = nxt
            out_pools.append((f"bounce d={d + 1}", ray))
        first = False
    return out_pools


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    scene = (scene_mod.load_cornell() if which == "cornell"
             else scene_mod.make_city(grid=96))
    pt = make_pallas_tracer(scene)
    cs = pt.cs
    print(f"{which}: tris={scene.num_tris} levels={cs.level_counts}")
    count_call = V.make_call(cs, "flatcount")

    for label, packed in pools(scene, pt, 1280, 720, 3):
        p = np.asarray(packed)
        rows = p.shape[0]
        o = np.stack([p[:, k * LANES:(k + 1) * LANES].ravel()
                      for k in range(3)], axis=-1)
        d = np.stack([p[:, k * LANES:(k + 1) * LANES].ravel()
                      for k in range(3, 6)], axis=-1)
        t_lim = p[:, 6 * LANES:7 * LANES].ravel()
        live = t_lim > 0.0
        n = o.shape[0] // 1024 * 1024
        # octant purity per block, live lanes only
        oc = ((d[:n, 0] >= 0) * 4 + (d[:n, 1] >= 0) * 2
              + (d[:n, 2] >= 0)).reshape(-1, 1024)
        lv = live[:n].reshape(-1, 1024)
        purity = []
        for i in range(oc.shape[0]):
            if lv[i].sum() == 0:
                continue
            c = np.bincount(oc[i][lv[i]], minlength=8)
            purity.append(c.max() / c.sum())
        purity = np.asarray(purity) if purity else np.asarray([1.0])
        tvals = np.asarray(count_call(jnp.asarray(o[:n]), jnp.asarray(d[:n])))
        visits = tvals[::1024]
        print(f"{label:13s} rows={rows:6d} live={live.mean()*100:5.1f}%  "
              f"visits/blk mean {visits.mean():6.1f} p95 "
              f"{np.percentile(visits, 95):5.0f} max {visits.max():4.0f}  "
              f"octant purity mean {purity.mean():.2f} p5 "
              f"{np.percentile(purity, 5):.2f}")


if __name__ == "__main__":
    main()
