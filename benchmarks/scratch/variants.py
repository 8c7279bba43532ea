"""Kernel-variant experiment: isolate the vote-tree slowdown.

Variants (same ClusterScene, same rays):
  ordered   — current production kernel (octant-ordered dynamic slots)
  plain     — tree traversal, slot = b (no order tables, no dynamic slots)
  flat      — round-1 structure: static word scan over the *cluster* level's
              parents (supers), fori depth 2, no ordering
Usage: python -m benchmarks.scratch.variants [cornell|city] [variant ...]
"""
from vkrt_tpu.utils.jaxcache import enable; enable()
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas import trace as T
from vkrt_tpu.ops.intersect import T_MAX, T_MIN
from vkrt_tpu.utils.camera import Camera, generate_rays, tile_perm

LANES, BLOCK_ROWS, FANOUT, CLUSTER, GROUP = (
    T.LANES, T.BLOCK_ROWS, T.FANOUT, T.CLUSTER, T.GROUP)


def make_kernel(variant, n_levels, t_min, true_super=0):
    def kernel(*refs):
        L = n_levels
        aabb_refs = refs[0:L]
        order_refs = refs[L:2 * L]
        tri_refs = refs[2 * L:2 * L + 9]
        rays_ref, out_ref = refs[2 * L + 9], refs[2 * L + 10]
        rays = rays_ref[:]
        ox = rays[:, 0 * LANES:1 * LANES]; oy = rays[:, 1 * LANES:2 * LANES]
        oz = rays[:, 2 * LANES:3 * LANES]; dx = rays[:, 3 * LANES:4 * LANES]
        dy = rays[:, 4 * LANES:5 * LANES]; dz = rays[:, 5 * LANES:6 * LANES]
        tm = rays[:, 6 * LANES:7 * LANES]

        def safe_inv(d):
            return pl.reciprocal(jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d), approx=False)
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        oct = ((jnp.sum(dx) >= 0.).astype(jnp.int32) * 4
               + (jnp.sum(dy) >= 0.).astype(jnp.int32) * 2
               + (jnp.sum(dz) >= 0.).astype(jnp.int32))
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 0)
        neg1 = pltpu.bitcast(jnp.full((BLOCK_ROWS, LANES), -1, jnp.int32), jnp.float32)
        out_ref[:] = jnp.concatenate(
            [tm, neg1, jnp.zeros((BLOCK_ROWS, 2 * LANES), jnp.float32)], axis=1)

        def cluster_work(c):
            tiles = T._cluster_tiles(tri_refs, c)
            for row in range(BLOCK_ROWS):
                oxr = ox[row:row + 1]; oyr = oy[row:row + 1]; ozr = oz[row:row + 1]
                dxr = dx[row:row + 1]; dyr = dy[row:row + 1]; dzr = dz[row:row + 1]
                t_row = out_ref[row:row + 1, 0:LANES]
                idx_row = pltpu.bitcast(out_ref[row:row + 1, LANES:2 * LANES], jnp.int32)
                u_row = out_ref[row:row + 1, 2 * LANES:3 * LANES]
                v_row = out_ref[row:row + 1, 3 * LANES:4 * LANES]
                for g in range(CLUSTER // GROUP):
                    base = c * CLUSTER + g * GROUP
                    t_c, u_c, v_c, *_ = T._mt_group(tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min)
                    t_min_g = jnp.min(t_c, axis=0, keepdims=True)
                    is_min = t_c == t_min_g
                    win_sub = jnp.min(jnp.where(is_min, sub_iota, GROUP), axis=0, keepdims=True)
                    pick = sub_iota == win_sub
                    u_g = jnp.sum(jnp.where(pick, u_c, 0.0), axis=0, keepdims=True)
                    v_g = jnp.sum(jnp.where(pick, v_c, 0.0), axis=0, keepdims=True)
                    improved = t_min_g < t_row
                    t_row = jnp.where(improved, t_min_g, t_row)
                    idx_row = jnp.where(improved, base + win_sub, idx_row)
                    u_row = jnp.where(improved, u_g, u_row)
                    v_row = jnp.where(improved, v_g, v_row)
                out_ref[row:row + 1, 0:LANES] = t_row
                out_ref[row:row + 1, LANES:2 * LANES] = pltpu.bitcast(idx_row, jnp.float32)
                out_ref[row:row + 1, 2 * LANES:3 * LANES] = u_row
                out_ref[row:row + 1, 3 * LANES:4 * LANES] = v_row

        def t_best():
            return out_ref[:, 0:LANES]

        def vote_children(aabb_ref, parent, lo_w, hi_w):
            t_lim = t_best()
            m = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
            for b in range(FANOUT):
                if lo_w is None:
                    child = parent * FANOUT + b
                else:
                    w = lo_w if b < 8 else hi_w
                    slot = ((w >> jnp.uint32(4 * (b % 8))) & jnp.uint32(15)).astype(jnp.int32)
                    child = parent * FANOUT + slot
                hit = T._slab_vote(aabb_ref, child, ox, oy, oz, ix, iy, iz, t_min, t_lim)
                m = m | jnp.where(hit, jnp.uint32(1 << b), jnp.uint32(0))
            return T._or_reduce_scalar(m)

        def visit(level, parent):
            aabb_ref = aabb_refs[level]
            if variant == "ordered":
                row = parent * 8 + oct
                lo_w = order_refs[level][row, 0].astype(jnp.uint32)
                hi_w = order_refs[level][row, 1].astype(jnp.uint32)
            else:
                lo_w = hi_w = None
            word = vote_children(aabb_ref, parent, lo_w, hi_w)

            def body(bit):
                if lo_w is None:
                    child = parent * FANOUT + bit
                else:
                    w = jnp.where(bit < 8, lo_w, hi_w)
                    sh = (4 * (bit & 7)).astype(jnp.uint32)
                    slot = ((w >> sh) & jnp.uint32(15)).astype(jnp.int32)
                    child = parent * FANOUT + slot
                if level == L - 1:
                    cluster_work(child)
                else:
                    visit(level + 1, child)
            T._for_each_set_bit(word, body)

        if variant == "flatcount":
            # diagnostic: the production flat traversal, but every cluster
            # visit just bumps a counter in out row 0 — reads back the TRUE
            # number of dynamic cluster visits per block on hardware
            out_ref[:] = jnp.zeros((BLOCK_ROWS, 4 * LANES), jnp.float32)
            aabb_sup = aabb_refs[L - 2]
            n_sup = -(-true_super // FANOUT) * FANOUT
            for w in range(n_sup // FANOUT):
                m = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
                for b in range(FANOUT):
                    hit = T._slab_vote(aabb_sup, w * FANOUT + b, ox, oy, oz,
                                       ix, iy, iz, t_min, jnp.float32(3e38))
                    m = m | jnp.where(hit, jnp.uint32(1 << b), jnp.uint32(0))
                word = T._or_reduce_scalar(m)

                def sbody(sb, w=w):
                    sparent = w * FANOUT + sb
                    mc = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
                    for cb in range(FANOUT):
                        h = T._slab_vote(aabb_refs[L - 1], sparent * FANOUT + cb,
                                         ox, oy, oz, ix, iy, iz, t_min,
                                         jnp.float32(3e38))
                        mc = mc | jnp.where(h, jnp.uint32(1 << cb), jnp.uint32(0))
                    cword = T._or_reduce_scalar(mc)

                    def cvisit(_k):
                        out_ref[0:1, 0:LANES] = out_ref[0:1, 0:LANES] + 1.0

                    T._for_each_set_bit(cword, cvisit)
                T._for_each_set_bit(word, sbody)
            return
        if variant in ("flat", "scan_only", "votes_only"):
            # production structure: static words over the supers (parents of
            # clusters), fori depth 2; scan only the REAL supers.
            # scan_only: skip everything below the super votes.
            # votes_only: run cluster votes but never the triangle work.
            aabb_sup = aabb_refs[L - 2]
            n_sup = -(-true_super // FANOUT) * FANOUT
            for w in range(n_sup // FANOUT):
                t_lim = t_best()
                m = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
                for b in range(FANOUT):
                    hit = T._slab_vote(aabb_sup, w * FANOUT + b, ox, oy, oz, ix, iy, iz, t_min, t_lim)
                    m = m | jnp.where(hit, jnp.uint32(1 << b), jnp.uint32(0))
                word = T._or_reduce_scalar(m)
                if variant == "scan_only":
                    # keep the word observable so nothing is folded away
                    out_ref[0:1, 0:LANES] = (
                        out_ref[0:1, 0:LANES] + word.astype(jnp.float32) * 1e-30
                    )
                    continue

                def sbody(sb, w=w):
                    sparent = w * FANOUT + sb
                    cword = vote_children(aabb_refs[L - 1], sparent, None, None)
                    if variant == "votes_only":
                        out_ref[0:1, 0:LANES] = (
                            out_ref[0:1, 0:LANES] + cword.astype(jnp.float32) * 1e-30
                        )
                    else:
                        T._for_each_set_bit(cword, lambda k, sp=sparent: cluster_work(sp * FANOUT + k))
                T._for_each_set_bit(word, sbody)
        elif variant.startswith("mt"):
            # no votes at all: statically run cluster_work on the first K
            # clusters per block — pure triangle-pipeline throughput
            for c in range(int(variant[2:])):
                cluster_work(c)
        elif variant.startswith("dyn"):
            # SAME K clusters but visited through a dynamic fori_loop —
            # isolates Mosaic's per-iteration cost for a loop body full of
            # vector work + out_ref row read/writes
            k = int(variant[3:])

            def dbody(c, carry):
                cluster_work(c)
                return carry

            jax.lax.fori_loop(0, k, dbody, 0)
        elif variant.startswith("bit"):
            # SAME K clusters through the production set-bit iterator
            # (ctz/popcount machinery + dynamic body)
            k = int(variant[3:])
            word = jnp.uint32((1 << k) - 1)
            T._for_each_set_bit(word, cluster_work)
        else:
            visit(0, jnp.int32(0))
    return kernel


def make_call(cs, variant):
    n_levels = len(cs.level_counts)
    kernel = make_kernel(variant, n_levels, T_MIN, true_super=cs.level_counts[-2])

    def call(orig, direction):
        t_lim = jnp.full(orig.shape[:1], T_MAX, jnp.float32)
        packed, n, rows = T._pack_rays(orig, direction, t_lim)
        chunks, chunk_rows = T._chunk_rows(packed, rows)
        ray_spec = pl.BlockSpec((T.PROG_ROWS, 7 * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((T.PROG_ROWS, 4 * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def chunk_body(chunk):
            out = pl.pallas_call(
                kernel, grid=(chunk_rows // T.PROG_ROWS,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_levels + 9) + [ray_spec],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((chunk_rows, 4 * LANES), jnp.float32),
            )(*cs.level_aabb, *cs.level_order, *cs.tri_cols, chunk)
            return jax.lax.optimization_barrier(out)
        out = jax.lax.map(chunk_body, chunks).reshape(-1, 4 * LANES)
        return out[:, 0:LANES].reshape(-1)[:n]
    return call


def slope_time(fn, o, d, reps_hi=8):
    def mk(reps):
        @jax.jit
        def run():
            def body(i, carry):
                oo, dd = carry
                out = fn(oo, dd)
                oo = jax.lax.optimization_barrier(oo + 1e-30 * out[:, None])
                return oo, dd
            oo, _ = jax.lax.fori_loop(0, reps, body, (o, d))
            return oo[0]
        return run
    f1, f8 = mk(1), mk(reps_hi)
    jax.device_get(f1()); jax.device_get(f8())
    t0 = time.perf_counter(); jax.device_get(f1()); t1 = time.perf_counter()
    jax.device_get(f8()); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps_hi - 1)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    variants = sys.argv[2:] or ["flat", "plain", "ordered"]
    scene = scene_mod.load_cornell() if which == "cornell" else scene_mod.make_city(grid=96)
    cs = T.build_cluster_scene(scene.tri_v0, scene.tri_e1, scene.tri_e2)
    print(f"{which}: tris={scene.num_tris} levels={cs.level_counts}")
    W, H = 1280, 720
    n = (W * H) // 1024 * 1024
    cam = Camera().matrices(W, H)
    o_p, d_p = generate_rays(cam, W, H, jnp.full((W * H, 2), 0.5, jnp.float32))
    perm, _ = tile_perm(W, H)
    o_t = jnp.take(o_p, jnp.asarray(perm), axis=0)[:n]
    d_t = jnp.take(d_p, jnp.asarray(perm), axis=0)[:n]
    for variant in variants:
        call = make_call(cs, variant)
        if variant == "flatcount":
            tvals = np.asarray(call(o_t, d_t))
            counts = tvals[::1024]
            print(f"  flatcount visits/block: mean {counts.mean():.1f} "
                  f"max {counts.max():.0f} p95 {np.percentile(counts, 95):.0f}")
            continue
        dt = slope_time(call, o_t, d_t)
        print(f"  {variant:8s} primary-tiled: {dt*1e3:8.2f} ms  {n/dt/1e6:6.2f} Mrays/s")
