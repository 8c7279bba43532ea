"""Fused Pallas trace kernels: cluster-culled ray-triangle intersection.

The TPU-native replacement for hardware BVH traversal where it matters — the
hot ``traceRayEXT`` loop. Design (see SURVEY.md §7 hard-parts):

* Triangles are Morton-sorted and packed into **clusters of 64** (contiguous
  leaf ranges, so clusters are spatially tight); clusters group into
  **superclusters of 16**. Cluster/super AABBs live in SMEM, triangle SoA
  components in VMEM as (T_pad, 1) column vectors.
* One kernel program processes a **block of 1024 rays** (an (8, 128) tile per
  ray component). Per supercluster word, the block takes slab-test **votes**:
  per-lane hit bits for up to WORD boxes OR-fold into ONE scalar bitmask
  (3 sublane folds + 7 lane rotations + one reduction — per-box ``jnp.any``
  syncs cost ~400 cycles each and dominated the kernel), then only the set
  bits are visited (popcount/ctz iteration, no branches). Work-skipping by
  data-dependent scalar control is exactly what XLA's vectorized model
  cannot express and where Pallas earns its keep; with coherent rays this
  cuts tested triangles by 1-2 orders of magnitude.
* Surviving clusters run an all-vector Möller-Trumbore: triangle components
  broadcast as (8, 1) group columns against (1, 128) ray rows — 1024
  ray-triangle pairs per VPU op, no per-lane gathers, no scalar loads in the
  inner loop.
* Closest-hit keeps per-ray running ``t_best`` in VMEM scratch, which also
  tightens the votes as the block converges; any-hit (shadow rays) votes with
  the not-yet-hit mask so fully-shadowed blocks stop testing.

Rays per component are laid out (n_blocks*8, 128) so the grid BlockSpec
slices one (8, 128) tile per program — fully pipelined by Mosaic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER = 64          # triangles per cluster
GROUP = 8             # triangles per inner vector step (sublane dim)
SUPER = 16            # clusters per supercluster
BLOCK_ROWS = 8        # ray rows per vote group -> 8*128 = 1024 rays (min sublane tile)
SUBS = 1              # vote groups per kernel program (4 measured within noise of 1)
WORD = 16             # boxes per vote word (the Mosaic compile helper crashes
                      # on words unrolling more than ~26 slab tests)
PROG_ROWS = BLOCK_ROWS * SUBS
LANES = 128
INF = 3e38  # python float: jnp scalars would be captured as kernel constants
_DET_EPS = 1e-9


class ClusterScene(NamedTuple):
    """Triangle data packed for the kernels (host-built, device-resident)."""

    tri_cols: tuple          # 9 arrays (T_pad//128, 128) f32: v0,e1,e2 xyz,
                             # row-major packed (lane-dim fully utilized;
                             # (T,1) columns would pad lanes 128x and blow
                             # past the 128MB VMEM at ~27k triangle slots)
    cluster_aabb: jnp.ndarray  # (n_clusters, 8) f32 (minxyz, maxxyz, pad)
    super_aabb: jnp.ndarray    # (n_super, 8) f32
    tri_remap: jnp.ndarray     # (T_pad,) i32: packed slot -> original tri id
    n_clusters: int
    n_super: int


def build_cluster_scene(tri_v0, tri_e1, tri_e2) -> ClusterScene:
    """Pack triangles into clusters + AABB hierarchy for the kernels.

    Prefers the native binned-SAH decomposition (native/bvh_builder.cpp via
    utils.native) — SAH subtrees give tighter cluster boxes than Morton runs,
    which directly cuts the triangles each ray block tests. Falls back to
    Morton-order clustering when the native library is unavailable.
    """
    from vkrt_tpu.utils import native

    sah = native.build_sah_clusters(
        np.asarray(tri_v0, np.float32),
        np.asarray(tri_e1, np.float32),
        np.asarray(tri_e2, np.float32),
        CLUSTER,
        SUPER,
    )
    if sah is not None:
        return _pack_cluster_scene_from_order(tri_v0, tri_e1, tri_e2, *sah)
    return _build_cluster_scene_morton(tri_v0, tri_e1, tri_e2)


def _pack_cluster_scene_from_order(
    tri_v0, tri_e1, tri_e2, tri_order, cluster_aabb, super_aabb, n_clusters, n_super
) -> ClusterScene:
    v0 = np.asarray(tri_v0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    t_pad = n_clusters * CLUSTER
    valid = tri_order >= 0
    safe = np.where(valid, tri_order, 0)

    def col(a, j):
        out = np.where(valid, a[safe, j], 0.0).astype(np.float32)
        return jnp.asarray(out.reshape(-1, 128))

    tri_cols = tuple(col(a, j) for a in (v0, e1, e2) for j in range(3))

    def pack_aabb(boxes):
        out = np.zeros((len(boxes), 8), np.float32)
        out[:, :6] = boxes
        return jnp.asarray(out)

    return ClusterScene(
        tri_cols=tri_cols,
        cluster_aabb=pack_aabb(cluster_aabb),
        super_aabb=pack_aabb(super_aabb),
        tri_remap=jnp.asarray(np.where(valid, tri_order, 0).astype(np.int32)),
        n_clusters=int(n_clusters),
        n_super=int(n_super),
    )


def _build_cluster_scene_morton(tri_v0, tri_e1, tri_e2) -> ClusterScene:
    from vkrt_tpu.bvh.lbvh import morton3d

    v0 = np.asarray(tri_v0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    n = len(v0)
    v1 = v0 + e1
    v2 = v0 + e2
    bmin = np.minimum(np.minimum(v0, v1), v2)
    bmax = np.maximum(np.maximum(v0, v1), v2)
    # degenerate padding triangles (all-zero) would pollute cluster bounds at
    # the origin; give them inverted boxes so they never vote a cluster in
    degen = (np.abs(e1).sum(1) == 0) & (np.abs(e2).sum(1) == 0)
    centroid = 0.5 * (bmin + bmax)
    lo, hi = centroid.min(0), centroid.max(0)
    codes = np.asarray(morton3d(jnp.asarray((centroid - lo) / np.maximum(hi - lo, 1e-12))))
    order = np.argsort(
        codes.astype(np.int64) * (n + 1) + np.arange(n), kind="stable"
    )
    # push degenerate pad tris to the end so real clusters stay tight
    order = np.concatenate([order[~degen[order]], order[degen[order]]])

    n_clusters = -(-n // CLUSTER)
    n_super = -(-n_clusters // SUPER)
    n_clusters_pad = n_super * SUPER
    t_pad = n_clusters_pad * CLUSTER

    remap = np.full(t_pad, 0, np.int32)
    remap[:n] = order
    valid = np.zeros(t_pad, bool)
    valid[:n] = ~degen[order]

    def col(a, j):
        out = np.zeros(t_pad, np.float32)
        out[:n] = np.where(valid[:n], a[order, j], 0.0)
        return jnp.asarray(out.reshape(-1, 128))

    tri_cols = tuple(
        jnp.asarray(col(a, j))
        for a in (v0, e1, e2)
        for j in range(3)
    )

    cmin = np.full((n_clusters_pad, 3), np.inf, np.float32)
    cmax = np.full((n_clusters_pad, 3), -np.inf, np.float32)
    bmin_o = bmin[order]
    bmax_o = bmax[order]
    for c in range(n_clusters):
        s, e = c * CLUSTER, min((c + 1) * CLUSTER, n)
        m = valid[s:e]
        if m.any():
            cmin[c] = bmin_o[s:e][m].min(0)
            cmax[c] = bmax_o[s:e][m].max(0)
    smin = np.full((n_super, 3), np.inf, np.float32)
    smax = np.full((n_super, 3), -np.inf, np.float32)
    for s in range(n_super):
        block = cmin[s * SUPER : (s + 1) * SUPER]
        finite = np.isfinite(block[:, 0])
        if finite.any():
            smin[s] = block[finite].min(0)
            smax[s] = cmax[s * SUPER : (s + 1) * SUPER][finite].max(0)

    def pack_aabb(mn, mx):
        out = np.zeros((len(mn), 8), np.float32)
        out[:, :3] = mn
        out[:, 3:6] = mx
        return jnp.asarray(out)

    return ClusterScene(
        tri_cols=tri_cols,
        cluster_aabb=pack_aabb(cmin, cmax),
        super_aabb=pack_aabb(smin, smax),
        tri_remap=jnp.asarray(remap),
        n_clusters=n_clusters_pad,
        n_super=n_super,
    )


def _slab_vote(aabb_ref, idx, ox, oy, oz, ix, iy, iz, t_min, t_lim):
    """AABB slab test of one box (scalars from SMEM) vs an (8,128) ray tile.
    Returns ((8,128) bool hit, per-ray tnear unused)."""
    minx = aabb_ref[idx, 0]
    miny = aabb_ref[idx, 1]
    minz = aabb_ref[idx, 2]
    maxx = aabb_ref[idx, 3]
    maxy = aabb_ref[idx, 4]
    maxz = aabb_ref[idx, 5]
    tx0 = (minx - ox) * ix
    tx1 = (maxx - ox) * ix
    ty0 = (miny - oy) * iy
    ty1 = (maxy - oy) * iy
    tz0 = (minz - oz) * iz
    tz1 = (maxz - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_lim),
    )
    return tnear <= tfar


def _cluster_tiles(tri_refs, c):
    """Extract cluster c's triangle components as 9 lists of 8 (8, 1) group
    columns. A cluster's 64 slots occupy half of one packed (.., 128) row:
    load the row, select the half by the cluster's parity (scalar pred),
    then cut static (1, 8) group slices and pivot each to a sublane column —
    the only shape cast Mosaic supports here ((1,64)->(8,8) reshapes and
    dynamic lane slicing are rejected / crash the compile helper)."""
    row = c // 2
    hi_half = (c % 2) == 1
    tiles = []
    for r in tri_refs:
        full = r[pl.ds(row, 1), :]                       # (1,128)
        half = jnp.where(hi_half, full[:, 64:], full[:, :64])  # (1,64)
        tiles.append(
            [
                half[:, g * GROUP : (g + 1) * GROUP].reshape(GROUP, 1)
                for g in range(CLUSTER // GROUP)
            ]
        )
    return tiles


def _mt_group(
    tiles, g, ox, oy, oz, dx, dy, dz, t_min
):
    """Möller-Trumbore for an 8-triangle group vs a 128-ray row.

    tri components come as (8,1) columns from the cluster tiles, ray
    components are (1,128) rows; every op below computes 1024 ray-triangle
    pairs. Returns (t, u, v, valid) all (8,128) with t = INF where invalid.
    """
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (comp[g] for comp in tiles)
    # pvec = cross(d, e2)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, pl.reciprocal(det, approx=False), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = cross(tvec, e1)
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(valid, t, INF), u, v, valid


def _or_reduce_scalar(mask):
    """(8,128) uint32 bitmask -> scalar uint32 OR over every lane.

    The naive per-box ``jnp.any`` costs a full vector->scalar sync (~400
    cycles) per box and was measured to dominate the whole kernel; this
    folds 32 boxes' votes into ONE sync: 3 sublane folds + 7 lane rotations
    leave the OR of all 1024 lanes in every element, then a single scalar
    reduction extracts it.
    """
    m = mask[0:4, :] | mask[4:8, :]
    m = m[0:2, :] | m[2:4, :]
    m = m[0:1, :] | m[1:2, :]
    for sh in (64, 32, 16, 8, 4, 2, 1):
        m = m | pltpu.roll(m, sh, 1)
    # every lane now holds the identical OR; Mosaic lacks unsigned reductions,
    # so bitcast and pick the common value with a signed max (sign-safe since
    # all values are equal). Bit tests downstream use (x >> k) & 1, which is
    # correct under arithmetic shift too.
    return jnp.max(pltpu.bitcast(m, jnp.int32))


def _vote_word(aabb_ref, base, count, ox, oy, oz, ix, iy, iz, t_min, t_lim):
    """Slab-test up to WORD consecutive boxes against the ray block; returns a
    scalar with bit b set iff any ray can hit box base+b."""
    m = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
    for b in range(count):  # static unroll
        hit = _slab_vote(aabb_ref, base + b, ox, oy, oz, ix, iy, iz, t_min, t_lim)
        m = m | jnp.where(hit, jnp.uint32(1 << b), jnp.uint32(0))
    return _or_reduce_scalar(m)


def _popcount32(x):
    """Scalar population count (uint32)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _ctz32(x):
    """Scalar count-trailing-zeros (x != 0), 5-step binary search."""
    c = jnp.int32(0)
    for shift, mask in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        low = x & jnp.uint32(mask)
        zero = low == 0
        c = c + jnp.where(zero, shift, 0)
        x = jnp.where(zero, x >> shift, x)
    return c


def _for_each_set_bit(word, body):
    """Run ``body(bit_index)`` for every set bit of the scalar vote word.

    Iterating only voted entries (popcount iterations, next bit by ctz)
    replaces the dense fori + pl.when pattern whose per-iteration scalar
    overhead dominated the kernel (tri work measured ~free; votes + loop
    machinery were ~100% of runtime)."""
    word_u = word.astype(jnp.uint32)

    def step(_, w):
        body(_ctz32(w))
        return w & (w - jnp.uint32(1))

    jax.lax.fori_loop(0, _popcount32(word_u), step, word_u)


def _closest_kernel(
    n_super: int,
    t_min: float,
    t_max: float,
    super_ref,
    cluster_ref,
    *rest,
):
    tri_refs = rest[:9]
    rays_ref, out_ref = rest[9], rest[10]
    # rays arrive as ONE packed (PROG_ROWS, 6*128) block and results leave as
    # ONE packed (PROG_ROWS, 4*128) block ([t | idx-bits | u | v]): a single
    # DMA each way instead of ten — small-block DMA latency (~2-3us each,
    # poorly overlapped) was a large share of the per-program floor.
    rays = rays_ref[:]
    ox_a = rays[:, 0 * LANES : 1 * LANES]
    oy_a = rays[:, 1 * LANES : 2 * LANES]
    oz_a = rays[:, 2 * LANES : 3 * LANES]
    dx_a = rays[:, 3 * LANES : 4 * LANES]
    dy_a = rays[:, 4 * LANES : 5 * LANES]
    dz_a = rays[:, 5 * LANES : 6 * LANES]

    def safe_inv(d):
        return pl.reciprocal(
            jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d),
            approx=False,
        )

    neg1_bits = pltpu.bitcast(
        jnp.full((PROG_ROWS, LANES), -1, jnp.int32), jnp.float32
    )
    out_ref[:] = jnp.concatenate(
        [
            jnp.full((PROG_ROWS, LANES), INF, jnp.float32),
            neg1_bits,
            jnp.zeros((PROG_ROWS, 2 * LANES), jnp.float32),
        ],
        axis=1,
    )

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 0)

    # each program handles SUBS independent 1024-ray vote groups: same vote
    # granularity as one-group programs, 1/SUBS the per-program overhead
    for sub in range(SUBS):
        rb = sub * BLOCK_ROWS
        sl = pl.ds(rb, BLOCK_ROWS)
        ox, oy, oz = ox_a[rb : rb + BLOCK_ROWS], oy_a[rb : rb + BLOCK_ROWS], oz_a[rb : rb + BLOCK_ROWS]
        dx, dy, dz = dx_a[rb : rb + BLOCK_ROWS], dy_a[rb : rb + BLOCK_ROWS], dz_a[rb : rb + BLOCK_ROWS]
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def cluster_work(c, ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz, rb=rb):
            """Test all 64 triangles of cluster c against this ray group."""
            tiles = _cluster_tiles(tri_refs, c)
            for row in range(BLOCK_ROWS):  # static unroll: 128 rays per row
                oxr = ox[row : row + 1, :]
                oyr = oy[row : row + 1, :]
                ozr = oz[row : row + 1, :]
                dxr = dx[row : row + 1, :]
                dyr = dy[row : row + 1, :]
                dzr = dz[row : row + 1, :]
                r = rb + row
                t_row = out_ref[r : r + 1, 0:LANES]
                idx_row = pltpu.bitcast(
                    out_ref[r : r + 1, LANES : 2 * LANES], jnp.int32
                )
                u_row = out_ref[r : r + 1, 2 * LANES : 3 * LANES]
                v_row = out_ref[r : r + 1, 3 * LANES : 4 * LANES]
                for g in range(CLUSTER // GROUP):
                    base = c * CLUSTER + g * GROUP
                    t_c, u_c, v_c, valid = _mt_group(
                        tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min
                    )
                    t_c = jnp.where(t_c < t_max, t_c, INF)
                    # reduce 8 candidate triangles -> best per lane
                    t_min_g = jnp.min(t_c, axis=0, keepdims=True)  # (1,128)
                    is_min = t_c == t_min_g
                    win_sub = jnp.min(
                        jnp.where(is_min, sub_iota, GROUP), axis=0, keepdims=True
                    )
                    pick = sub_iota == win_sub
                    u_g = jnp.sum(jnp.where(pick, u_c, 0.0), axis=0, keepdims=True)
                    v_g = jnp.sum(jnp.where(pick, v_c, 0.0), axis=0, keepdims=True)
                    improved = t_min_g < t_row
                    t_row = jnp.where(improved, t_min_g, t_row)
                    idx_g = base + win_sub
                    idx_row = jnp.where(improved, idx_g, idx_row)
                    u_row = jnp.where(improved, u_g, u_row)
                    v_row = jnp.where(improved, v_g, v_row)
                out_ref[r : r + 1, 0:LANES] = t_row
                out_ref[r : r + 1, LANES : 2 * LANES] = pltpu.bitcast(
                    idx_row, jnp.float32
                )
                out_ref[r : r + 1, 2 * LANES : 3 * LANES] = u_row
                out_ref[r : r + 1, 3 * LANES : 4 * LANES] = v_row

        def t_best(sl=sl):
            return out_ref[sl, 0:LANES]

        def visit_super(s, ox=ox, oy=oy, oz=oz, ix=ix, iy=iy, iz=iz,
                        cluster_work=cluster_work, t_best=t_best):
            cword = _vote_word(
                cluster_ref, s * SUPER, SUPER, ox, oy, oz, ix, iy, iz,
                t_min, t_best(),
            )
            _for_each_set_bit(cword, lambda k: cluster_work(s * SUPER + k))

        for w in range(-(-n_super // WORD)):  # static words of <= WORD supers
            count = min(WORD, n_super - w * WORD)
            sword = _vote_word(
                super_ref, w * WORD, count, ox, oy, oz, ix, iy, iz,
                t_min, t_best(),
            )
            _for_each_set_bit(
                sword, lambda sb, w=w: visit_super(w * WORD + sb)
            )


def _any_kernel(
    n_super: int,
    t_min: float,
    super_ref,
    cluster_ref,
    *rest,
):
    tri_refs = rest[:9]
    rays_ref, hit_out = rest[9], rest[10]
    rays = rays_ref[:]  # (PROG_ROWS, 7*128): o, d, tmax packed
    ox_a = rays[:, 0 * LANES : 1 * LANES]
    oy_a = rays[:, 1 * LANES : 2 * LANES]
    oz_a = rays[:, 2 * LANES : 3 * LANES]
    dx_a = rays[:, 3 * LANES : 4 * LANES]
    dy_a = rays[:, 4 * LANES : 5 * LANES]
    dz_a = rays[:, 5 * LANES : 6 * LANES]
    tm_a = rays[:, 6 * LANES : 7 * LANES]

    def safe_inv(d):
        return pl.reciprocal(
            jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d),
            approx=False,
        )

    hit_out[:] = jnp.zeros((PROG_ROWS, LANES), jnp.int32)

    for sub in range(SUBS):
        rb = sub * BLOCK_ROWS
        sl = pl.ds(rb, BLOCK_ROWS)
        ox, oy, oz = ox_a[rb : rb + BLOCK_ROWS], oy_a[rb : rb + BLOCK_ROWS], oz_a[rb : rb + BLOCK_ROWS]
        dx, dy, dz = dx_a[rb : rb + BLOCK_ROWS], dy_a[rb : rb + BLOCK_ROWS], dz_a[rb : rb + BLOCK_ROWS]
        tmax = tm_a[rb : rb + BLOCK_ROWS]
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def cluster_work(c, ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                         tmax=tmax, rb=rb):
            tiles = _cluster_tiles(tri_refs, c)
            for row in range(BLOCK_ROWS):
                oxr = ox[row : row + 1, :]
                oyr = oy[row : row + 1, :]
                ozr = oz[row : row + 1, :]
                dxr = dx[row : row + 1, :]
                dyr = dy[row : row + 1, :]
                dzr = dz[row : row + 1, :]
                tmax_row = tmax[row : row + 1, :]
                r = rb + row
                hit_row = hit_out[r : r + 1, :]
                for g in range(CLUSTER // GROUP):
                    t_c, _, _, _ = _mt_group(
                        tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min
                    )
                    any_hit = jnp.any(t_c < tmax_row, axis=0, keepdims=True)
                    hit_row = jnp.where(any_hit, 1, hit_row)
                hit_out[r : r + 1, :] = hit_row

        def visit_super(s, ox=ox, oy=oy, oz=oz, ix=ix, iy=iy, iz=iz,
                        tmax=tmax, cluster_work=cluster_work, sl=sl):
            live = hit_out[sl, :] == 0
            t_live = jnp.where(live, tmax, t_min)  # already-hit lanes cull all
            cword = _vote_word(
                cluster_ref, s * SUPER, SUPER, ox, oy, oz, ix, iy, iz,
                t_min, t_live,
            )
            _for_each_set_bit(cword, lambda k: cluster_work(s * SUPER + k))

        for w in range(-(-n_super // WORD)):  # static words of <= WORD supers
            count = min(WORD, n_super - w * WORD)
            live_w = hit_out[sl, :] == 0
            t_live_w = jnp.where(live_w, tmax, t_min)
            sword = _vote_word(
                super_ref, w * WORD, count, ox, oy, oz, ix, iy, iz,
                t_min, t_live_w,
            )
            _for_each_set_bit(
                sword, lambda sb, w=w: visit_super(w * WORD + sb)
            )


# Rows of 128 rays per lax.map chunk. Chunking bounds the scoped-VMEM
# footprint XLA assigns to the kernel's operands/outputs when the call sits
# inside the frame loop (whole-frame buffers tripped compile-time VMEM OOM).
CHUNK_ROWS = 1200  # must be a PROG_ROWS multiple; bounds scoped-VMEM at any resolution


def _pack_rays(orig, direction, extra=None):
    """Pad to PROG_ROWS blocks and pack components lane-wise into ONE array:
    (rows, 6*128) [+ extra column block], so each kernel program takes a
    single input DMA."""
    n = orig.shape[0]
    block = PROG_ROWS * LANES
    n_pad = (-n) % block
    if n_pad:
        # park pad-ray origins at 1e30 (like bounce_chain's dead lanes): an
        # origin-0/dir-0 pad would still slab-test positive for any box
        # spanning the world origin (safe_inv maps dir=0 to +-1e20) and vote
        # clusters in for discarded work
        orig = jnp.concatenate([orig, jnp.full((n_pad, 3), 1e30, orig.dtype)])
        direction = jnp.concatenate([direction, jnp.zeros((n_pad, 3), direction.dtype)])
        if extra is not None:
            extra = jnp.concatenate([extra, jnp.full((n_pad,), -1.0, extra.dtype)])
    total = orig.shape[0]
    rows = total // LANES

    comps = [orig[:, j].reshape(rows, LANES) for j in range(3)]
    comps += [direction[:, j].reshape(rows, LANES) for j in range(3)]
    if extra is not None:
        comps.append(extra.reshape(rows, LANES))
    return jnp.concatenate(comps, axis=1), n, rows


def _chunk_rows(packed, rows):
    """Reshape (rows, C) to (n_chunks, chunk, C), padding rows to a chunk
    multiple. Pad rays get origin=1e30 / dir=0 so every slab test rejects
    them (origin-0 pads would vote in boxes spanning the world origin)."""
    chunk = min(CHUNK_ROWS, rows)
    pad = (-rows) % chunk
    if pad:
        pad_row = jnp.zeros((packed.shape[1],), packed.dtype)
        pad_row = pad_row.at[: 3 * LANES].set(1e30)
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(pad_row, (pad, packed.shape[1]))]
        )
    return packed.reshape(-1, chunk, packed.shape[1]), chunk


@functools.partial(
    jax.jit, static_argnames=("cs_static", "t_min", "t_max", "interpret")
)
def _closest_call(cs: ClusterScene, orig, direction, cs_static, t_min, t_max, interpret):
    n_clusters, n_super = cs_static
    packed, n, rows = _pack_rays(orig, direction)
    chunks, chunk_rows = _chunk_rows(packed, rows)
    ray_spec = pl.BlockSpec(
        (PROG_ROWS, 6 * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (PROG_ROWS, 4 * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_closest_kernel, n_super, t_min, t_max)

    def chunk_body(chunk):
        out = pl.pallas_call(
            kernel,
            grid=(chunk_rows // PROG_ROWS,),
            in_specs=[
                # AABB tables live in VMEM: SMEM overflows past ~2k clusters
                # and Mosaic supports scalar loads from VMEM refs
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
                ray_spec,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((chunk_rows, 4 * LANES), jnp.float32),
            interpret=interpret,
        )(cs.super_aabb, cs.cluster_aabb, *cs.tri_cols, chunk)
        # barrier: stop XLA from fusing/holding the frame-sized outputs in
        # scoped VMEM (repeated compile-time VMEM OOMs without it)
        return jax.lax.optimization_barrier(out)

    out = jax.lax.map(chunk_body, chunks).reshape(-1, 4 * LANES)
    t = out[:, 0:LANES].reshape(-1)[:n]
    idx = jax.lax.bitcast_convert_type(
        out[:, LANES : 2 * LANES], jnp.int32
    ).reshape(-1)[:n]
    u = out[:, 2 * LANES : 3 * LANES].reshape(-1)[:n]
    v = out[:, 3 * LANES : 4 * LANES].reshape(-1)[:n]
    hit = idx >= 0
    tri = jnp.take(cs.tri_remap, jnp.maximum(idx, 0))
    return hit, jnp.where(hit, t, 0.0), jnp.where(hit, tri, -1), u, v


@functools.partial(jax.jit, static_argnames=("cs_static", "t_min", "interpret"))
def _any_call(cs: ClusterScene, orig, direction, t_max_per_ray, cs_static, t_min, interpret):
    n_clusters, n_super = cs_static
    packed, n, rows = _pack_rays(orig, direction, extra=t_max_per_ray)
    chunks, chunk_rows = _chunk_rows(packed, rows)
    ray_spec = pl.BlockSpec(
        (PROG_ROWS, 7 * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (PROG_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_any_kernel, n_super, t_min)

    def chunk_body(chunk):
        out = pl.pallas_call(
            kernel,
            grid=(chunk_rows // PROG_ROWS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
                ray_spec,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((chunk_rows, LANES), jnp.int32),
            interpret=interpret,
        )(cs.super_aabb, cs.cluster_aabb, *cs.tri_cols, chunk)
        return jax.lax.optimization_barrier(out)

    out = jax.lax.map(chunk_body, chunks)
    return out.reshape(-1)[:n] > 0


class PallasTracer(NamedTuple):
    """Trace backend running the fused cluster kernels."""

    cs: ClusterScene
    interpret: bool

    def closest(self, orig, direction, t_min, t_max):
        from vkrt_tpu.ops.trace import HitInfo

        hit, t, tri, u, v = _closest_call(
            self.cs,
            orig,
            direction,
            (self.cs.n_clusters, self.cs.n_super),
            float(t_min),
            float(t_max),
            self.interpret,
        )
        return HitInfo(hit=hit, t=t, tri=tri, u=u, v=v)

    def any(self, orig, direction, t_min, t_max):
        t_max_per_ray = jnp.broadcast_to(
            jnp.asarray(t_max, orig.dtype), orig.shape[:1]
        )
        return _any_call(
            self.cs,
            orig,
            direction,
            t_max_per_ray,
            (self.cs.n_clusters, self.cs.n_super),
            float(t_min),
            self.interpret,
        )


def make_pallas_tracer(scene, interpret: bool = None) -> PallasTracer:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cs = build_cluster_scene(scene.tri_v0, scene.tri_e1, scene.tri_e2)
    return PallasTracer(cs=cs, interpret=interpret)
