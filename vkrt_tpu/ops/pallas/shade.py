"""Pallas shade kernel: the rchit/BSDF/NEE stage on packed lane-dense blocks.

Round-3 stage profiling showed the XLA shading stage costs ~44 ms/bounce on
Cornell even AFTER in-kernel attribute resolve removed its gathers: the cost
is (N,3)-layout vector math (125/128 lanes idle per op) plus the pack/unpack
glue between the trace kernel's packed output and the (N,3) world. Round 2
measured the XLA-side fix — component-form (N,) math — a 3.5x win in
isolation but a 5x LOSS end to end (3x HLO op count chokes XLA's fusion).

The TPU-native answer is to hand-write the stage as ONE Pallas kernel over
the SAME packed (rows, K*128) layout the trace kernel already uses:

  trace (fused 2N) -> shade kernel -> trace (fused 2N) -> shade -> ...

with zero (N,3) XLA math inside the bounce loop. The kernel reproduces
``models/shading.sample_bsdf`` + the bounce-carry update of
``models/pathtracer.body`` exactly (same RNG draw order, same branch-stream
selection, same estimator quirks: firefly clamp, x lightsCount, 0.01 ambient
miss, stale-payload carry semantics — raytrace.rchit:118-218, rgen:62-116).

NEE is *deferred*: bounce d's kernel computes the clamped contribution and
emits the shadow rays, and the contribution is applied by the NEXT kernel
call (or the epilogue) once the fused trace has produced the shadow
verdicts — the same software pipelining the XLA path used, now with the
resolve math inside the kernel.

Scope (gated by ``kernel_shading_available``): scenes with <= MAX_MATS
materials and <= MAX_LIGHTS lights on a PallasTracer, untextured or with
baseColor-only texturing. Texture fetches and attribute gathers are HBM
gathers, which Mosaic cannot do per-lane — so they stay in XLA as thin
feeder stages (round 5): non-resolving tracers get their resolve-layout
block built by ``xla_resolve_blocks`` (plain trace + corner gathers +
delta interpolation), and baseColor textures ride in as an externally
fetched albedo block (``xla_albedo_block``). Scenes with mr / emissive /
normal-map textures keep the full XLA shading stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkrt_tpu.ops.pallas.trace import (
    LANES,
    OUT_COLS_PLAIN,
    OUT_COLS_RESOLVE,
    PROG_ROWS,
)

# material/light tables are selected with static one-hot loops over the
# table rows (no per-lane gathers in Mosaic); bound the unroll
MAX_MATS = 32
MAX_LIGHTS = 8

M_PI = 3.14159265358979323846
M_TWO_PI = 2.0 * M_PI
M_INV_PI = 1.0 / M_PI

# carry block layout, in LANES-wide column slots
C_SEED = 0        # LCG state (uint32 bits)
C_CW = 1          # 1-3 cur_weight rgb
C_HV = 4          # 4-6 hit_value rgb
C_ACTIVE = 7      # 0/1
C_SPEC = 8        # 0/1 prd.isSpecular
C_LDIST = 9       # prd.lightDist
C_HD = 10         # hit-distance bookkeeping
C_PEND = 11       # 11-13 pending NEE contribution (awaiting shadow verdict)
C_PSH = 14        # 0/1 pending do_shadow mask
CARRY_COLS = 15

RAY_COLS = 7      # [o.xyz | d.xyz | t_lim] — ops.pallas.trace._pack_rays


def kernel_shading_available(scene, tracer) -> bool:
    """Static gate: can the packed shade kernel run this scene?

    Round 5 widened the gate two ways (stagebench2/3: the composed XLA
    shading stage costs ~75-106 ms/bounce at 1280x720 — the kernel is the
    single biggest frame lever, so coverage matters):

    * **Textured scenes whose only texture use is baseColor** run with an
      externally fetched albedo block (one XLA bilinear fetch feeding an
      extra kernel input) — mr/emissive/normal fetches are identity there.
    * **Non-resolving tracers** (attr tables over the VMEM budget —
      city-scale scenes) run gather-fed: a plain trace plus an XLA
      attribute-gather/interpolation stage builds the resolve-layout block
      the kernel already consumes (xla_resolve_blocks).
    """
    from vkrt_tpu.scene import scene_base_only_textured, scene_is_textured

    tex_ok = (not scene_is_textured(scene)
              or scene_base_only_textured(scene))
    return (
        hasattr(tracer, "closest_packed_plain")  # PallasTracer API
        and not hasattr(tracer, "with_seed")  # alpha wrapper falls back
        and tex_ok
        and scene.mat_base_color.shape[0] <= MAX_MATS
        and scene.num_lights <= MAX_LIGHTS
    )


def scene_tables(scene):
    """(M,8) material + (L,8) light tables for the kernel's one-hot loops."""
    mat = jnp.concatenate(
        [
            scene.mat_base_color[:, :3],
            scene.mat_metallic[:, None],
            scene.mat_roughness[:, None],
            scene.mat_emissive,
        ],
        axis=1,
    ).astype(jnp.float32)
    light = jnp.concatenate(
        [
            scene.light_pos,
            scene.light_color,
            scene.light_intensity[:, None],
            scene.light_type[:, None].astype(jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)
    return mat, light


# --- component-tile vector helpers (all (8,128) f32) ------------------------


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _normalize3(x, y, z, eps=1e-20):
    inv = pl.reciprocal(
        jnp.maximum(jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 0.0)), eps),
        approx=False,
    )
    return x * inv, y * inv, z * inv


def _lcg(state):
    return jnp.uint32(1664525) * state + jnp.uint32(1013904223)


def _rnd(state):
    state = _lcg(state)
    # Mosaic has no uint32->f32 cast; the 24-bit masked value is sign-safe
    # under an int32 bitcast, and int32->f32 lowers fine
    u = pltpu.bitcast(state & jnp.uint32(0x00FFFFFF), jnp.int32).astype(
        jnp.float32
    ) * jnp.float32(1.0 / 16777216.0)
    return state, u


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def _k_direct(rough):
    return (rough + 1.0) * (rough + 1.0) * 0.125


def _g_schlick(nv, k):
    return nv / (nv * (1.0 - k) + k)


def _g_smith(nl_abs, nv_abs, k):
    return _g_schlick(nv_abs, k) * _g_schlick(nl_abs, k)


def _shade_kernel(
    *refs,
    d: int,
    first: bool,
    resolve_hd: bool,
    n_mats: int,
    n_lights: int,
    hitdist_weight: float,
    hitdist_accumulate: bool,
    t_min: float,
    t_max: float,
    corr: bool = False,
    albedo: bool = False,
):
    refs = list(refs)
    mat_tab, light_tab, params, carry_ref, ray_ref, out_ref = refs[:6]
    k = 6
    outsh_ref = None
    if not first:
        outsh_ref = refs[k]
        k += 1
    alb_ref = None
    if albedo:
        # (R, 3*128) externally fetched baseColor texture values (round-5
        # gather-fed mode): multiplied into the factor-table base color
        alb_ref = refs[k]
        k += 1
    carry_o, next_o, shadow_o = refs[k:]

    def col(ref, k):
        return ref[:, k * LANES : (k + 1) * LANES]

    def icol(ref, k):
        return pltpu.bitcast(col(ref, k), jnp.int32)

    # correlated per-block sampler (ops.rng.block_uniform_table): this
    # block's six shared uniforms live in params row 1 + program_id; a
    # substituted draw is the scalar broadcast over the whole block
    if corr:
        pid = pl.program_id(0)
        _cu = [params[1 + pid, k] for k in range(6)]

        def _corr_sub(k, tile_like):
            return jnp.zeros_like(tile_like) + _cu[k]
    else:
        def _corr_sub(k, tile_like):  # pragma: no cover - corr off
            raise AssertionError

    # --- unpack carry -------------------------------------------------------
    seed0 = pltpu.bitcast(col(carry_ref, C_SEED), jnp.uint32)
    cwr, cwg, cwb = (col(carry_ref, C_CW + i) for i in range(3))
    hvr, hvg, hvb = (col(carry_ref, C_HV + i) for i in range(3))
    active = col(carry_ref, C_ACTIVE) > 0.0
    is_spec = col(carry_ref, C_SPEC) > 0.0
    light_dist = col(carry_ref, C_LDIST)
    hd = col(carry_ref, C_HD)
    pr, pg, pb = (col(carry_ref, C_PEND + i) for i in range(3))
    pend_sh = col(carry_ref, C_PSH) > 0.0

    # --- resolve the PREVIOUS bounce's pending NEE (deferred shadow) --------
    if not first:
        sh_hit = icol(outsh_ref, 1) >= 0
        blocked = sh_hit & pend_sh
        keep = ~blocked
        hvr = hvr + jnp.where(keep, pr, 0.0)
        hvg = hvg + jnp.where(keep, pg, 0.0)
        hvb = hvb + jnp.where(keep, pb, 0.0)
        if resolve_hd:
            # prev bounce was depth 1: hit-distance bookkeeping (rgen:103-114)
            # at_d1 == the prev bounce's do_shadow mask == pend_sh
            hd_new = jnp.where(blocked, 0.5 * light_dist, light_dist)
            hd_new = hd_new * hitdist_weight
            if hitdist_accumulate:
                hd = jnp.where(pend_sh, hd + hd_new, hd)
            else:
                hd = jnp.where(pend_sh, hd_new, hd)

    # --- unpack this bounce's ray + hit -------------------------------------
    dx = col(ray_ref, 3)
    dy = col(ray_ref, 4)
    dz = col(ray_ref, 5)
    idx = icol(out_ref, 1)
    hit = idx >= 0
    miss = (~hit & active) | ~active
    # hit position = o + t*d (the trace kernel stopped carrying it: 3 FMAs
    # here replace 3 interpolated ext values per candidate per visit there);
    # garbage on miss/dead lanes, every consumer below is miss-masked
    t_hit = col(out_ref, 0)
    px = col(ray_ref, 0) + t_hit * dx
    py = col(ray_ref, 1) + t_hit * dy
    pz = col(ray_ref, 2) + t_hit * dz
    nrx, nry, nrz = col(out_ref, 4), col(out_ref, 5), col(out_ref, 6)
    tgx, tgy, tgz = col(out_ref, 7), col(out_ref, 8), col(out_ref, 9)
    tw = col(out_ref, 10)
    mat_f = col(out_ref, 13)

    # --- surface frame (surface_from_attrs, untextured branch) --------------
    nx, ny, nz = _normalize3(nrx, nry, nrz)
    tx, ty, tz = _normalize3(tgx, tgy, tgz)
    tn = _dot3(tx, ty, tz, nx, ny, nz)
    tx, ty, tz = _normalize3(tx - tn * nx, ty - tn * ny, tz - tn * nz)
    bx, by, bz = _cross3(nx, ny, nz, tx, ty, tz)
    bx, by, bz = tw * bx, tw * by, tw * bz

    # --- material one-hot (static loop; no per-lane gathers in Mosaic) ------
    baser = jnp.zeros_like(px)
    baseg = jnp.zeros_like(px)
    baseb = jnp.zeros_like(px)
    metal = jnp.zeros_like(px)
    rough = jnp.zeros_like(px)
    emr = jnp.zeros_like(px)
    emg = jnp.zeros_like(px)
    emb = jnp.zeros_like(px)
    for m in range(n_mats):
        sel = mat_f == float(m)
        baser = jnp.where(sel, mat_tab[m, 0], baser)
        baseg = jnp.where(sel, mat_tab[m, 1], baseg)
        baseb = jnp.where(sel, mat_tab[m, 2], baseb)
        metal = jnp.where(sel, mat_tab[m, 3], metal)
        rough = jnp.where(sel, mat_tab[m, 4], rough)
        emr = jnp.where(sel, mat_tab[m, 5], emr)
        emg = jnp.where(sel, mat_tab[m, 6], emg)
        emb = jnp.where(sel, mat_tab[m, 7], emb)
    if albedo:
        # base_color = base_factor * fetch(base_tex) (shading.py
        # _material_surface); the fetch ran in XLA where gathers live
        baser = baser * col(alb_ref, 0)
        baseg = baseg * col(alb_ref, 1)
        baseb = baseb * col(alb_ref, 2)

    # --- sample_bsdf (models/shading.py, rchit:118-218) ---------------------
    vx, vy, vz = _normalize3(-dx, -dy, -dz)
    emit_gate = jnp.full(is_spec.shape, True) if d == 0 else is_spec
    gate = emit_gate
    e_r = jnp.where(gate, emr, 0.0)
    e_g = jnp.where(gate, emg, 0.0)
    e_b = jnp.where(gate, emb, 0.0)

    ratio = 0.5 * (1.0 - metal)
    rough_c = jnp.clip(rough, 0.01, 0.99)
    metal_c = jnp.clip(metal, 0.01, 0.99)

    seed, r1 = _rnd(seed0)
    if corr:
        r1 = _corr_sub(0, r1)
    is_diffuse = r1 < ratio

    # ---- diffuse branch (light pick + NEE + cosine hemisphere) ----
    seed_d, r_light = _rnd(seed)
    if corr:
        r_light = _corr_sub(1, r_light)
    lidx = jnp.clip(
        (r_light * float(n_lights)).astype(jnp.int32), 0, n_lights - 1
    )
    lpx = jnp.zeros_like(px)
    lpy = jnp.zeros_like(px)
    lpz = jnp.zeros_like(px)
    lcr = jnp.zeros_like(px)
    lcg_ = jnp.zeros_like(px)
    lcb = jnp.zeros_like(px)
    lint = jnp.zeros_like(px)
    ltype = jnp.zeros_like(px)
    for li_ in range(n_lights):
        sel = lidx == li_
        lpx = jnp.where(sel, light_tab[li_, 0], lpx)
        lpy = jnp.where(sel, light_tab[li_, 1], lpy)
        lpz = jnp.where(sel, light_tab[li_, 2], lpz)
        lcr = jnp.where(sel, light_tab[li_, 3], lcr)
        lcg_ = jnp.where(sel, light_tab[li_, 4], lcg_)
        lcb = jnp.where(sel, light_tab[li_, 5], lcb)
        lint = jnp.where(sel, light_tab[li_, 6], lint)
        ltype = jnp.where(sel, light_tab[li_, 7], ltype)

    ldx, ldy, ldz = lpx - px, lpy - py, lpz - pz
    ldist = jnp.sqrt(jnp.maximum(_dot3(ldx, ldy, ldz, ldx, ldy, ldz), 0.0))
    linv = pl.reciprocal(jnp.maximum(ldist, 1e-20), approx=False)
    lx, ly, lz = ldx * linv, ldy * linv, ldz * linv

    # direct_light (gltf.glsl:136-154) with RAW metallic/roughness
    hx, hy, hz = _normalize3(lx + vx, ly + vy, lz + vz)
    li_scale = lint * pl.reciprocal(
        jnp.maximum(ldist * ldist, 1e-20), approx=False
    )
    lir, lig, lib = lcr * li_scale, lcg_ * li_scale, lcb * li_scale
    cos_nee = jnp.maximum(_dot3(lx, ly, lz, nx, ny, nz), 0.0)

    # compute_pbr_brdf (gltf.glsl:111-134)
    f0r = baser * metal + 0.04 * (1.0 - metal)
    f0g = baseg * metal + 0.04 * (1.0 - metal)
    f0b = baseb * metal + 0.04 * (1.0 - metal)
    hv_abs = jnp.abs(_dot3(hx, hy, hz, vx, vy, vz))
    fres = _pow5(jnp.maximum(1.0 - hv_abs, 0.0))
    fr = f0r + (1.0 - f0r) * fres
    fg = f0g + (1.0 - f0g) * fres
    fb = f0b + (1.0 - f0b) * fres
    alpha_raw = rough * rough
    a2 = alpha_raw * alpha_raw
    nh = _dot3(nx, ny, nz, hx, hy, hz)
    dterm = nh * nh * (a2 - 1.0) + 1.0
    ndf = a2 * M_INV_PI * pl.reciprocal(dterm * dterm + 1e-4, approx=False)
    ndf = jnp.where(nh <= 0.0, 0.0, ndf)
    k_raw = _k_direct(rough)
    nv_abs = jnp.abs(_dot3(nx, ny, nz, vx, vy, vz))
    nl_abs = jnp.abs(_dot3(nx, ny, nz, lx, ly, lz))
    g = _g_smith(nl_abs, nv_abs, k_raw)
    down = 4.0 * nv_abs * nl_abs + 1e-4
    spec_s = ndf * g * pl.reciprocal(down, approx=False)
    kdr = (1.0 - fr) * (1.0 - metal)
    kdg = (1.0 - fg) * (1.0 - metal)
    kdb = (1.0 - fb) * (1.0 - metal)
    brdfr = kdr * baser * M_INV_PI + spec_s * fr
    brdfg = kdg * baseg * M_INV_PI + spec_s * fg
    brdfb = kdb * baseb * M_INV_PI + spec_s * fb
    nee_gate = (ltype == 0.0) & (cos_nee > 0.0)
    brdfr = jnp.where(nee_gate, brdfr, 0.0)
    brdfg = jnp.where(nee_gate, brdfg, 0.0)
    brdfb = jnp.where(nee_gate, brdfb, 0.0)
    # "if dot(L, texNormal) <= 0: += 0" (rchit:166-174) + lightsCount scale
    pos_gate = _dot3(lx, ly, lz, nx, ny, nz) > 0.0
    neer = jnp.where(pos_gate, float(n_lights) * brdfr * lir * cos_nee, 0.0)
    neeg = jnp.where(pos_gate, float(n_lights) * brdfg * lig * cos_nee, 0.0)
    neeb = jnp.where(pos_gate, float(n_lights) * brdfb * lib * cos_nee, 0.0)

    # cosine hemisphere bounce (random.glsl:35-45) in the (T,B,N) frame
    seed_d, hr1 = _rnd(seed_d)
    seed_d, hr2 = _rnd(seed_d)
    if corr:
        hr1 = _corr_sub(2, hr1)
        hr2 = _corr_sub(3, hr2)
    sq = jnp.sqrt(hr1)
    phi = M_TWO_PI * hr2
    cxl = jnp.cos(phi) * sq
    cyl = jnp.sin(phi) * sq
    czl = jnp.sqrt(jnp.maximum(1.0 - hr1, 0.0))
    ddx = cxl * tx + cyl * bx + czl * nx
    ddy = cxl * ty + cyl * by + czl * ny
    ddz = cxl * tz + cyl * bz + czl * nz
    ddx, ddy, ddz = _normalize3(ddx, ddy, ddz)
    dn = _dot3(ddx, ddy, ddz, nx, ny, nz)
    pdf_d = ratio * dn * M_INV_PI
    wscale = dn * pl.reciprocal(jnp.maximum(pdf_d, 1e-12), approx=False)
    wdr = (1.0 - metal_c) * baser * M_INV_PI * wscale
    wdg = (1.0 - metal_c) * baseg * M_INV_PI * wscale
    wdb = (1.0 - metal_c) * baseb * M_INV_PI * wscale

    # ---- specular branch: GGX importance sample (random.glsl:56-70) ----
    alpha_c = rough_c * rough_c
    a2c = alpha_c * alpha_c
    seed_s, g1 = _rnd(seed)
    seed_s, g2 = _rnd(seed_s)
    if corr:
        g1 = _corr_sub(4, g1)
        g2 = _corr_sub(5, g2)
    cos_t = jnp.sqrt(jnp.maximum((1.0 - g2) / ((a2c - 1.0) * g2 + 1.0), 0.0))
    sin_t = jnp.clip(jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0)), 0.0, 1.0)
    gphi = g1 * M_TWO_PI
    hlx = sin_t * jnp.cos(gphi)
    hly = sin_t * jnp.sin(gphi)
    shx = hlx * tx + hly * bx + cos_t * nx
    shy = hlx * ty + hly * by + cos_t * ny
    shz = hlx * tz + hly * bz + cos_t * nz
    shx, shy, shz = _normalize3(shx, shy, shz)
    # reflect(-v, h) = -v - 2*dot(h, -v)*h = -v + 2*dot(h, v)*h
    hv_dot = _dot3(vx, vy, vz, shx, shy, shz)
    dsx = -vx + 2.0 * hv_dot * shx
    dsy = -vy + 2.0 * hv_dot * shy
    dsz = -vz + 2.0 * hv_dot * shz
    dsx, dsy, dsz = _normalize3(dsx, dsy, dsz)
    f0cr = 0.04 * (1.0 - metal_c) + baser * metal_c
    f0cg = 0.04 * (1.0 - metal_c) + baseg * metal_c
    f0cb = 0.04 * (1.0 - metal_c) + baseb * metal_c
    # specular_brdf_over_pdf_cook_torrance (gltf.glsl:98-109)
    k_c = _k_direct(rough_c)
    nh_s = _dot3(nx, ny, nz, shx, shy, shz)
    lh_s = _dot3(dsx, dsy, dsz, shx, shy, shz)
    pdf_s = (1.0 - ratio) * nh_s * pl.reciprocal(4.0 * lh_s + 1e-4, approx=False)
    nl_s = jnp.abs(_dot3(nx, ny, nz, dsx, dsy, dsz))
    g_s = _g_smith(nl_s, nv_abs, k_c)
    hv_s = jnp.abs(_dot3(shx, shy, shz, vx, vy, vz))
    fres_s = _pow5(jnp.maximum(1.0 - hv_s, 0.0))
    fsr = f0cr + (1.0 - f0cr) * fres_s
    fsg = f0cg + (1.0 - f0cg) * fres_s
    fsb = f0cb + (1.0 - f0cb) * fres_s
    down_s = 4.0 * nv_abs * nl_s + 1e-4
    cos_s = _dot3(dsx, dsy, dsz, nx, ny, nz)
    sscale = g_s * pl.reciprocal(down_s * pdf_s, approx=False) * cos_s
    wsr = fsr * sscale
    wsg = fsg * sscale
    wsb = fsb * sscale

    # ---- lobe select (per-branch RNG streams, shading.py) ----
    sel = is_diffuse
    ndx = jnp.where(sel, ddx, dsx)
    ndy = jnp.where(sel, ddy, dsy)
    ndz = jnp.where(sel, ddz, dsz)
    bwr = jnp.where(sel, wdr, wsr)
    bwg = jnp.where(sel, wdg, wsg)
    bwb = jnp.where(sel, wdb, wsb)
    epr = e_r + jnp.where(sel, neer, 0.0)
    epg = e_g + jnp.where(sel, neeg, 0.0)
    epb = e_b + jnp.where(sel, neeb, 0.0)
    bs_spec = ~is_diffuse
    bs_seed = jnp.where(sel, seed_d, seed_s)

    # --- rmiss + bounce-carry update (pathtracer.body) -----------------------
    if d == 0:
        mvr = params[0, 0] * 0.8  # clearColor*0.8 on primary (rmiss:15)
        mvg = params[0, 1] * 0.8
        mvb = params[0, 2] * 0.8
    else:
        mvr = mvg = mvb = 0.01
    hv_this_r = jnp.where(miss, mvr, epr)
    hv_this_g = jnp.where(miss, mvg, epg)
    hv_this_b = jnp.where(miss, mvb, epb)
    # bool-vs-bool select lowers to an i8->i1 trunc Mosaic rejects; mask math
    spec_this = (miss & is_spec) | (~miss & bs_spec)
    ldist_this = jnp.where(miss, light_dist, ldist)

    do_shadow = active & ~miss & ~spec_this
    active_next = active & ~miss

    # pending NEE contribution for THIS bounce (firefly clamp, rgen:101)
    np_r = jnp.where(active, jnp.minimum(hv_this_r * cwr, 10.0), 0.0)
    np_g = jnp.where(active, jnp.minimum(hv_this_g * cwg, 10.0), 0.0)
    np_b = jnp.where(active, jnp.minimum(hv_this_b * cwb, 10.0), 0.0)

    # path-throughput clamp (RenderSettings.clamp_weights) with TRACED
    # bounds from params[0,3:5]: [0,50] on, [-inf,+inf] off (bit-exact
    # identity — max(x,-inf)=x, min(x,+inf)=x, NaN propagates), so toggling
    # the setting reuses the compiled step like a push constant
    cl_lo = params[0, 3]
    cl_hi = params[0, 4]
    bwr = jnp.minimum(jnp.maximum(bwr, cl_lo), cl_hi)
    bwg = jnp.minimum(jnp.maximum(bwg, cl_lo), cl_hi)
    bwb = jnp.minimum(jnp.maximum(bwb, cl_lo), cl_hi)
    cwr = cwr * jnp.where(miss, 1.0, bwr)
    cwg = cwg * jnp.where(miss, 1.0, bwg)
    cwb = cwb * jnp.where(miss, 1.0, bwb)

    seed_out = jnp.where(miss, seed0, bs_seed)

    # --- emit next + shadow ray blocks ---------------------------------------
    one = jnp.ones_like(px)
    nxo_x = jnp.where(active_next, px, 1e30)
    nxo_y = jnp.where(active_next, py, 1e30)
    nxo_z = jnp.where(active_next, pz, 1e30)
    nxd_x = jnp.where(active_next, ndx, 0.0)
    nxd_y = jnp.where(active_next, ndy, 0.0)
    nxd_z = jnp.where(active_next, ndz, 0.0)
    nx_lim = jnp.where(active_next, t_max, -1.0)
    next_o[:] = jnp.concatenate(
        [nxo_x, nxo_y, nxo_z, nxd_x, nxd_y, nxd_z, nx_lim], axis=1
    )
    shd_x = jnp.where(do_shadow, lx, 0.0)
    shd_y = jnp.where(do_shadow, ly, 0.0)
    shd_z = jnp.where(do_shadow, lz, 0.0)
    # NEGATIVE limit = the trace kernel's first-hit-kills mode (a shadow
    # verdict only reads idx >= 0; the lane stops traversing at its first
    # occluder instead of hunting for the closest)
    sh_lim = jnp.where(do_shadow, -jnp.maximum(ldist_this - 0.1, t_min), 0.0)
    shadow_o[:] = jnp.concatenate(
        [px, py, pz, shd_x, shd_y, shd_z, sh_lim], axis=1
    )

    # --- write carry ----------------------------------------------------------
    carry_o[:] = jnp.concatenate(
        [
            pltpu.bitcast(seed_out, jnp.float32),
            cwr, cwg, cwb,
            hvr, hvg, hvb,
            jnp.where(active_next, one, 0.0),
            jnp.where(spec_this, one, 0.0),
            ldist_this,
            hd,
            np_r, np_g, np_b,
            jnp.where(do_shadow, one, 0.0),
        ],
        axis=1,
    )


def shade_call(
    mat_tab, light_tab, params, carry, ray_main, trace_out, *,
    d: int, first: bool, resolve_hd: bool, n_mats: int, n_lights: int,
    hitdist_weight: float, hitdist_accumulate: bool,
    t_min: float, t_max: float, interpret: bool,
    trace_out_shadow=None, corr: bool = False, albedo=None,
):
    """One shade step over packed blocks.

    ``params``: (1, 8) f32 dynamic scalars [clear rgb | clamp lo | clamp hi
    | unused] (clamp bounds per models.shading.clamp_bounds — traced, so
    the clamp toggle never recompiles); with
    ``corr`` it is (1 + R//PROG_ROWS, 8) — row 1+i holds block i's shared
    sampling uniforms (ops.rng.block_uniform_table).
    ``carry``: (R, CARRY_COLS*128). ``ray_main``: the (R, 7*128) ray block
    traced for bounce d. ``trace_out``: its resolve trace output
    (R, OUT_COLS_RESOLVE*128). ``trace_out_shadow`` (required unless
    ``first``): the PREVIOUS bounce's shadow verdicts from the plain trace,
    (R, OUT_COLS_PLAIN*128). Returns (carry', next_rays, shadow_rays),
    each (R, cols*128).
    """
    rows = carry.shape[0]
    grid = (rows // PROG_ROWS,)
    blk = lambda cols: pl.BlockSpec(  # noqa: E731
        (PROG_ROWS, cols * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_cols = OUT_COLS_RESOLVE
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # mat table
        pl.BlockSpec(memory_space=pltpu.VMEM),  # light table
        pl.BlockSpec(memory_space=pltpu.VMEM),  # params
        blk(CARRY_COLS),
        blk(RAY_COLS),
        blk(out_cols),
    ]
    operands = [mat_tab, light_tab, params, carry, ray_main, trace_out]
    if not first:
        assert trace_out_shadow is not None
        in_specs.append(blk(OUT_COLS_PLAIN))
        operands.append(trace_out_shadow)
    if albedo is not None:
        in_specs.append(blk(3))
        operands.append(albedo)

    kernel = functools.partial(
        _shade_kernel,
        d=d, first=first, resolve_hd=resolve_hd, n_mats=n_mats,
        n_lights=n_lights,
        hitdist_weight=hitdist_weight, hitdist_accumulate=hitdist_accumulate,
        t_min=t_min, t_max=t_max, corr=corr, albedo=albedo is not None,
    )
    carry2, next_rays, shadow_rays = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[blk(CARRY_COLS), blk(RAY_COLS), blk(RAY_COLS)],
        out_shape=[
            jax.ShapeDtypeStruct((rows, CARRY_COLS * LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, RAY_COLS * LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, RAY_COLS * LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return (
        jax.lax.optimization_barrier(carry2),
        jax.lax.optimization_barrier(next_rays),
        jax.lax.optimization_barrier(shadow_rays),
    )


# --- packed-layout helpers ---------------------------------------------------


def pack_lanes(arrs, n: int, prog_rows: int = PROG_ROWS):
    """Pack (N,) f32 columns into one (R, K*128) lane-dense block, zero-
    padding N up to whole prog_rows*128 blocks. Callers that feed a tracer
    must pass max(PROG_ROWS, tracer.spec.prog_rows) so both the shade grid
    (PROG_ROWS programs) and the trace grid (spec.prog_rows programs)
    divide the pool (ADVICE r4 high: an 8-row pool under a block_rows=16
    tracer launched a zero-program grid)."""
    block = prog_rows * LANES
    total = -(-n // block) * block
    cols = []
    for a in arrs:
        if total != n:
            a = jnp.concatenate([a, jnp.zeros((total - n,), a.dtype)])
        cols.append(a.reshape(-1, LANES))
    return jnp.concatenate(cols, axis=1)


def unpack_lane(blockarr, k: int, n: int):
    """Column slot k of a packed block -> (N,) f32."""
    return blockarr[:, k * LANES : (k + 1) * LANES].reshape(-1)[:n]


def xla_resolve_blocks(scene, tracer, out_plain):
    """Plain trace output -> resolve-layout block, attributes gathered in XLA.

    Round-5 gather-fed mode: scenes whose attribute tables exceed the
    kernel VMEM budget (city-scale) cannot resolve in-kernel, but the
    packed shade kernel consumes a fixed (R, OUT_COLS_RESOLVE*128) layout —
    so gather the winning triangle's corner attributes from HBM (where XLA
    does gathers) and interpolate with the SAME delta form the kernel uses
    (raytrace.rchit:41-79 parity: value = a0 + u*(a1-a0) + v*(a2-a0)).
    ~112 gathered bytes/ray; the (N,3) BSDF math that made the XLA shading
    stage cost ~75-106 ms/bounce stays in the kernel (stagebench2/3 r5).

    Pad/miss lanes (idx < 0) get zero attributes, matching the kernel's
    resolve output contract.
    """
    rows = out_plain.shape[0]
    nf = rows * LANES

    def col(k):
        return out_plain[:, k * LANES : (k + 1) * LANES].reshape(-1)

    t = col(0)
    idx = jax.lax.bitcast_convert_type(
        out_plain[:, LANES : 2 * LANES], jnp.int32
    ).reshape(-1)
    hit = idx >= 0
    u = col(2)
    v = col(3)
    tri = jnp.take(tracer.cs.tri_remap, jnp.maximum(idx, 0))
    safe = jnp.where(hit, jnp.maximum(tri, 0), 0)

    def interp(corner):  # (T,3,k) -> (Nf,k) barycentric delta form
        c = jnp.take(corner, safe, axis=0)
        return (c[:, 0] + u[:, None] * (c[:, 1] - c[:, 0])
                + v[:, None] * (c[:, 2] - c[:, 0]))

    m = hit[:, None]
    nrm = jnp.where(m, interp(scene.corner_normal), 0.0)
    tan4 = jnp.take(scene.corner_tangent, safe, axis=0)
    tan = jnp.where(
        m,
        tan4[:, 0, :3] + u[:, None] * (tan4[:, 1, :3] - tan4[:, 0, :3])
        + v[:, None] * (tan4[:, 2, :3] - tan4[:, 0, :3]),
        0.0,
    )
    tw = jnp.where(hit, tan4[:, 0, 3], 0.0)
    uv = jnp.where(m, interp(scene.corner_uv), 0.0)
    mat = jnp.where(hit, jnp.take(scene.tri_mat, safe).astype(jnp.float32),
                    0.0)

    def lane(a):
        return a.reshape(rows, LANES)

    return jnp.concatenate(
        [out_plain[:, : 4 * LANES],
         lane(nrm[:, 0]), lane(nrm[:, 1]), lane(nrm[:, 2]),
         lane(tan[:, 0]), lane(tan[:, 1]), lane(tan[:, 2]),
         lane(tw),
         lane(uv[:, 0]), lane(uv[:, 1]),
         lane(mat)],
        axis=1,
    )


def xla_albedo_block(scene, trace_out):
    """BaseColor texture fetch for a resolve-layout block -> (R, 3*128).

    The path-mode fetch semantics (bilinear level-0 REPEAT, shading.py
    _material_surface with lod=None); uv comes from the block's resolved
    uv slots (11, 12), the texture index from the material slot (13).
    Only meaningful under scene_base_only_textured gating.
    """
    from vkrt_tpu.ops.texture import sample_texture

    rows = trace_out.shape[0]

    def col(k):
        return trace_out[:, k * LANES : (k + 1) * LANES].reshape(-1)

    uv = jnp.stack([col(11), col(12)], axis=1)
    mat = col(13).astype(jnp.int32)
    base_tex = jnp.take(scene.mat_base_tex, jnp.maximum(mat, 0))
    rgba = sample_texture(scene.tex_rgba, scene.tex_size, base_tex, uv)
    return jnp.concatenate(
        [rgba[:, k].reshape(rows, LANES) for k in range(3)], axis=1
    )


def bounce_chain_packed(
    scene, tracer, carry, *,
    depth: int, start_depth: int, clear_color,
    hitdist_weight: float, hitdist_accumulate: bool, clamp_weights,
    t_min: float, t_max: float, corr_seed=None,
):
    """The bounce loop with ZERO (N,3) XLA math inside: trace and shade both
    operate on packed (rows, K*128) blocks; conversions happen once at entry
    and exit. Drop-in replacement for models.pathtracer.bounce_chain when
    ``kernel_shading_available`` — returns the same BounceCarry contract
    (seed / hit_value / hit_dists / rays counters; the geometric fields keep
    their entry values, which no caller reads after the loop).
    """
    from vkrt_tpu.models.shading import clamp_bounds

    n = carry.origin.shape[0]
    mat_tab, light_tab = scene_tables(scene)
    clear3 = jnp.asarray(clear_color, jnp.float32)[:3]
    params = (
        jnp.zeros((1, 8), jnp.float32)
        .at[0, :3].set(clear3)
        .at[0, 3:5].set(clamp_bounds(clamp_weights))
    )
    n_mats = int(scene.mat_base_color.shape[0])
    n_lights = int(scene.num_lights)
    f32 = lambda b: b.astype(jnp.float32)  # noqa: E731

    active0 = carry.active
    rays_main = carry.rays_main + jnp.sum(f32(active0))
    rays_shadow = carry.rays_shadow

    # pool padding granularity: both the shade kernel's PROG_ROWS-row grid
    # and the tracer's spec.prog_rows-row grid must divide the pool (one is
    # a multiple of the other — both are 8 or 16)
    pr = max(PROG_ROWS, tracer.spec.prog_rows)

    # entry packing (once per chain, not per bounce)
    ray_cur = pack_lanes(
        [
            jnp.where(active0, carry.origin[:, 0], 1e30),
            jnp.where(active0, carry.origin[:, 1], 1e30),
            jnp.where(active0, carry.origin[:, 2], 1e30),
            jnp.where(active0, carry.direction[:, 0], 0.0),
            jnp.where(active0, carry.direction[:, 1], 0.0),
            jnp.where(active0, carry.direction[:, 2], 0.0),
            jnp.where(active0, jnp.full((n,), t_max, jnp.float32), -1.0),
        ],
        n,
        pr,
    )
    zeros = jnp.zeros((n,), jnp.float32)
    carry_blk = pack_lanes(
        [
            jax.lax.bitcast_convert_type(carry.seed, jnp.float32),
            carry.cur_weight[:, 0], carry.cur_weight[:, 1],
            carry.cur_weight[:, 2],
            carry.hit_value[:, 0], carry.hit_value[:, 1],
            carry.hit_value[:, 2],
            f32(active0), f32(carry.is_specular), carry.light_dist,
            carry.hit_dists, zeros, zeros, zeros, zeros,
        ],
        n,
        pr,
    )

    # Split launches per bounce: the bounce rays go through the RESOLVE
    # trace (attributes needed for shading) while the shadow rays go through
    # the PLAIN trace — resolve's per-visit attribute-tile machinery measured
    # ~2x the whole plain traversal on incoherent pools, and a shadow verdict
    # only reads idx >= 0 (raytrace.rgen:85-96: terminate-on-first-hit).
    first = True
    out_sh = None
    corr = corr_seed is not None
    n_blocks = carry_blk.shape[0] // PROG_ROWS
    # Round-5 coverage modes (kernel_shading_available): tracers without
    # resident attr tables (city-scale scenes) trace PLAIN and the resolve
    # block is built by XLA gathers; baseColor-only textured scenes feed
    # the kernel an externally fetched albedo block.
    resolve_in_kernel = bool(getattr(tracer, "resolves_attrs", False))
    from vkrt_tpu.scene import scene_base_only_textured

    fetch_albedo = scene_base_only_textured(scene)
    for d in range(start_depth, depth):
        params_d = params
        if corr:
            from vkrt_tpu.ops.rng import block_table_rep

            params_d = jnp.concatenate(
                [params, block_table_rep(n_blocks, corr_seed, d)], axis=0
            )
        if resolve_in_kernel:
            out = tracer.closest_packed(ray_cur, t_min)
        else:
            out = xla_resolve_blocks(
                scene, tracer, tracer.closest_packed_plain(ray_cur, t_min)
            )
        alb = xla_albedo_block(scene, out) if fetch_albedo else None
        carry_blk, next_rays, shadow_rays = shade_call(
            mat_tab, light_tab, params_d, carry_blk, ray_cur, out,
            d=d, first=first, resolve_hd=(not first and d - 1 == 1),
            n_mats=n_mats, n_lights=n_lights,
            hitdist_weight=hitdist_weight,
            hitdist_accumulate=hitdist_accumulate,
            t_min=t_min, t_max=t_max,
            interpret=tracer.interpret,
            trace_out_shadow=out_sh, corr=corr, albedo=alb,
        )
        rays_shadow = rays_shadow + jnp.sum(
            carry_blk[:, C_PSH * LANES : (C_PSH + 1) * LANES]
        )
        if d < depth - 1:
            rays_main = rays_main + jnp.sum(
                carry_blk[:, C_ACTIVE * LANES : (C_ACTIVE + 1) * LANES]
            )
            ray_cur = next_rays
            out_sh = tracer.closest_packed_plain(
                shadow_rays, t_min, pure_any=True
            )
        else:
            ray_cur = shadow_rays  # final shadow-only trace
        first = False

    # final shadow verdicts + epilogue (lane-dense XLA on column slots)
    out_last = tracer.closest_packed_plain(ray_cur, t_min, pure_any=True)
    sh_hit = (
        jax.lax.bitcast_convert_type(
            out_last[:, LANES : 2 * LANES], jnp.int32
        )
        >= 0
    )
    pend_sh = carry_blk[:, C_PSH * LANES : (C_PSH + 1) * LANES] > 0.0
    blocked = sh_hit & pend_sh
    keep = (~blocked).astype(jnp.float32)
    hv_cols = []
    for i in range(3):
        hv = carry_blk[:, (C_HV + i) * LANES : (C_HV + i + 1) * LANES]
        pend = carry_blk[:, (C_PEND + i) * LANES : (C_PEND + i + 1) * LANES]
        hv_cols.append(hv + keep * pend)
    hd_col = carry_blk[:, C_HD * LANES : (C_HD + 1) * LANES]
    if depth - 1 == 1:
        ld = carry_blk[:, C_LDIST * LANES : (C_LDIST + 1) * LANES]
        hd_new = jnp.where(blocked, 0.5 * ld, ld) * hitdist_weight
        if hitdist_accumulate:
            hd_col = jnp.where(pend_sh, hd_col + hd_new, hd_col)
        else:
            hd_col = jnp.where(pend_sh, hd_new, hd_col)

    def unpk(col2d):
        return col2d.reshape(-1)[:n]

    seed_out = jax.lax.bitcast_convert_type(
        carry_blk[:, C_SEED * LANES : (C_SEED + 1) * LANES], jnp.uint32
    )
    return carry._replace(
        seed=unpk(seed_out),
        hit_value=jnp.stack([unpk(c) for c in hv_cols], axis=-1),
        hit_dists=unpk(hd_col),
        active=unpk(
            carry_blk[:, C_ACTIVE * LANES : (C_ACTIVE + 1) * LANES]
        ) > 0.0,
        is_specular=unpk(
            carry_blk[:, C_SPEC * LANES : (C_SPEC + 1) * LANES]
        ) > 0.0,
        light_dist=unpk(
            carry_blk[:, C_LDIST * LANES : (C_LDIST + 1) * LANES]
        ),
        cur_weight=jnp.stack(
            [
                unpk(carry_blk[:, (C_CW + i) * LANES : (C_CW + i + 1) * LANES])
                for i in range(3)
            ],
            axis=-1,
        ),
        rays_main=rays_main,
        rays_shadow=rays_shadow,
    )
