"""Denoiser: temporal reprojection + variance-guided à-trous filtering.

The reference wires NRD REBLUR_DIFFUSE end to end but leaves the actual
``NRD.Denoise`` dispatch commented out (main.cpp:566-602) — this module
*finishes* that subsystem, consuming the exact 5-buffer contract the
reference produces (hello_vulkan.h:199-207): packed diffuse radiance +
normalized hit distance (YCoCg, gltf.glsl:227-244), oct-packed
normal+roughness (gltf.glsl:167-176), viewZ, and motion vectors.

Round 2 adds the temporal half REBLUR actually is (the round-1 filter was
spatial-only):

* **camera reprojection** — the scene is static, so screen motion comes
  from the camera alone: the previous frame's viewProj re-projects each
  G-buffer world position to its previous pixel (the motion-vector math the
  reference's MV buffer exists for, main.cpp:355-380 + populateCommonSettings
  prev-matrix plumbing, hello_vulkan.cpp:1475-1499);
* **disocclusion-tested history** — bilinear history taps validated by
  previous-frame viewZ (relative depth test) and normal agreement, REBLUR's
  "occlusion" logic in miniature;
* **history clamp** — reprojected color clamped to the current frame's 3x3
  neighborhood box to kill ghosting;
* **variance-guided à-trous** — SVGF-style: luminance moments accumulate
  temporally, their variance steers the edge-stopping luminance weight, and
  the packed *hit distance* (which round 1 discarded) scales the effective
  blur radius so contact-occlusion detail survives.

Everything is jnp.roll/reshape image-space math except the one history
gather (4 bilinear taps/pixel), which is unavoidable for reprojection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vkrt_tpu.ops import nrd

# 1D B3-spline kernel for the à-trous wavelet
_KERNEL = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)
SIGMA_Z = 1.0
SIGMA_N = 64.0
SIGMA_L = 4.0          # SVGF luminance sigma
MAX_HISTORY = 32.0     # REBLUR maxAccumulatedFrameNum ballpark
DEPTH_REJECT = 0.05    # relative viewZ disocclusion threshold
NORMAL_REJECT = 0.8    # min dot(n, n_prev) to accept history


def _luminance(rgb):
    return 0.25 * rgb[..., 0] + 0.5 * rgb[..., 1] + 0.25 * rgb[..., 2]


class DenoiserState(NamedTuple):
    """Per-pixel temporal history, image (row-major) order."""

    hist_rad: jnp.ndarray      # (N,3) accumulated radiance
    hist_m1: jnp.ndarray       # (N,) luminance 1st moment
    hist_m2: jnp.ndarray       # (N,) luminance 2nd moment
    hist_len: jnp.ndarray      # (N,) accumulated frame count (0 = none)
    prev_view_proj: jnp.ndarray  # (4,4)
    prev_view_z: jnp.ndarray   # (N,)
    prev_normal: jnp.ndarray   # (N,3)


def init_state(width: int, height: int) -> DenoiserState:
    n = width * height
    return DenoiserState(
        hist_rad=jnp.zeros((n, 3), jnp.float32),
        hist_m1=jnp.zeros((n,), jnp.float32),
        hist_m2=jnp.zeros((n,), jnp.float32),
        hist_len=jnp.zeros((n,), jnp.float32),
        prev_view_proj=jnp.zeros((4, 4), jnp.float32),
        prev_view_z=jnp.zeros((n,), jnp.float32),
        prev_normal=jnp.zeros((n, 3), jnp.float32),
    )


def motion_vectors(world_pos, prev_view_proj, width: int, height: int):
    """Screen-space motion: previous-frame pixel coords of each world point.

    Returns (prev_px (N,2) float pixel coords, in_prev (N,) bool). The MV
    written to the G-buffer contract is ``prev_px - cur_px``.
    """
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[:, :1])], axis=1)
    clip = p @ prev_view_proj.T
    w = clip[:, 3]
    ndc = clip[:, :2] / jnp.where(jnp.abs(w) < 1e-20, 1e-20, w)[:, None]
    uv = ndc * 0.5 + 0.5  # Vulkan clip: y already flipped by perspectiveVK
    prev_px = uv * jnp.asarray([width, height], jnp.float32) - 0.5
    in_prev = (
        (w > 0.0)  # half-pixel slack: border pixel centers land on W-1 +- eps
        & (prev_px[:, 0] >= -0.5) & (prev_px[:, 0] <= width - 0.5)
        & (prev_px[:, 1] >= -0.5) & (prev_px[:, 1] <= height - 0.5)
    )
    return prev_px, in_prev


def _gather(img_flat, idx):
    return jnp.take(img_flat, idx, axis=0)


# --- row-halo machinery (shared by full-frame and tile-sharded filtering) ---
#
# The à-trous taps are periodic row shifts (jnp.roll semantics). Expressing
# them as "pad k halo rows on each side, then slice" makes the SAME filter
# body run full-frame (halo = own wrapped rows) and tile-sharded (halo =
# neighbor bands fetched over ICI with jax.lax.ppermute on the tile ring —
# the ring's wraparound IS roll's periodicity, so sharded output equals the
# single-device image bit-for-bit).


def _periodic_halo(x, k: int):
    """Full-frame halo: periodic self-wrap (== jnp.roll row semantics)."""
    return x[-k:], x[:k]


def _ring_halo(axis_name: str):
    """Halo fetch over a sharded row-band ring via ppermute."""

    def fetch(x, k: int):
        nd = jax.lax.axis_size(axis_name)
        fwd = [(i, (i + 1) % nd) for i in range(nd)]
        bwd = [(i, (i - 1) % nd) for i in range(nd)]
        # my top halo = previous band's last k rows; my bottom halo = next
        # band's first k rows
        top = jax.lax.ppermute(x[-k:], axis_name, fwd)
        bottom = jax.lax.ppermute(x[:k], axis_name, bwd)
        return top, bottom

    return fetch


def _pad_rows(x, k: int, halo_fn):
    top, bottom = halo_fn(x, k)
    return jnp.concatenate([top, x, bottom], axis=0)


def reproject(
    state: DenoiserState, world_pos, view_z, normal, width: int, height: int
):
    """Bilinearly sample validated history at each pixel's previous position.

    Returns (hist_rad, m1, m2, hist_len) with hist_len = 0 where history is
    missing/disoccluded — the temporal accumulator then falls back to the
    current frame alone.
    """
    prev_px, in_prev = motion_vectors(
        world_pos, state.prev_view_proj, width, height
    )
    x0 = jnp.floor(prev_px[:, 0])
    y0 = jnp.floor(prev_px[:, 1])
    fx = prev_px[:, 0] - x0
    fy = prev_px[:, 1] - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, width - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, height - 1)
    x1 = jnp.minimum(x0 + 1, width - 1)
    y1 = jnp.minimum(y0 + 1, height - 1)

    # expected depth of this surface in the previous frame's view: reuse the
    # projective w (= -viewZ under perspectiveVK, hello_vulkan.cpp:66-72)
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[:, :1])], axis=1)
    w_prev = (p @ state.prev_view_proj.T)[:, 3]

    taps = [
        (y0 * width + x0, (1 - fx) * (1 - fy)),
        (y0 * width + x1, fx * (1 - fy)),
        (y1 * width + x0, (1 - fx) * fy),
        (y1 * width + x1, fx * fy),
    ]
    # accumulators sized by the QUERY rows (a band under sharding), not the
    # state (always full-frame): sharded reprojection gathers from the
    # all-gathered history while producing only its own band
    nq = world_pos.shape[0]
    acc_rad = jnp.zeros((nq, 3), jnp.float32)
    acc_m1 = jnp.zeros((nq,), jnp.float32)
    acc_m2 = jnp.zeros((nq,), jnp.float32)
    acc_len = jnp.zeros((nq,), jnp.float32)
    wsum = jnp.zeros((nq,), jnp.float32)
    for idx, wgt in taps:
        pz = _gather(state.prev_view_z, idx)
        pn = _gather(state.prev_normal, idx)
        ok = (
            in_prev
            & (_gather(state.hist_len, idx) > 0.0)
            & (jnp.abs(pz - jnp.abs(w_prev))
               <= DEPTH_REJECT * jnp.maximum(jnp.abs(w_prev), 1.0))
            & (jnp.sum(pn * normal, axis=-1) >= NORMAL_REJECT)
        )
        wv = jnp.where(ok, wgt, 0.0)
        acc_rad = acc_rad + _gather(state.hist_rad, idx) * wv[:, None]
        acc_m1 = acc_m1 + _gather(state.hist_m1, idx) * wv
        acc_m2 = acc_m2 + _gather(state.hist_m2, idx) * wv
        acc_len = acc_len + _gather(state.hist_len, idx) * wv
        wsum = wsum + wv
    valid = wsum > 1e-4
    inv = 1.0 / jnp.maximum(wsum, 1e-4)
    return (
        jnp.where(valid[:, None], acc_rad * inv[:, None], 0.0),
        jnp.where(valid, acc_m1 * inv, 0.0),
        jnp.where(valid, acc_m2 * inv, 0.0),
        jnp.where(valid, acc_len * inv, 0.0),
    )


def _neighborhood_clamp(hist_rad, cur_rad, width, height,
                        halo_fn=None, axis_name=None):
    """Clamp history to the 3x3 box of the current frame (anti-ghosting).

    Edge-clamped shifts (pad-replicate + slice), NOT jnp.roll: wrap-around
    taps would let border pixels clamp against pixels from the opposite edge
    of the frame, corrupting the anti-ghosting box at image borders.

    With ``halo_fn``/``axis_name`` (tile-sharded bands): interior band
    borders take the true neighbor rows; the FIRST band's top halo and LAST
    band's bottom halo replicate their own edge row, reproducing the
    full-frame edge-pad exactly."""
    img = cur_rad.reshape(height, width, 3)
    if halo_fn is None:
        padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    else:
        top, bottom = halo_fn(img, 1)
        nd = jax.lax.axis_size(axis_name)
        band = jax.lax.axis_index(axis_name)
        top = jnp.where(band == 0, img[:1], top)
        bottom = jnp.where(band == nd - 1, img[-1:], bottom)
        padded = jnp.pad(
            jnp.concatenate([top, img, bottom], axis=0),
            ((0, 0), (1, 1), (0, 0)), mode="edge",
        )
    lo = img
    hi = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            q = jax.lax.dynamic_slice(
                padded, (1 + dy, 1 + dx, 0), (height, width, 3)
            )
            lo = jnp.minimum(lo, q)
            hi = jnp.maximum(hi, q)
    return jnp.clip(hist_rad, lo.reshape(-1, 3), hi.reshape(-1, 3))


def atrous_filter(radiance, normal, view_z, width, height, iterations: int = 3,
                  variance=None, hit_dist_norm=None, halo_fn=None):
    """Edge-aware à-trous filtering. All inputs flat (N,...) row-major.

    ``variance``: optional (N,) luminance variance — adds the SVGF
    luminance edge-stopper (filtered alongside the image).
    ``hit_dist_norm``: optional (N,) in [0,1] — scales the spatial kernel
    weight so short-hit-distance (contact) regions blur less (the REBLUR
    hit-distance-driven blur radius, in à-trous form).
    ``halo_fn``: row-halo source — None = full frame (periodic self-wrap,
    identical to the jnp.roll formulation); ``_ring_halo(axis)`` = tile-
    sharded bands exchanging boundary rows over the device ring, which
    reproduces the full-frame result exactly (the ring's wraparound is
    roll's periodicity).
    """
    h, w = height, width
    halo = _periodic_halo if halo_fn is None else halo_fn
    # halos come from the adjacent band only: the largest tap reach must fit
    # in one band (also required by the periodic self-wrap slices)
    assert h >= 2 ** iterations, (h, iterations)
    img = radiance.reshape(h, w, 3)
    nrm = normal.reshape(h, w, 3)
    z = view_z.reshape(h, w)
    var = None if variance is None else jnp.maximum(variance, 0.0).reshape(h, w)
    # hit distance 0 = no GI data (miss) -> nothing to preserve, full blur
    hd = None if hit_dist_norm is None else jnp.where(
        hit_dist_norm <= 1e-4, 1.0, jnp.clip(hit_dist_norm, 0.05, 1.0)
    ).reshape(h, w)

    for it in range(iterations):
        step = 1 << it
        k = 2 * step  # largest row reach this iteration
        img_p = _pad_rows(img, k, halo)
        nrm_p = _pad_rows(nrm, k, halo)
        z_p = _pad_rows(z, k, halo)
        var_p = None if var is None else _pad_rows(var, k, halo)
        lum_p = _luminance(img_p)

        def tap(p, sy, sx):
            return jnp.roll(p[k + sy : k + sy + h], -sx, axis=1)

        acc = jnp.zeros_like(img)
        vacc = None if var is None else jnp.zeros_like(var)
        wsum = jnp.zeros((h, w, 1), img.dtype)
        v_wsum = jnp.zeros((h, w), img.dtype)
        lum = lum_p[k : k + h]
        sig_l = None
        if var is not None:
            # 3x3 pre-blur of variance stabilizes the weight (SVGF)
            vb = jnp.zeros_like(var)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    vb = vb + tap(var_p, dy, dx)
            sig_l = SIGMA_L * jnp.sqrt(vb / 9.0) + 1e-4
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                kw = _KERNEL[dy + 2] * _KERNEL[dx + 2]
                sy, sx = dy * step, dx * step
                img_q = tap(img_p, sy, sx)
                nrm_q = tap(nrm_p, sy, sx)
                z_q = tap(z_p, sy, sx)
                w_n = jnp.maximum(jnp.sum(nrm * nrm_q, axis=-1), 0.0) ** SIGMA_N
                w_z = jnp.exp(-jnp.abs(z - z_q) / (SIGMA_Z * abs(sy) + SIGMA_Z * abs(sx) + 1e-3))
                wgt = kw * w_n * w_z
                if var is not None:
                    lum_q = tap(lum_p, sy, sx)
                    wgt = wgt * jnp.exp(-jnp.abs(lum - lum_q) / sig_l)
                if hd is not None and (dy or dx):
                    # short hit distances (contact occlusion) shrink the
                    # effective blur radius — gently: a floored fade, never
                    # below 25% (a hard cutoff was measured to strangle the
                    # filter and lose to spatial-only)
                    r = (dy * dy + dx * dx) ** 0.5 / 2.0
                    wgt = wgt * (
                        0.5 + 0.5 * jnp.minimum(1.0, hd * 6.0 / r)
                    )
                acc = acc + img_q * wgt[..., None]
                wsum = wsum + wgt[..., None]
                if var is not None:
                    var_q = tap(var_p, sy, sx)
                    vacc = vacc + var_q * wgt * wgt
                    v_wsum = v_wsum + wgt
        img = acc / jnp.maximum(wsum, 1e-8)
        if var is not None:
            var = vacc / jnp.maximum(v_wsum * v_wsum, 1e-8)
    return img.reshape(-1, 3)


def denoise_gi(diff_rad_hitd, norm_rough_packed, view_z, width, height,
               iterations: int = 3):
    """Spatial-only REBLUR-contract entry (kept for sharded tiles/tests):
    unpack, filter, return linear RGB (N,3)."""
    unpacked = nrd.unpack_radiance_and_norm_hit_dist(diff_rad_hitd)
    radiance = unpacked[..., :3]
    normal, _rough, _mid = nrd.unpack_normal_and_roughness(norm_rough_packed)
    return atrous_filter(radiance, normal, view_z, width, height, iterations)


def denoise_temporal(
    state: DenoiserState,
    diff_rad_hitd,
    norm_rough_packed,
    view_z,
    world_pos,
    view_proj,
    width: int,
    height: int,
    iterations: int = 3,
):
    """Full temporal+spatial denoise — the ``NRD.Denoise`` dispatch the
    reference leaves disabled (main.cpp:566-602), REBLUR-style.

    All buffers in image (row-major) order. Returns
    (filtered_radiance (N,3), new DenoiserState).
    """
    unpacked = nrd.unpack_radiance_and_norm_hit_dist(diff_rad_hitd)
    cur_rad = unpacked[..., :3]
    hd_norm = unpacked[..., 3]
    normal, _rough, _ = nrd.unpack_normal_and_roughness(norm_rough_packed)

    h_rad, h_m1, h_m2, h_len = reproject(
        state, world_pos, view_z, normal, width, height
    )
    h_rad = _neighborhood_clamp(h_rad, cur_rad, width, height)

    new_len = jnp.minimum(h_len + 1.0, MAX_HISTORY)
    alpha = 1.0 / new_len
    rad_acc = h_rad * (1.0 - alpha[:, None]) + cur_rad * alpha[:, None]
    lum = _luminance(cur_rad)
    m1 = h_m1 * (1.0 - alpha) + lum * alpha
    m2 = h_m2 * (1.0 - alpha) + lum * lum * alpha
    variance = jnp.maximum(m2 - m1 * m1, 0.0)
    # short history -> inflate variance so the spatial filter works harder
    variance = variance + jnp.where(new_len < 4.0, 0.5 / new_len, 0.0)

    filtered = atrous_filter(
        rad_acc, normal, view_z, width, height, iterations,
        variance=variance, hit_dist_norm=hd_norm,
    )

    # SVGF feeds the first filtered result back as next frame's history —
    # approximate with the final filtered image (stabler under motion)
    new_state = DenoiserState(
        hist_rad=filtered,
        hist_m1=m1,
        hist_m2=m2,
        hist_len=new_len,
        prev_view_proj=view_proj,
        prev_view_z=jnp.abs(view_z),
        prev_normal=normal,
    )
    return filtered, new_state


def denoise_temporal_tile(
    state: DenoiserState,
    diff_rad_hitd,
    norm_rough_packed,
    view_z,
    world_pos,
    view_proj,
    width: int,
    height: int,
    axis_name: str,
    iterations: int = 3,
):
    """``denoise_temporal`` inside shard_map over row bands (the 'tile'
    axis), per-pixel equal to the full-frame filter.

    The two non-pointwise stages get TPU-native collectives instead of a
    full-frame round trip:

    * **reprojection** is a globally-scattered gather (camera motion can move
      a pixel's history across any band boundary), so the six per-pixel
      history arrays are ``all_gather``-ed over the ring (~9 floats/pixel —
      sub-ms on ICI) and each band reprojects its own rows against them;
    * **neighborhood clamp + à-trous** are stencils: boundary rows travel to
      the adjacent band with ``ppermute`` halos (``_ring_halo``), never a
      full-frame gather.

    ``height`` is the FULL image height; all per-pixel inputs and the state
    are this band's rows (height/n_tile of them, row-major). Returns
    (filtered band, new band state). The reference's NRD denoiser operates
    strictly full-frame at full resolution (main.cpp:290-298) — this is the
    mesh-parallel form of that contract.
    """
    hb = world_pos.shape[0] // width  # band rows
    halo_fn = _ring_halo(axis_name)

    def gather_full(x):
        return jax.lax.all_gather(x, axis_name, tiled=True)

    full_state = state._replace(
        hist_rad=gather_full(state.hist_rad),
        hist_m1=gather_full(state.hist_m1),
        hist_m2=gather_full(state.hist_m2),
        hist_len=gather_full(state.hist_len),
        prev_view_z=gather_full(state.prev_view_z),
        prev_normal=gather_full(state.prev_normal),
    )

    unpacked = nrd.unpack_radiance_and_norm_hit_dist(diff_rad_hitd)
    cur_rad = unpacked[..., :3]
    hd_norm = unpacked[..., 3]
    normal, _rough, _ = nrd.unpack_normal_and_roughness(norm_rough_packed)

    h_rad, h_m1, h_m2, h_len = reproject(
        full_state, world_pos, view_z, normal, width, height
    )
    h_rad = _neighborhood_clamp(
        h_rad, cur_rad, width, hb, halo_fn=halo_fn, axis_name=axis_name
    )

    new_len = jnp.minimum(h_len + 1.0, MAX_HISTORY)
    alpha = 1.0 / new_len
    rad_acc = h_rad * (1.0 - alpha[:, None]) + cur_rad * alpha[:, None]
    lum = _luminance(cur_rad)
    m1 = h_m1 * (1.0 - alpha) + lum * alpha
    m2 = h_m2 * (1.0 - alpha) + lum * lum * alpha
    variance = jnp.maximum(m2 - m1 * m1, 0.0)
    variance = variance + jnp.where(new_len < 4.0, 0.5 / new_len, 0.0)

    filtered = atrous_filter(
        rad_acc, normal, view_z, width, hb, iterations,
        variance=variance, hit_dist_norm=hd_norm, halo_fn=halo_fn,
    )

    new_state = DenoiserState(
        hist_rad=filtered,
        hist_m1=m1,
        hist_m2=m2,
        hist_len=new_len,
        prev_view_proj=view_proj,
        prev_view_z=jnp.abs(view_z),
        prev_normal=normal,
    )
    return filtered, new_state
