"""Temporal denoiser: reprojection math + end-to-end RMSE improvement.

VERDICT round-1 item 6: the fly-through (camera moving every frame, so
progressive accumulation resets each frame) must come out of the temporal
denoiser with RMSE vs a converged reference strictly better than BOTH the
noisy input and the spatial-only filter.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vkrt_tpu.config import RenderSettings
from vkrt_tpu.engine import Engine
from vkrt_tpu.models import denoiser as dn
from vkrt_tpu.scene import make_cornell_box
from vkrt_tpu.utils.camera import Camera, generate_rays, orbit_camera, pixel_coords

W, H = 48, 32


def test_motion_vectors_identity():
    """A static camera reprojects every pixel onto itself."""
    cam = Camera().matrices(W, H)
    pix = pixel_coords(W, H)
    origin, direction = generate_rays(cam, W, H, jnp.full((W * H, 2), 0.5))
    world_pos = origin + 5.0 * direction  # arbitrary points along the rays
    prev_px, in_prev = dn.motion_vectors(world_pos, cam.view_proj, W, H)
    # pixel-center rays must land back on their own pixel centers
    np.testing.assert_allclose(np.asarray(prev_px), np.asarray(pix), atol=1e-2)
    assert bool(jnp.all(in_prev))


def test_reproject_static_accumulates():
    """With an identical previous frame, reprojection returns the history."""
    cam = Camera().matrices(W, H)
    origin, direction = generate_rays(cam, W, H, jnp.full((W * H, 2), 0.5))
    world_pos = origin + 5.0 * direction
    view_z = -5.0 * jnp.ones((W * H,))
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (W * H, 1))
    st = dn.init_state(W, H)
    p = jnp.concatenate([world_pos, jnp.ones((W * H, 1))], axis=1)
    w_prev = (p @ cam.view_proj.T)[:, 3]
    st = st._replace(
        hist_rad=jnp.full((W * H, 3), 0.5),
        hist_len=jnp.ones((W * H,)),
        prev_view_proj=cam.view_proj,
        prev_view_z=jnp.abs(w_prev),
        prev_normal=normal,
    )
    h_rad, _, _, h_len = dn.reproject(st, world_pos, view_z, normal, W, H)
    np.testing.assert_allclose(np.asarray(h_rad), 0.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h_len), 1.0, atol=1e-3)


def test_reproject_rejects_empty_history():
    """Zero hist_len (fresh state) yields no reprojected history."""
    cam = Camera().matrices(W, H)
    origin, direction = generate_rays(cam, W, H, jnp.full((W * H, 2), 0.5))
    world_pos = origin + 5.0 * direction
    st = dn.init_state(W, H)._replace(prev_view_proj=cam.view_proj)
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (W * H, 1))
    _, _, _, h_len = dn.reproject(st, world_pos, -5.0 * jnp.ones((W * H,)), normal, W, H)
    assert float(jnp.max(h_len)) == 0.0


def _orbit_cam(t):
    return orbit_camera(t, center=(0.0, 0.0, 0.0), radius=15.0, height=0.5)


def _flythrough(settings, frames=5):
    e = Engine(make_cornell_box(), W, H, settings)
    out = None
    for f in range(frames):
        e.camera = _orbit_cam(0.002 * f)
        out = e.render_frame()
    return np.asarray(out)


def test_temporal_beats_noisy_and_spatial():
    """Fly-through RMSE: temporal < spatial-only and temporal < no-denoise.

    corr_sampler pinned OFF: the SVGF-style filter's edge-stopping design
    assumes high-frequency (white) per-pixel noise; the correlated
    sampler's block-shaped single-frame noise is invisible to a spatial
    kernel smaller than the block (documented trade, config.py). This test
    validates the FILTER against its design assumption."""
    frames = 5
    base = RenderSettings(rt_mode=0, use_gi=True, corr_sampler=False)
    noisy = _flythrough(base, frames)
    spatial = _flythrough(
        base.replace(use_denoiser=True, temporal_denoiser=False), frames
    )
    temporal = _flythrough(
        base.replace(use_denoiser=True, temporal_denoiser=True), frames
    )

    # converged reference at the final camera: static accumulation
    ref_engine = Engine(make_cornell_box(), W, H, base)
    ref_engine.camera = _orbit_cam(0.002 * (frames - 1))
    ref = None
    for _ in range(64):
        ref = ref_engine.render_frame()
    ref = np.asarray(ref)

    def rmse(a):
        return float(np.sqrt(np.mean((a - ref) ** 2)))

    r_noisy, r_spatial, r_temporal = rmse(noisy), rmse(spatial), rmse(temporal)
    assert r_temporal < r_noisy, (r_temporal, r_noisy)
    assert r_temporal < r_spatial, (r_temporal, r_spatial)
