"""Post pass: composite + gamma — the ``post.frag`` port (post.frag:36-60).

Path mode shows the accumulated RT image; hybrid mode composites
``raster.rgb * rt.a + rt.rgb`` (shadow/AO modulate, GI adds), with the
view-accumulated debug modes; everything is gamma corrected with 1/2.2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def composite(raster_rgb, rt_rgba, *, rt_mode: int, view_accumulated: bool, use_gi: bool):
    """(N,3)/(N,4) -> (N,3) linear before gamma (post.frag:41-56)."""
    if rt_mode == 1:  # path tracer: accumulated image as-is
        return raster_rgb if rt_rgba is None else rt_rgba[:, :3]
    if not view_accumulated:
        return raster_rgb * rt_rgba[:, 3:4] + rt_rgba[:, :3]
    if use_gi:
        return rt_rgba[:, :3] * rt_rgba[:, 3:4]
    return jnp.broadcast_to(rt_rgba[:, 3:4], rt_rgba[:, :3].shape)


def tonemap(rgb):
    """pow(color, 1/2.2) (post.frag:58)."""
    return jnp.power(jnp.maximum(rgb, 0.0), 1.0 / 2.2)


def to_u8_image(rgb_flat, width: int, height: int) -> np.ndarray:
    """Tonemapped linear (N,3) -> (H,W,3) uint8 for PNG output."""
    img = np.asarray(tonemap(rgb_flat)).reshape(height, width, 3)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
