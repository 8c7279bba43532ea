"""Post pass: composite + gamma — the ``post.frag`` port (post.frag:36-60).

Path mode shows the accumulated RT image; hybrid mode composites
``raster.rgb * rt.a + rt.rgb`` (shadow/AO modulate, GI adds), with the
view-accumulated debug modes; everything is gamma corrected with 1/2.2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def composite(raster_rgb, rt_rgba, *, rt_mode: int, view_accumulated, use_gi: bool):
    """(N,3)/(N,4) -> (N,3) linear before gamma (post.frag:41-56).

    ``view_accumulated`` may be a Python bool (static, one branch compiled)
    or a traced bool scalar — the reference toggles it per frame via push
    constant (host_device.h:88-98, main.cpp:90-96) with no pipeline rebuild,
    so the engine passes it traced and reuses one compiled display step."""
    if rt_mode == 1:  # path tracer: accumulated image as-is
        return raster_rgb if rt_rgba is None else rt_rgba[:, :3]
    normal = raster_rgb * rt_rgba[:, 3:4] + rt_rgba[:, :3]
    if use_gi:
        acc = rt_rgba[:, :3] * rt_rgba[:, 3:4]
    else:
        acc = jnp.broadcast_to(rt_rgba[:, 3:4], rt_rgba[:, :3].shape)
    if isinstance(view_accumulated, bool):  # static call sites
        return acc if view_accumulated else normal
    return jnp.where(jnp.asarray(view_accumulated), acc, normal)


def tonemap(rgb):
    """pow(color, 1/2.2) (post.frag:58)."""
    return jnp.power(jnp.maximum(rgb, 0.0), 1.0 / 2.2)


def to_u8_image(rgb_flat, width: int, height: int) -> np.ndarray:
    """Tonemapped linear (N,3) -> (H,W,3) uint8 for PNG output."""
    img = np.asarray(tonemap(rgb_flat)).reshape(height, width, 3)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
