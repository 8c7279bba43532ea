"""Texture sampling as batched gather ops.

Replaces the reference's descriptor-array ``textureSamplers`` fetches
(raytrace.rchit:87,102; gltf.glsl:26-53): bilinear filtering with REPEAT
addressing on the stacked/padded atlas in :class:`SceneArrays`. Mip selection
(the reference generates full mip chains, hello_vulkan.cpp:499) is provided by
:func:`build_mip_pyramid` + trilinear lookup for the hybrid G-buffer path;
the path tracer samples level 0 like the ray pipeline effectively does for
secondary rays (no ray differentials in the reference either).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _gather_texel(tex_flat, k, y, x, th, tw):
    lin = (k * th + y) * tw + x
    return jnp.take(tex_flat, lin, axis=0)


def sample_texture(tex_rgba, tex_size, tex_idx, uv):
    """Bilinear REPEAT sample. tex_idx (N,) int32 (-1 => white), uv (N,2).

    Returns (N,4) RGBA. Texel centers at half-integer coordinates
    (GL_LINEAR convention).
    """
    k_all, th, tw, _ = tex_rgba.shape
    tex_flat = tex_rgba.reshape(k_all * th * tw, 4)
    k = jnp.maximum(tex_idx, 0)
    size = jnp.take(tex_size, k, axis=0)  # (N,2) w,h
    w = size[:, 0].astype(jnp.float32)
    h = size[:, 1].astype(jnp.float32)

    u = uv[:, 0] - jnp.floor(uv[:, 0])  # REPEAT wrap
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = (fx - x0)[:, None]
    ay = (fy - y0)[:, None]

    wi = size[:, 0]
    hi = size[:, 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0.astype(jnp.int32) + 1, hi)

    c00 = _gather_texel(tex_flat, k, y0i, x0i, th, tw)
    c10 = _gather_texel(tex_flat, k, y0i, x1i, th, tw)
    c01 = _gather_texel(tex_flat, k, y1i, x0i, th, tw)
    c11 = _gather_texel(tex_flat, k, y1i, x1i, th, tw)
    c = (
        c00 * (1 - ax) * (1 - ay)
        + c10 * ax * (1 - ay)
        + c01 * (1 - ax) * ay
        + c11 * ax * ay
    )
    return jnp.where((tex_idx >= 0)[:, None], c, 1.0)


def build_mip_pyramid(image: np.ndarray):
    """Full mip chain by 2x2 box filter (cmdGenerateMipmaps equivalent,
    hello_vulkan.cpp:499). Host-side numpy; returns list level0..levelN."""
    levels = [np.asarray(image, np.float32)]
    cur = levels[0]
    while max(cur.shape[0], cur.shape[1]) > 1:
        nxt = cur
        if nxt.shape[0] > 1:
            h = nxt.shape[0] // 2
            nxt = 0.5 * (nxt[0 : 2 * h : 2] + nxt[1 : 2 * h : 2])
        if nxt.shape[1] > 1:
            w = nxt.shape[1] // 2
            nxt = 0.5 * (nxt[:, 0 : 2 * w : 2] + nxt[:, 1 : 2 * w : 2])
        levels.append(nxt.astype(np.float32))
        cur = nxt
    return levels
