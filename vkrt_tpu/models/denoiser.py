"""Denoiser: temporal accumulation + SVGF/REBLUR-style à-trous filtering.

The reference wires NRD REBLUR_DIFFUSE end to end but leaves the actual
``NRD.Denoise`` dispatch commented out (main.cpp:566-602) — this module
*finishes* that subsystem, consuming the exact 5-buffer contract the
reference produces (hello_vulkan.h:199-207): packed diffuse radiance +
normalized hit distance (YCoCg, gltf.glsl:227-244), oct-packed
normal+roughness (gltf.glsl:167-176) and viewZ.

Temporal accumulation already exists upstream (accumulateFrames /
mix(old,new,1/(frame+1))); here we add the spatial edge-aware à-trous wavelet
pass in the SVGF family, expressed entirely as jnp.roll shifts — the
TPU-friendly formulation (static shifts fuse into cheap VPU ops; no gathers).
"""

from __future__ import annotations

import jax.numpy as jnp

from vkrt_tpu.ops import nrd

# 1D B3-spline kernel for the à-trous wavelet
_KERNEL = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)
SIGMA_Z = 1.0
SIGMA_N = 64.0


def atrous_filter(radiance, normal, view_z, width, height, iterations: int = 3):
    """Edge-aware à-trous filtering. All inputs flat (N,...) row-major."""
    h, w = height, width
    img = radiance.reshape(h, w, 3)
    nrm = normal.reshape(h, w, 3)
    z = view_z.reshape(h, w)

    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(img)
        wsum = jnp.zeros((h, w, 1), img.dtype)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                kw = _KERNEL[dy + 2] * _KERNEL[dx + 2]
                sy, sx = dy * step, dx * step
                img_q = jnp.roll(img, (-sy, -sx), axis=(0, 1))
                nrm_q = jnp.roll(nrm, (-sy, -sx), axis=(0, 1))
                z_q = jnp.roll(z, (-sy, -sx), axis=(0, 1))
                w_n = jnp.maximum(jnp.sum(nrm * nrm_q, axis=-1), 0.0) ** SIGMA_N
                w_z = jnp.exp(-jnp.abs(z - z_q) / (SIGMA_Z * abs(sy) + SIGMA_Z * abs(sx) + 1e-3))
                wgt = (kw * w_n * w_z)[..., None]
                acc = acc + img_q * wgt
                wsum = wsum + wgt
        img = acc / jnp.maximum(wsum, 1e-8)
    return img.reshape(-1, 3)


def denoise_gi(diff_rad_hitd, norm_rough_packed, view_z, width, height,
               iterations: int = 3):
    """REBLUR-contract entry: unpack, filter, return linear RGB (N,3)."""
    unpacked = nrd.unpack_radiance_and_norm_hit_dist(diff_rad_hitd)
    radiance = unpacked[..., :3]
    normal, _rough, _mid = nrd.unpack_normal_and_roughness(norm_rough_packed)
    return atrous_filter(radiance, normal, view_z, width, height, iterations)
