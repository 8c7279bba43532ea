"""Packed Pallas shade-kernel (ops/pallas/shade.py) vs the XLA shading path.

The kernel reproduces sample_bsdf + the bounce-carry update on the trace
kernel's packed layout; same RNG draw order, same estimator quirks. Residual
differences are fp rounding feeding chaotic path divergence on isolated
lanes, so comparisons are statistical (like the resolve-vs-gather test).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vkrt_tpu.models.pathtracer import pathtrace_frame
from vkrt_tpu.ops.pallas.shade import kernel_shading_available
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer
from vkrt_tpu.scene import make_cornell_box
from vkrt_tpu.utils.camera import Camera


@pytest.fixture(scope="module")
def box():
    return make_cornell_box()


def test_gate(box):
    pt = make_pallas_tracer(box, interpret=True)
    assert kernel_shading_available(box, pt)
    # round 5: stripping the attr tables no longer disables the kernel —
    # the gather-fed mode covers non-resolving tracers
    # (tests/test_shade_kernel_gatherfed.py); scenes with non-baseColor
    # textures still fall back to XLA shading
    from vkrt_tpu.scene import SceneArrays  # noqa: F401

    assert kernel_shading_available(
        box, pt._replace(cs=pt.cs._replace(attr_cols=()))
    )
    nmap = box._replace(
        mat_normal_tex=jnp.zeros_like(box.mat_normal_tex)  # slot 0 "used"
    )
    assert not kernel_shading_available(nmap, pt)


def _edge_scene(n_mats, n_lights, metallic=0.0, roughness=0.6, seed=11):
    """Triangle soup exercising exactly ``n_mats`` materials and
    ``n_lights`` lights (the kernel's one-hot material/light loops are
    unrolled to MAX_MATS/MAX_LIGHTS — coverage at the bounds)."""
    import vkrt_tpu.utils.gltf as gltf_mod
    from vkrt_tpu.scene import scene_from_soup, _box

    rng = np.random.default_rng(seed)
    tris, mat_ids = [], []
    # a loose box room so bounces hit SOMETHING, plus scattered inner tris
    for wall, mid in (
        (((0, 0, -6), (6, 6, 0.3)), 0),
        (((0, -6, 0), (6, 0.3, 6)), 1 % n_mats),
        (((-6, 0, 0), (0.3, 6, 6)), 2 % n_mats),
        (((6, 0, 0), (0.3, 6, 6)), 3 % n_mats),
    ):
        ts = _box(*wall)
        tris.extend(ts)
        mat_ids.extend([mid] * len(ts))
    centers = rng.uniform(-4, 4, (n_mats * 2, 1, 3))
    offs = rng.normal(0, 0.5, (n_mats * 2, 3, 3))
    for k, t in enumerate((centers + offs).astype(np.float32)):
        tris.append(t)
        mat_ids.append(k % n_mats)
    mats = [
        gltf_mod.GltfMaterial(
            np.array([0.2 + 0.8 * (k % 5) / 4, 0.3 + 0.7 * (k % 3) / 2,
                      0.9 - 0.8 * (k % 7) / 6, 1.0], np.float32),
            metallic_factor=metallic, roughness_factor=roughness,
        )
        for k in range(n_mats)
    ]
    lights = [
        gltf_mod.GltfLight(
            rng.uniform(-4, 4, 3).astype(np.float32),
            np.ones(3, np.float32), 40.0 + 10.0 * k, 0,
        )
        for k in range(n_lights)
    ]
    return scene_from_soup(tris, mat_ids, mats, lights)


def _compare_kernel_vs_xla(scene, depth, monkeypatch, w=32, h=24,
                           lane_budget=0.01):
    pt = make_pallas_tracer(scene, interpret=True)
    assert kernel_shading_available(scene, pt), "edge scene must gate IN"
    cam = Camera().matrices(w, h)
    accum0 = jnp.zeros((w * h, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setitem(os.environ, "VKRT_SHADE_KERNEL", flag)
        a, r = pathtrace_frame(
            scene, pt, cam, 0, accum0, clear, width=w, height=h,
            samples=1, depth=depth, clamp_weights=True,
        )
        outs[flag] = (np.asarray(a), float(r))
    a_xla, r_xla = outs["0"]
    a_krn, r_krn = outs["1"]
    assert np.isfinite(a_krn).all()
    assert r_xla == r_krn  # identical active/do_shadow masks every bounce
    d = np.abs(a_xla - a_krn)
    assert d.mean() < 1e-3, d.mean()
    assert (d > 1e-3).mean() < lane_budget, (d > 1e-3).mean()


def test_kernel_at_max_mats(box, monkeypatch):
    """MAX_MATS=32 materials in play: the kernel's one-hot material loop
    must pick every table row correctly at the unroll bound."""
    from vkrt_tpu.ops.pallas.shade import MAX_MATS

    scene = _edge_scene(MAX_MATS, 2)
    assert scene.mat_base_color.shape[0] == MAX_MATS
    _compare_kernel_vs_xla(scene, depth=2, monkeypatch=monkeypatch)


def test_kernel_at_max_lights(box, monkeypatch):
    """MAX_LIGHTS=8 lights: NEE light pick + intensity/distance falloff at
    the light-loop bound (uniform 1/8 pick probabilities exercise every
    one-hot slot)."""
    from vkrt_tpu.ops.pallas.shade import MAX_LIGHTS

    scene = _edge_scene(4, MAX_LIGHTS)
    assert scene.num_lights == MAX_LIGHTS
    _compare_kernel_vs_xla(scene, depth=2, monkeypatch=monkeypatch)


def test_kernel_over_bounds_gates_out(box):
    """One past either bound must fall back to XLA shading, not truncate."""
    from vkrt_tpu.ops.pallas.shade import MAX_LIGHTS, MAX_MATS

    s_m = _edge_scene(MAX_MATS + 1, 2)
    pt = make_pallas_tracer(s_m, interpret=True)
    assert not kernel_shading_available(s_m, pt)
    s_l = _edge_scene(4, MAX_LIGHTS + 1)
    pt = make_pallas_tracer(s_l, interpret=True)
    assert not kernel_shading_available(s_l, pt)


def test_kernel_pure_specular_chain(monkeypatch):
    """Near-mirror materials (metal≈1, rough≈0): the specular branch drives
    ~every lane through the GGX half-vector path and the emissive gate
    stays open (prd.isSpecular, rchit:83-88) across a depth-4 chain."""
    scene = _edge_scene(4, 2, metallic=0.99, roughness=0.02)
    _compare_kernel_vs_xla(scene, depth=4, monkeypatch=monkeypatch,
                           lane_budget=0.02)


def test_kernel_nee_deferral_depth4(box, monkeypatch):
    """Depth-4 Cornell: exercises the shadow-trace deferral epilogue (the
    shadow pool of bounce d resolves in bounce d+1's shade call) and the
    hit-distance resolve at d==2 over multiple carried bounces."""
    _compare_kernel_vs_xla(box, depth=4, monkeypatch=monkeypatch,
                           lane_budget=0.02)


def test_packed_frame_matches_xla_path(box, monkeypatch):
    """Full small frame: packed kernel loop vs XLA bounce loop, same tracer."""
    w, h = 32, 24
    pt = make_pallas_tracer(box, interpret=True)
    cam = Camera().matrices(w, h)
    accum0 = jnp.zeros((w * h, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    monkeypatch.setitem(os.environ, "VKRT_SHADE_KERNEL", "0")
    a_xla, r_xla = pathtrace_frame(
        box, pt, cam, 0, accum0, clear, width=w, height=h, samples=1, depth=2
    )
    monkeypatch.setitem(os.environ, "VKRT_SHADE_KERNEL", "1")
    a_krn, r_krn = pathtrace_frame(
        box, pt, cam, 0, accum0, clear, width=w, height=h, samples=1, depth=2
    )
    a_xla = np.asarray(a_xla)
    a_krn = np.asarray(a_krn)
    assert np.isfinite(a_krn).all()
    # identical ray counts = identical active/do_shadow masks every bounce
    assert float(r_xla) == float(r_krn)
    d = np.abs(a_xla - a_krn)
    assert d.mean() < 1e-3
    # fp-rounding path divergence may flip isolated lanes; bound the fraction
    assert (d > 1e-3).mean() < 0.01
