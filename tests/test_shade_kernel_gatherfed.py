"""Round-5 shade-kernel coverage modes vs the XLA shading path.

Two widenings of ``kernel_shading_available`` (ops/pallas/shade.py):

* gather-fed: tracers without resident attr tables (city-scale scenes)
  trace PLAIN and the resolve-layout block is built by XLA corner gathers +
  delta interpolation (``xla_resolve_blocks``).
* external albedo: baseColor-only textured scenes feed the kernel an XLA
  bilinear fetch block (``xla_albedo_block``).

Comparisons are statistical like test_shade_kernel (fp rounding feeds
chaotic path divergence on isolated lanes).
"""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from vkrt_tpu.models.pathtracer import pathtrace_frame
from vkrt_tpu.ops.pallas.shade import kernel_shading_available
from vkrt_tpu.ops.pallas.trace import make_pallas_tracer, spec_for_scene
from vkrt_tpu.scene import make_city, make_cornell_box, scene_base_only_textured
from vkrt_tpu.utils.camera import Camera


@pytest.fixture(scope="module")
def city():
    return make_city(grid=4)  # 256 tris, baseColor-only textures, 4 lights


def _nonresolving_tracer(scene):
    spec = dataclasses.replace(
        spec_for_scene(int(scene.tri_v0.shape[0])), attr_vmem_budget=1
    )
    pt = make_pallas_tracer(scene, interpret=True, spec=spec)
    assert not pt.resolves_attrs
    return pt


def test_gate_widened(city):
    # baseColor-only textured scene gates IN, resolving or not
    assert scene_base_only_textured(city)
    pt = make_pallas_tracer(city, interpret=True)
    assert kernel_shading_available(city, pt)
    assert kernel_shading_available(city, _nonresolving_tracer(city))
    # untextured + non-resolving (gather-fed) also gates in now
    box = make_cornell_box()
    pt_box = make_pallas_tracer(box, interpret=True)
    assert kernel_shading_available(
        box, pt_box._replace(cs=pt_box.cs._replace(attr_cols=()))
    )


def _compare(scene, pt, depth, monkeypatch, w=32, h=24, lane_budget=0.01):
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
    assert r_xla == r_krn
    d = np.abs(a_xla - a_krn)
    assert d.mean() < 1e-3, d.mean()
    assert (d > 1e-3).mean() < lane_budget, (d > 1e-3).mean()


def test_albedo_mode_resolving_tracer(city, monkeypatch):
    """Textured base-only scene, attr tables resident: in-kernel resolve +
    external albedo vs the XLA path."""
    pt = make_pallas_tracer(city, interpret=True)
    assert pt.resolves_attrs
    _compare(city, pt, depth=3, monkeypatch=monkeypatch)


def test_gatherfed_mode(city, monkeypatch):
    """Textured base-only scene, NO resident attr tables: plain trace +
    XLA-gathered resolve block + external albedo vs the XLA path."""
    _compare(city, _nonresolving_tracer(city), depth=3,
             monkeypatch=monkeypatch)


def test_gatherfed_untextured(monkeypatch):
    """Untextured scene without resident tables (gather-fed, no albedo)."""
    box = make_cornell_box()
    _compare(box, _nonresolving_tracer(box), depth=2,
             monkeypatch=monkeypatch)


def test_gatherfed_vs_resolving_kernel(city):
    """The two kernel-shading trace feeds (in-kernel resolve vs XLA
    gathers) must agree with each other too."""
    w, h = 32, 24
    cam = Camera().matrices(w, h)
    accum0 = jnp.zeros((w * h, 3), jnp.float32)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    outs = []
    for pt in (make_pallas_tracer(city, interpret=True),
               _nonresolving_tracer(city)):
        a, _ = pathtrace_frame(
            city, pt, cam, 0, accum0, clear, width=w, height=h,
            samples=1, depth=3,
        )
        outs.append(np.asarray(a))
    d = np.abs(outs[0] - outs[1])
    assert d.mean() < 1e-3, d.mean()
    assert (d > 1e-3).mean() < 0.01, (d > 1e-3).mean()
