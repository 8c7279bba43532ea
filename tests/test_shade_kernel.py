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
    # stripping the attr tables disables it
    assert not kernel_shading_available(
        box, pt._replace(cs=pt.cs._replace(attr_cols=()))
    )


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
