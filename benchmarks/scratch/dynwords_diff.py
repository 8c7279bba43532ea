"""Quantify the on-device static-vs-dyn_words output delta (interpret mode
is bit-exact; Mosaic codegen may contract FMAs differently between the
unrolled and looped forms)."""

import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vkrt_tpu.ops.pallas.trace import (
    make_pallas_tracer, spec_for_scene, _pack_rays, LANES,
)
from vkrt_tpu.scene import make_city

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
scene = make_city(grid=grid)
print(f"tris {scene.num_tris}", file=sys.stderr)

rng = np.random.default_rng(7)
N = 131072
o = np.stack([
    rng.uniform(-40, 40, N), rng.uniform(0.5, 6.0, N), rng.uniform(-40, 40, N)
], axis=1).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)

base = spec_for_scene(scene.num_tris)
outs = {}
for name, dyn in (("static", False), ("dyn", True)):
    spec = dataclasses.replace(base, dyn_words=dyn)
    tr = make_pallas_tracer(scene, spec=spec)
    hi = tr.closest(jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4)
    outs[name] = jax.tree.map(np.asarray, hi)

a, b = outs["static"], outs["dyn"]
hit_diff = (a.hit != b.hit).sum()
tri_diff = (a.tri != b.tri).sum()
t_diff = a.t != b.t
print(f"hit mismatches: {hit_diff}/{N}")
print(f"tri mismatches: {tri_diff}/{N}")
print(f"t mismatches: {t_diff.sum()}/{N}")
if t_diff.any():
    rel = np.abs(a.t[t_diff] - b.t[t_diff]) / np.maximum(np.abs(a.t[t_diff]), 1e-20)
    print(f"t rel delta: max {rel.max():.3e} median {np.median(rel):.3e}")
    same_tri = (a.tri[t_diff] == b.tri[t_diff]).mean()
    print(f"of t-mismatched lanes, same winner tri: {same_tri:.4f}")
