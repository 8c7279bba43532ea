"""Interleaved A/B of spec.dyn_words (dynamic super-word scan) on the city.

Measures BOTH costs the static unroll carries on city-class scenes:
  * compile time of one packed trace program (no persistent cache — each
    variant compiles cold through the tunnel compile service);
  * steady-state runtime on a realistic incoherent bounce-like pool,
    interleaved same-process frames (the only trustworthy comparison on
    this box, STATUS r3).

Usage: python benchmarks/scratch/dynwords_ab.py [grid] [reps]
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vkrt_tpu.ops.pallas.trace import (
    make_pallas_tracer, spec_for_scene, _pack_rays,
)
from vkrt_tpu.scene import make_city

grid = int(sys.argv[1]) if len(sys.argv) > 1 else 120
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

scene = make_city(grid=grid)
print(f"city grid={grid}: {scene.num_tris} tris", file=sys.stderr, flush=True)

rng = np.random.default_rng(7)
N = 921_600
# bounce-like pool: origins on geometry-ish heights, cosine-spread dirs
o = np.stack([
    rng.uniform(-40, 40, N), rng.uniform(0.5, 6.0, N), rng.uniform(-40, 40, N)
], axis=1).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o_j, d_j = jnp.asarray(o), jnp.asarray(d)

base = spec_for_scene(scene.num_tris)
variants = {}
for name, dyn in (("static", False), ("dyn", True)):
    spec = dataclasses.replace(base, dyn_words=dyn)
    t0 = time.time()
    tr = make_pallas_tracer(scene, spec=spec)
    pack_t = time.time() - t0
    packed, n, _ = _pack_rays(o_j, d_j, jnp.full((N,), 1e4, jnp.float32),
                              spec.prog_rows)
    t0 = time.time()
    out = tr.closest_packed_plain(packed, 1e-3)
    jax.device_get(out[:1])
    compile_s = time.time() - t0
    print(f"{name}: pack {pack_t:.1f}s, first call (compile+run) "
          f"{compile_s:.1f}s", file=sys.stderr, flush=True)
    variants[name] = (tr, packed)

# interleaved steady-state
times = {k: [] for k in variants}
for r in range(reps):
    for name, (tr, packed) in variants.items():
        t0 = time.time()
        out = tr.closest_packed_plain(packed, 1e-3)
        jax.device_get(out[:1])
        times[name].append(time.time() - t0)
for name, ts in times.items():
    ms = [t * 1e3 for t in ts]
    print(f"{name}: {min(ms):.1f} min / {np.median(ms):.1f} med ms "
          f"({[f'{m:.0f}' for m in ms]})", file=sys.stderr, flush=True)

# verdict parity on device. Compare BIT PATTERNS (uint32 view), not floats:
# the idx column stores int32 bitcast to f32, and miss lanes hold -1 =
# 0xFFFFFFFF = NaN — np.array_equal on f32 reports bit-identical NaNs as
# unequal (the phantom "inequality" that kept dyn_words off for a while).
a = np.asarray(variants["static"][0].closest_packed_plain(
    variants["static"][1], 1e-3))
b = np.asarray(variants["dyn"][0].closest_packed_plain(
    variants["dyn"][1], 1e-3))
print(f"bit-equal on device: "
      f"{np.array_equal(a.view(np.uint32), b.view(np.uint32))}",
      file=sys.stderr)
