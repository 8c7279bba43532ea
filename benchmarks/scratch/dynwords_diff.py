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


def packed_compare(scene, n=921_600):
    """Raw packed-output comparison at pool size (the dynwords_ab check)."""
    import dataclasses as dc
    import jax.numpy as jnp

    rng2 = np.random.default_rng(7)
    o2 = np.stack([
        rng2.uniform(-40, 40, n), rng2.uniform(0.5, 6.0, n),
        rng2.uniform(-40, 40, n)
    ], axis=1).astype(np.float32)
    d2 = rng2.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    base2 = spec_for_scene(scene.num_tris)
    outs2 = {}
    for nm, dyn in (("static", False), ("dyn", True)):
        tr = make_pallas_tracer(scene, spec=dc.replace(base2, dyn_words=dyn))
        packed, nn, _ = _pack_rays(
            jnp.asarray(o2), jnp.asarray(d2),
            jnp.full((n,), 1e4, jnp.float32), tr.spec.prog_rows)
        outs2[nm] = np.asarray(tr.closest_packed_plain(packed, 1e-3))
    a2, b2 = outs2["static"], outs2["dyn"]
    # bit-pattern comparison: the idx column is int32 bitcast to f32, and
    # miss-lane idx = -1 = 0xFFFFFFFF = NaN, which float equality reports
    # as unequal even when bit-identical (this phantom was the one
    # "inequality" dynwords_ab ever saw)
    bit_equal = np.array_equal(a2.view(np.uint32), b2.view(np.uint32))
    print(f"packed bit-equal: {bit_equal} "
          f"(float-equal: {np.array_equal(a2, b2)} — False here just means "
          f"NaN-pattern idx lanes)")
    if not bit_equal:
        for c, nm in enumerate(("t", "idx", "u", "v")):
            col_a = a2[:, c * LANES:(c + 1) * LANES].view(np.uint32)
            col_b = b2[:, c * LANES:(c + 1) * LANES].view(np.uint32)
            neq = col_a != col_b
            print(f"  col {nm}: {neq.sum()} mismatched elems "
                  f"({neq.any(axis=1).sum()} rows)")
        neq_t = a2[:, :LANES] != b2[:, :LANES]
        if neq_t.any():
            ia = a2[:, LANES:2*LANES].view(np.int32)[neq_t]
            ib = b2[:, LANES:2*LANES].view(np.int32)[neq_t]
            ta, tb = a2[:, :LANES][neq_t], b2[:, :LANES][neq_t]
            rel = np.abs(ta - tb) / np.maximum(np.abs(ta), 1e-20)
            print(f"  t rel delta max {rel.max():.3e}, winners equal: "
                  f"{(ia == ib).mean():.4f}")
        # classify idx-only mismatches: are they all on MISS lanes (t at the
        # 1e4 limit => idx is dead payload the verdict APIs never read)?
        neq_i = (a2[:, LANES:2*LANES].view(np.int32)
                 != b2[:, LANES:2*LANES].view(np.int32))
        if neq_i.any():
            t_at = a2[:, :LANES][neq_i]
            print(f"  idx mismatches on miss lanes (t>=1e4): "
                  f"{(t_at >= 1e4).sum()}/{neq_i.sum()}")
            ia = a2[:, LANES:2*LANES].view(np.int32)[neq_i]
            ib = b2[:, LANES:2*LANES].view(np.int32)[neq_i]
            print(f"  static idx range [{ia.min()},{ia.max()}] "
                  f"dyn idx range [{ib.min()},{ib.max()}]")
            print(f"  static idx<0: {(ia < 0).mean():.3f}  "
                  f"dyn idx<0: {(ib < 0).mean():.3f}")
            hit_neq = neq_i & (a2[:, :LANES] < 1e4)
            if hit_neq.any():
                # real winner disagreement on a HIT lane: dump a few
                rows, lanes = np.nonzero(hit_neq)
                for r, l in list(zip(rows, lanes))[:5]:
                    print(f"    HIT-lane diff row {r} lane {l}: "
                          f"t {a2[r, l]:.6g}/{b2[r, l]:.6g} idx "
                          f"{a2[r, LANES+l:LANES+l+1].view(np.int32)[0]}/"
                          f"{b2[r, LANES+l:LANES+l+1].view(np.int32)[0]}")


if len(sys.argv) > 2 and sys.argv[2] == "packed":
    packed_compare(scene)
