import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from vkrt_tpu import scene as scene_mod
from vkrt_tpu.ops.pallas import trace as T

scene = scene_mod.make_city(grid=96)
pt = T.make_pallas_tracer(scene, interpret=True)
cs = pt.cs
n_c = cs.level_counts[-1]
ca = np.asarray(cs.cluster_aabb)[:n_c, :6].copy()
empty = ca[:, 0] >= 1e30
print("clusters:", n_c, "empty:", empty.sum())

def half_area(lo, hi):
    d = np.maximum(hi - lo, 0)
    return d[:,0]*d[:,1] + d[:,1]*d[:,2] + d[:,0]*d[:,2]

def super_area(order):
    a = ca[order]
    e = empty[order]
    lo = np.where(e[:,None], np.inf, a[:,:3]).reshape(-1,16,3).min(1)
    hi = np.where(e[:,None], -np.inf, a[:,3:]).reshape(-1,16,3).max(1)
    valid = np.isfinite(lo[:,0])
    return half_area(lo[valid], hi[valid]).sum()

cur = super_area(np.arange(n_c))
cen = 0.5*(ca[:,:3]+ca[:,3:])
cen[empty] = 1e30  # push empties to the end
q = ((cen - cen[~empty].min(0)) / (cen[~empty].max(0)-cen[~empty].min(0)+1e-9) * 1023).clip(0,1023).astype(np.int64)
m = np.zeros(n_c, np.int64)
for b in range(10):
    for j in range(3):
        m |= ((q[:,j]>>b)&1) << (3*b+j)
m[empty] = 1<<62
perm = np.argsort(m, kind="stable")
mor = super_area(perm)
print(f"sum super half-area: current {cur:.3e}  morton-regrouped {mor:.3e}  ratio {cur/mor:.2f}")
