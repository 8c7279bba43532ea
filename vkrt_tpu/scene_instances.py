"""Instance layer: cheap re-pose of scene nodes without a full AS rebuild.

The reference keeps per-node instances in the TLAS: moving a node re-records
only the top-level structure while every BLAS persists
(createTopLevelAsGltf, hello_vulkan.cpp:1031-1047). Here world transforms
are baked into the flat triangle soup at load (scene.py design note) — great
for per-ray cost, but re-posing a node would naively force a full
SAH rebuild + recluster + re-upload.

This module restores the capability the TPU-native way:

* ``InstancedScene`` keeps the parsed document (object-space geometry) plus
  each primitive's triangle range inside the flat soup.
* ``repose`` re-bakes ONLY the moved node's primitives (scene._bake_primitive
  — the same math as load) and splices the slices into the device arrays
  with ``.at[range].set``; everything else is untouched.
* The trace structure is *refitted*, not rebuilt: the SAH clustering is kept
  and only dirty clusters' packed columns + AABBs (plus the tiny upper vote
  tree) are recomputed (ops.pallas.trace.refit_cluster_scene) — the moral
  equivalent of the reference's TLAS-only update.
"""

from __future__ import annotations

import copy
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vkrt_tpu import scene as scene_mod
from vkrt_tpu.utils import gltf as gltf_mod

# Host mirrors kept per InstancedScene so a re-pose never round-trips
# device arrays back through the (high-latency) device link: refit math
# runs on these numpy copies, the device only receives the final spliced
# updates. Keys are SceneArrays field names.
_HOST_FIELDS = ("tri_v0", "tri_e1", "tri_e2", "corner_normal",
                "corner_tangent", "corner_uv", "tri_mat")


class InstancedScene(NamedTuple):
    scene: scene_mod.SceneArrays
    doc: gltf_mod.GltfDocument            # object-space source of truth
    prim_ranges: Tuple[Tuple[int, int], ...]  # per-primitive [start, end) tris
    host: Optional[dict] = None           # numpy mirrors (_HOST_FIELDS)

    @property
    def num_nodes(self) -> int:
        return len(self.prim_ranges)


def build_instanced(doc: gltf_mod.GltfDocument) -> InstancedScene:
    scene = scene_mod.build_scene(doc)
    ranges = []
    start = 0
    for prim in doc.primitives:
        n = prim.indices.size // 3
        ranges.append((start, start + n))
        start += n
    host = {k: np.asarray(getattr(scene, k)) for k in _HOST_FIELDS}
    return InstancedScene(scene=scene, doc=doc, prim_ranges=tuple(ranges),
                          host=host)


@jax.jit
def _splice_device(arrs, ups, s):
    """ONE jitted dispatch for all per-node scene-array splices (each
    .at[s:e].set was a separate device round trip before)."""
    out = []
    for a, u in zip(arrs, ups):
        idx = (s,) + (0,) * (a.ndim - 1)
        out.append(jax.lax.dynamic_update_slice(a, u.astype(a.dtype), idx))
    return tuple(out)


def load_scene_instanced(path: str) -> InstancedScene:
    return build_instanced(gltf_mod.parse_gltf(path))


def repose(inst: InstancedScene, prim_idx: int,
           world_matrix: np.ndarray):
    """Move one primitive/node. Returns (new InstancedScene, moved_mask).

    ``moved_mask`` is (T,) bool over the padded triangle array — feed it to
    ``refit_cluster_scene`` (or ignore it for oracle backends, which read the
    updated triangle arrays directly).
    """
    prim = copy.copy(inst.doc.primitives[prim_idx])
    prim.world_matrix = np.asarray(world_matrix, np.float64)
    new_prims = list(inst.doc.primitives)
    new_prims[prim_idx] = prim
    doc = copy.copy(inst.doc)
    doc.primitives = new_prims

    v0, v1, v2, cn, ctg, cuv, _ = scene_mod._bake_primitive(prim)
    s, e = inst.prim_ranges[prim_idx]
    assert e - s == len(v0)
    v0 = v0.astype(np.float32)
    e1 = (v1 - v0).astype(np.float32)
    e2 = (v2 - v0).astype(np.float32)
    density = scene_mod._uv_density(v0, v1, v2, cuv.astype(np.float32))

    sc = inst.scene
    names = ("tri_v0", "tri_e1", "tri_e2", "corner_normal",
             "corner_tangent", "tri_uv_density")
    fresh = (v0, e1, e2, cn, ctg, density)
    spliced = _splice_device(
        tuple(getattr(sc, k) for k in names),
        tuple(jnp.asarray(f) for f in fresh),
        jnp.int32(s),
    )
    sc = sc._replace(**dict(zip(names, spliced)))

    # keep the host mirrors in sync (copy-on-write: old InstancedScene
    # objects stay valid) so the tracer refit never pulls device arrays
    host = None
    if inst.host is not None:
        host = dict(inst.host)
        for k, f in zip(names[:5], fresh[:5]):
            a = host[k].copy()
            a[s:e] = np.asarray(f, a.dtype)
            host[k] = a
    moved = np.zeros(sc.tri_v0.shape[0], bool)
    moved[s:e] = True
    return (
        InstancedScene(scene=sc, doc=doc, prim_ranges=inst.prim_ranges,
                       host=host),
        moved,
    )


def repose_tracer(tracer, inst: InstancedScene, moved: np.ndarray):
    """Refit/rebind a tracer to a re-posed scene.

    PallasTracer -> cluster refit (cost scales with the moved subset);
    oracle Tracer -> rebind triangle arrays (brute force) or LBVH rebuild.
    """
    from vkrt_tpu.ops.alpha import AlphaTracer
    from vkrt_tpu.ops.pallas.trace import PallasTracer, refit_cluster_scene
    from vkrt_tpu.ops.trace import Tracer

    sc = inst.scene
    if isinstance(tracer, AlphaTracer):
        return AlphaTracer(
            scene=sc,
            inner=repose_tracer(tracer.inner, inst, moved),
            rounds=tracer.rounds,
            seed=tracer.seed,
        )
    if isinstance(tracer, PallasTracer):
        # prefer the host mirrors: the refit math then runs pull-free on
        # numpy and only the final fused scatter touches the device
        src = inst.host if inst.host is not None else {
            k: getattr(sc, k) for k in _HOST_FIELDS
        }
        cs = refit_cluster_scene(
            tracer.cs, src["tri_v0"], src["tri_e1"], src["tri_e2"], moved,
            attrs=(src["corner_normal"], src["corner_tangent"],
                   src["corner_uv"], src["tri_mat"]),
        )
        return tracer._replace(cs=cs)
    if isinstance(tracer, Tracer):
        if tracer.bvh is None:
            return tracer._replace(
                tri_v0=sc.tri_v0, tri_e1=sc.tri_e1, tri_e2=sc.tri_e2
            )
        from vkrt_tpu.bvh.lbvh import build_lbvh

        return Tracer(sc.tri_v0, sc.tri_e1, sc.tri_e2,
                      build_lbvh(sc.tri_v0, sc.tri_e1, sc.tri_e2))
    raise TypeError(f"unknown tracer type {type(tracer)}")
