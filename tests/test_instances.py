"""Instance layer: re-pose a node without a full rebuild (VERDICT item 8).

The capability match is the reference's TLAS-only update on node movement
(createTopLevelAsGltf, hello_vulkan.cpp:1031-1047): moving one node must not
cost a full acceleration-structure rebuild, and the refitted structure must
trace identically to a from-scratch build of the moved geometry.
"""

import numpy as np
import jax.numpy as jnp

from vkrt_tpu.scene_instances import build_instanced, repose, repose_tracer
from vkrt_tpu.ops.trace import make_tracer
from vkrt_tpu.utils import gltf as gltf_mod


def _cube(center, half=1.0):
    c = np.asarray(center, np.float64)
    p = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32
    ) * half
    quads = [(4, 5, 6, 7), (1, 0, 3, 2), (5, 1, 2, 6),
             (0, 4, 7, 3), (7, 6, 2, 3), (0, 1, 5, 4)]
    idx = []
    for a, b, cq, d in quads:
        idx += [a, b, cq, a, cq, d]
    m = np.eye(4)
    m[:3, 3] = c
    return gltf_mod.GltfPrimitiveInstance(
        positions=p, indices=np.asarray(idx, np.uint32), normals=None,
        tangents=None, uvs=None, material=0, world_matrix=m,
    )


def _doc():
    mats = [gltf_mod.GltfMaterial(np.array([0.8, 0.8, 0.8, 1], np.float32),
                                  metallic_factor=0.0)]
    lights = [gltf_mod.GltfLight(np.array([0, 8, 0.0], np.float32),
                                 np.ones(3, np.float32), 60.0, 0)]
    return gltf_mod.GltfDocument(
        primitives=[_cube((-3, 0, 0)), _cube((3, 0, 0))],
        materials=mats, lights=lights, images=[],
    )


def _probe_rays(n=256):
    rng = np.random.default_rng(7)
    orig = np.zeros((n, 3), np.float32)
    orig[:, 2] = 12.0
    orig[:, 0] = rng.uniform(-7, 7, n)
    orig[:, 1] = rng.uniform(-3, 3, n)
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = -1.0
    return jnp.asarray(orig), jnp.asarray(d)


def _translate(x, y, z):
    m = np.eye(4)
    m[:3, 3] = (x, y, z)
    return m


def test_repose_matches_fresh_build():
    """repose() splices exactly what a from-scratch bake produces."""
    inst = build_instanced(_doc())
    inst2, moved = repose(inst, 1, _translate(3, 2.5, 0))

    doc_fresh = _doc()
    doc_fresh.primitives[1].world_matrix = _translate(3, 2.5, 0)
    fresh = build_instanced(doc_fresh).scene

    for name in ("tri_v0", "tri_e1", "tri_e2", "corner_normal",
                 "corner_tangent", "tri_uv_density"):
        np.testing.assert_allclose(
            np.asarray(getattr(inst2.scene, name)),
            np.asarray(getattr(fresh, name)), atol=1e-6,
            err_msg=name,
        )
    s, e = inst.prim_ranges[1]
    assert moved[s:e].all() and not moved[:s].any()


def test_repose_oracle_tracer_sees_move():
    inst = build_instanced(_doc())
    tr = make_tracer(inst.scene, "bruteforce")
    o, d = _probe_rays()
    before = tr.closest(o, d, 1e-3, 100.0)

    inst2, moved = repose(inst, 1, _translate(3, 0, -6))
    tr2 = repose_tracer(tr, inst2, moved)
    after = tr2.closest(o, d, 1e-3, 100.0)

    # the moved cube's front face goes z=1 -> z=-5; from origin z=12 the
    # hit distance becomes 17 (was 11)
    x = np.asarray(o)[:, 0]
    y = np.asarray(o)[:, 1]
    sel = (np.abs(x - 3) < 0.8) & (np.abs(y) < 0.8)
    assert np.asarray(before.hit)[sel].all()
    assert np.asarray(after.hit)[sel].all()
    np.testing.assert_allclose(np.asarray(before.t)[sel], 11.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(after.t)[sel], 17.0, atol=1e-3)
    # the static cube is untouched
    sel0 = (np.abs(x + 3) < 0.8) & (np.abs(y) < 0.8)
    np.testing.assert_allclose(
        np.asarray(after.t)[sel0], np.asarray(before.t)[sel0], atol=1e-6
    )


def test_refit_cluster_scene_traces_correctly():
    """PallasTracer refit: keeps clustering, retraces like the oracle."""
    from vkrt_tpu.ops.pallas.trace import make_pallas_tracer

    inst = build_instanced(_doc())
    pt = make_pallas_tracer(inst.scene, interpret=True)

    inst2, moved = repose(inst, 0, _translate(-3, -1, -4))
    pt2 = repose_tracer(pt, inst2, moved)
    bf = make_tracer(inst2.scene, "bruteforce")

    o, d = _probe_rays(128)
    ref = bf.closest(o, d, 1e-3, 100.0)
    got = pt2.closest(o, d, 1e-3, 100.0)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-5, atol=1e-5
    )


def test_refit_cost_scales_with_subset():
    """Refit touches only the moved node's clusters; the untouched packed
    rows and cluster boxes are preserved exactly (no full rebuild)."""
    from vkrt_tpu.ops.pallas.trace import CLUSTER, refit_cluster_scene, make_pallas_tracer

    inst = build_instanced(_doc())
    pt = make_pallas_tracer(inst.scene, interpret=True)
    cs = pt.cs

    inst2, moved = repose(inst, 1, _translate(3, 4, 0))
    sc2 = inst2.scene
    cs2 = refit_cluster_scene(
        cs, sc2.tri_v0, sc2.tri_e1, sc2.tri_e2, moved,
        attrs=(sc2.corner_normal, sc2.corner_tangent, sc2.corner_uv,
               sc2.tri_mat),
    )
    # same clustering (tri order untouched), same static tree shape
    np.testing.assert_array_equal(np.asarray(cs.tri_remap), np.asarray(cs2.tri_remap))
    assert cs.level_counts == cs2.level_counts

    remap = np.asarray(cs.tri_remap)
    slot_moved = (remap >= 0) & moved[np.maximum(remap, 0)]
    dirty = slot_moved.reshape(-1, CLUSTER).any(axis=1)
    n_c = cs.level_counts[-1]
    assert 0 < dirty.sum() < n_c  # a strict subset is dirty

    a_old = np.asarray(cs.cluster_aabb)[:n_c]
    a_new = np.asarray(cs2.cluster_aabb)[:n_c]
    clean = ~dirty[:n_c]
    np.testing.assert_array_equal(a_old[clean], a_new[clean])
    assert not np.array_equal(a_old[dirty[:n_c]], a_new[dirty[:n_c]])

    # attribute tables refresh with the pose: clean packed rows preserved
    # exactly, moved normals actually changed (rotation-free translate keeps
    # normals, so compare the position-dependent material/uv layout rows via
    # the geometry instead: attr rows for dirty clusters were rewritten)
    if cs.attr_cols:
        from vkrt_tpu.ops.pallas.trace import _dirty_rows
        rows_dirty = _dirty_rows(dirty, cs.spec)
        for old, new in zip(cs.attr_cols, cs2.attr_cols):
            np.testing.assert_array_equal(
                np.asarray(old)[~rows_dirty], np.asarray(new)[~rows_dirty]
            )

    # no-op refit returns the same object
    assert refit_cluster_scene(
        cs, inst.scene.tri_v0, inst.scene.tri_e1, inst.scene.tri_e2,
        np.zeros(len(moved), bool),
    ) is cs


def test_engine_set_node_transform():
    """End-to-end: move a node through the Engine and the image changes where
    (and only where) the node moved."""
    from vkrt_tpu.config import RenderSettings
    from vkrt_tpu.engine import Engine
    from vkrt_tpu.utils.camera import Camera

    inst = build_instanced(_doc())
    cam = Camera(eye=np.array([0, 0, 12.0]), center=np.zeros(3),
                 up=np.array([0, 1, 0.0]))
    e = Engine(inst, 48, 32, RenderSettings(rt_mode=1, samples=1, depth=1,
                                            backend="bruteforce"), cam)
    img_before = np.asarray(e.render_frame()).reshape(32, 48, 3)

    e.set_node_transform(1, _translate(3, 0, -40))  # move right cube far away
    assert e.frame == -1  # accumulation restarted
    img_after = np.asarray(e.render_frame()).reshape(32, 48, 3)

    # left half (static cube) identical; right half changed
    np.testing.assert_allclose(
        img_after[:, :20], img_before[:, :20], atol=1e-6
    )
    assert np.abs(img_after[:, 28:] - img_before[:, 28:]).max() > 1e-3


def test_engine_repose_no_retrace_with_pallas():
    """Pose animation viability: with the production Pallas tracer the
    frame step takes scene/tracer arrays as jit ARGUMENTS, so a re-pose
    must not retrace or recompile the step (the per-frame TLAS-update
    analog, hello_vulkan.cpp:1031-1047). A retrace would cost seconds per
    pose; refit cost alone scales with the moved subset."""
    from vkrt_tpu.config import RenderSettings
    from vkrt_tpu.engine import Engine
    from vkrt_tpu.utils.camera import Camera

    inst = build_instanced(_doc())
    cam = Camera(eye=np.array([0, 0, 12.0]), center=np.zeros(3),
                 up=np.array([0, 1, 0.0]))
    e = Engine(inst, 48, 32, RenderSettings(rt_mode=1, samples=1, depth=1,
                                            backend="pallas"), cam)
    assert e._pose_stable
    img_before = np.asarray(e.render_frame()).reshape(32, 48, 3)
    n_traces = e._step._cache_size()

    e.set_node_transform(1, _translate(3, 0, -40))
    img_after = np.asarray(e.render_frame()).reshape(32, 48, 3)
    assert e._step._cache_size() == n_traces  # no retrace on re-pose

    np.testing.assert_allclose(
        img_after[:, :20], img_before[:, :20], atol=1e-6
    )
    assert np.abs(img_after[:, 28:] - img_before[:, 28:]).max() > 1e-3
