"""Pallas trace kernels (interpret mode on CPU) vs the brute-force oracle,
plus the ray-sorting wrapper's permutation correctness."""

import numpy as np
import jax.numpy as jnp
import pytest

from vkrt_tpu.ops.pallas.trace import build_cluster_scene, make_pallas_tracer
from vkrt_tpu.ops.sort_rays import make_sorting_tracer, ray_sort_keys
from vkrt_tpu.ops.trace import make_tracer
from vkrt_tpu.scene import make_cornell_box, make_random_soup


@pytest.fixture(scope="module")
def box():
    return make_cornell_box()


def _rays(n, rng, spread=3.0):
    o = jnp.asarray(rng.normal(size=(n, 3)) * spread, jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def test_cluster_scene_structure(box):
    cs = build_cluster_scene(box.tri_v0, box.tri_e1, box.tri_e2)
    assert cs.n_clusters % 16 == 0
    # packed layout: lane dim fully used (128 slots per row)
    from vkrt_tpu.ops.pallas.trace import CLUSTER
    assert cs.tri_cols[0].shape == (cs.n_clusters * CLUSTER // 128, 128)
    # every real triangle appears exactly once in the remap prefix
    remap = np.asarray(cs.tri_remap)
    aabb = np.asarray(cs.cluster_aabb)
    # non-empty clusters have lo <= hi; empties are inverted (never hit)
    nonempty = aabb[:, 0] <= aabb[:, 3]
    assert nonempty.any()
    assert (aabb[nonempty, :3] <= aabb[nonempty, 3:6] + 1e-6).all()


def test_pallas_closest_matches_oracle(box, rng):
    pt = make_pallas_tracer(box, interpret=True)
    bf = make_tracer(box, "bruteforce")
    o, d = _rays(1000, rng)
    ref = bf.closest(o, d, 1e-3, 1e4)
    got = pt.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-4, atol=1e-5
    )
    # coplanar-face ties may resolve to a different triangle — but then the
    # two picks must be EQUAL-t (a genuine tie), and ties must stay rare
    same = np.asarray(got.tri)[h] == np.asarray(ref.tri)[h]
    np.testing.assert_allclose(
        np.asarray(got.t)[h][~same], np.asarray(ref.t)[h][~same],
        rtol=1e-5, atol=1e-6,
    )
    assert same.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(got.u)[h][same], np.asarray(ref.u)[h][same],
        rtol=1e-3, atol=1e-4,
    )


def test_anyhit_kill_mixed_pool(box, rng):
    """Fused pools mix closest lanes with NEGATIVE-t_lim first-hit-kills
    lanes (the kernel's any-hit mode): closest lanes must be unaffected
    and kill lanes' verdicts must equal the oracle's any-hit at |t_lim|."""
    pt = make_pallas_tracer(box, interpret=True)
    bf = make_tracer(box, "bruteforce")
    n = 512
    o, d = _rays(n, rng)
    lim = jnp.asarray(rng.uniform(0.3, 8.0, size=(n,)), jnp.float32)
    ref_c = bf.closest(o, d, 1e-3, 1e4)
    ref_a = bf.any(o, d, 1e-3, lim)
    mixed = jnp.concatenate([jnp.full((n,), 1e4, jnp.float32), -lim])
    got = pt.closest(jnp.concatenate([o, o]), jnp.concatenate([d, d]),
                     1e-3, 1e4, t_lim=mixed)
    np.testing.assert_array_equal(
        np.asarray(got.hit)[:n], np.asarray(ref_c.hit)
    )
    h = np.asarray(ref_c.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[:n][h], np.asarray(ref_c.t)[h],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(got.hit)[n:], np.asarray(ref_a))


def _variant_tracer(box, **overrides):
    """Tracer packed for a non-default TraceSpec, living in the SAME
    process as the default one (round-3 needed a re-imported module copy
    per env-var combination; TraceSpec made the constants per-tracer)."""
    import dataclasses

    from vkrt_tpu.ops.pallas.trace import DEFAULT_SPEC

    spec = dataclasses.replace(DEFAULT_SPEC, **overrides)
    return make_pallas_tracer(box, interpret=True, spec=spec)


@pytest.mark.parametrize("isect,keypack", [("bw", False), ("mt", True),
                                           ("bw", True)])
def test_gated_variants_match_default(box, rng, isect, keypack):
    """The env-gated kernel variants (Baldwin-Weber intersector, key-packed
    winner selection) must agree with the production kernel on every hit
    verdict, with differing triangles only as equal-t ties."""
    pt_ref = make_pallas_tracer(box, interpret=True)
    pt_var = _variant_tracer(box, isect=isect, keypack=keypack)
    o, d = _rays(600, rng)
    lim = jnp.asarray(rng.uniform(0.3, 8.0, size=(600,)), jnp.float32)
    ref = pt_ref.closest(o, d, 1e-3, 1e4)
    got = pt_var.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-5, atol=1e-5
    )
    same = np.asarray(got.tri)[h] == np.asarray(ref.tri)[h]
    assert same.mean() > 0.98
    np.testing.assert_allclose(
        np.asarray(got.u)[h][same], np.asarray(ref.u)[h][same],
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got.v)[h][same], np.asarray(ref.v)[h][same],
        rtol=2e-3, atol=2e-4,
    )
    # any-hit verdicts (first-hit-kills path) with per-ray limits
    np.testing.assert_array_equal(
        np.asarray(pt_var.any(o, d, 1e-3, lim)),
        np.asarray(pt_ref.any(o, d, 1e-3, lim)),
    )


def test_cluster_specs_coexist_in_process(box, rng):
    """Two tracers packed at different CLUSTER grains (64 and 128) must
    coexist in one process and agree on every verdict — the per-scene
    CLUSTER selection (128 on city-class geometry, 64 on Cornell-class)
    depends on this; round 3 could not ship it because the constants were
    import-time module globals."""
    pt64 = _variant_tracer(box, cluster=64)
    pt128 = _variant_tracer(box, cluster=128)
    assert pt64.spec.cluster == 64 and pt128.spec.cluster == 128
    assert pt64.cs.tri_cols[0].shape != pt128.cs.tri_cols[0].shape \
        or pt64.cs.n_clusters != pt128.cs.n_clusters
    o, d = _rays(600, rng)
    ref = pt64.closest(o, d, 1e-3, 1e4)
    got = pt128.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-5, atol=1e-6
    )
    # both resolve attrs through their own packed layouts
    if pt64.resolves_attrs and pt128.resolves_attrs:
        _, at64 = pt64.closest_surface(o, d, 1e-3, 1e4)
        _, at128 = pt128.closest_surface(o, d, 1e-3, 1e4)
        same = np.asarray(got.tri)[h] == np.asarray(ref.tri)[h]
        np.testing.assert_allclose(
            np.asarray(at128.nrm)[h][same],
            np.asarray(at64.nrm)[h][same], rtol=1e-5, atol=1e-6,
        )


def test_spec_for_scene_heuristic():
    """Big scenes pack at CLUSTER=128 (measured: +1.7% e2e and 1.5x faster
    compiles on the 143k-tri city) and scan super words dynamically
    (224k-tri first compile 89.9s static vs 11.6s dyn, steady state
    identical, bit-exact); small scenes keep 64 + the static unroll (2-3
    words). Explicit VKRT_CLUSTER / VKRT_DYN_WORDS env pins win."""
    from vkrt_tpu.ops.pallas.trace import spec_for_scene

    assert spec_for_scene(16_000).cluster == 64
    assert not spec_for_scene(16_000).dyn_words
    assert spec_for_scene(150_000).cluster == 128
    assert spec_for_scene(150_000).dyn_words


def test_group_gate_matches_default(box, rng):
    """VKRT_GROUP_GATE=1 (per-row group-AABB gating of the plain kernel's
    8-triangle-group loop) must be bit-identical on hit/tri and match t/u/v:
    gating only SKIPS groups whose boxes no ray of the row can reach under
    its current bound, so the winner per lane is unchanged."""
    pt_ref = make_pallas_tracer(box, interpret=True)
    pt_var = _variant_tracer(box, group_gate=True)
    o, d = _rays(600, rng)
    lim = jnp.asarray(rng.uniform(0.3, 8.0, size=(600,)), jnp.float32)
    # plain (non-resolve) closest: the gated code path
    ref = pt_ref.closest(o, d, 1e-3, 1e4)
    got = pt_var.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(got.u)[h], np.asarray(ref.u)[h], rtol=1e-6, atol=1e-7
    )
    # first-hit-kills any-hit with per-ray limits rides the same gated path
    np.testing.assert_array_equal(
        np.asarray(pt_var.any(o, d, 1e-3, lim)),
        np.asarray(pt_ref.any(o, d, 1e-3, lim)),
    )


def test_pure_any_matches_default(box, rng):
    """VKRT_PURE_ANY=1 (specialized visibility row path, measured a 1.9%
    on-device loss and default-gated OFF) must keep the exact hit verdicts
    of the default kernel on every .any pool, and the shade loop's split
    shadow pools (closest_packed_plain(pure_any=True)) must keep the idx
    sign its consumers read."""
    pt_ref = make_pallas_tracer(box, interpret=True)
    pt_var = _variant_tracer(box, pure_any=True)
    assert pt_var.spec.pure_any
    o, d = _rays(700, rng)
    lim = jnp.asarray(rng.uniform(0.3, 8.0, size=(700,)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(pt_var.any(o, d, 1e-3, lim)),
        np.asarray(pt_ref.any(o, d, 1e-3, lim)),
    )
    # packed shadow-pool form: only the idx column's sign is contractual
    from vkrt_tpu.ops.pallas.trace import _pack_rays

    packed, n, _ = _pack_rays(o, d, -lim, pt_var.spec.prog_rows)
    out_v = pt_var.closest_packed_plain(packed, 1e-3, pure_any=True)
    out_r = pt_ref.closest_packed_plain(packed, 1e-3)
    hit_v = (np.asarray(out_v[:, 128:256]).view(np.int32) >= 0)
    hit_r = (np.asarray(out_r[:, 128:256]).view(np.int32) >= 0)
    np.testing.assert_array_equal(
        hit_v.reshape(-1)[:n], hit_r.reshape(-1)[:n]
    )


def test_defer_resolve_matches_default(box, rng):
    """VKRT_DEFER_RESOLVE=1 (phase-B winner-identity attr interpolation,
    gated per improved row-visit) must be BIT-identical to the default
    per-visit resolve: the picked candidate interpolates with the same
    u, v and delta-form corner values in the same FMA order, and unpicked
    candidates are zeroed by the same pick-sum."""
    pt_ref = make_pallas_tracer(box, interpret=True)
    pt_var = _variant_tracer(box, defer_resolve=True)
    assert pt_ref.resolves_attrs and pt_var.resolves_attrs
    o, d = _rays(800, rng)
    hi_r, at_r = pt_ref.closest_surface(o, d, 1e-3, 1e4)
    hi_v, at_v = pt_var.closest_surface(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(hi_v.hit), np.asarray(hi_r.hit))
    np.testing.assert_array_equal(np.asarray(hi_v.tri), np.asarray(hi_r.tri))
    np.testing.assert_array_equal(np.asarray(hi_v.t), np.asarray(hi_r.t))
    np.testing.assert_array_equal(np.asarray(hi_v.u), np.asarray(hi_r.u))
    for fld in at_r._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(at_v, fld)), np.asarray(getattr(at_r, fld)),
            err_msg=fld,
        )
    # fused closest+any pools (per-lane negative limits) ride the same
    # deferred path: killed lanes keep their first hit's attrs
    lim = jnp.asarray(rng.uniform(0.5, 8.0, size=(800,)), jnp.float32)
    lim = jnp.where(jnp.arange(800) % 2 == 0, -lim, lim)
    hi_r2, at_r2 = pt_ref.closest_surface(o, d, 1e-3, 1e4, t_lim=lim)
    hi_v2, at_v2 = pt_var.closest_surface(o, d, 1e-3, 1e4, t_lim=lim)
    np.testing.assert_array_equal(
        np.asarray(hi_v2.hit), np.asarray(hi_r2.hit)
    )
    for fld in at_r2._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(at_v2, fld)),
            np.asarray(getattr(at_r2, fld)), err_msg=fld,
        )


def test_pallas_any_matches_oracle(box, rng):
    pt = make_pallas_tracer(box, interpret=True)
    bf = make_tracer(box, "bruteforce")
    o, d = _rays(1000, rng)
    for tmax in (0.5, 3.0, 1e4):
        ref = bf.any(o, d, 1e-3, tmax)
        got = pt.any(o, d, 1e-3, tmax)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_degenerate_rays_miss(box):
    pt = make_pallas_tracer(box, interpret=True)
    o = jnp.zeros((1024, 3))
    d = jnp.zeros((1024, 3))
    hi = pt.closest(o, d, 1e-3, 1e4)
    assert not np.asarray(hi.hit).any()
    assert not np.asarray(pt.any(o, d, 1e-3, 0.0)).any()


def test_pallas_random_soup(rng):
    soup = make_random_soup(300, seed=3)
    pt = make_pallas_tracer(soup, interpret=True)
    bf = make_tracer(soup, "bruteforce")
    o, d = _rays(900, rng, spread=1.5)
    ref = bf.closest(o, d, 1e-3, 1e4)
    got = pt.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-4, atol=1e-5
    )


def test_in_kernel_attr_resolve_matches_gather(box, rng):
    """closest_surface's in-kernel interpolated attributes must match the
    XLA gather path (surface_at_hit) on every hit lane: same triangle's
    corners, same barycentrics, delta-form interpolation differs only by
    fp rounding."""
    from vkrt_tpu.models.shading import surface_at_hit, surface_from_attrs

    pt = make_pallas_tracer(box, interpret=True)
    assert pt.resolves_attrs
    o, d = _rays(1000, rng)
    hi, at = pt.closest_surface(o, d, 1e-3, 1e4)
    # the same kernel's plain path must agree on the hit payload (keypack
    # plain kernels tie-break sub-8-ULP-equal t differently — a differing
    # triangle is acceptable only as an equal-t tie, like coplanar faces)
    hi_plain = pt.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(hi.hit), np.asarray(hi_plain.hit))
    hh = np.asarray(hi.hit)
    tie = np.asarray(hi.tri) != np.asarray(hi_plain.tri)
    assert (tie & hh).mean() < 0.01
    np.testing.assert_allclose(
        np.asarray(hi.t)[hh & tie], np.asarray(hi_plain.t)[hh & tie],
        rtol=1e-5, atol=1e-6,
    )

    surf_k = surface_from_attrs(box, at)
    surf_g = surface_at_hit(box, jnp.maximum(hi.tri, 0), hi.u, hi.v, d)
    h = np.asarray(hi.hit)
    assert h.any()
    for name in ("world_pos", "shading_normal", "geo_normal", "base_color",
                 "tangent", "binormal", "uv"):
        np.testing.assert_allclose(
            np.asarray(getattr(surf_k, name))[h],
            np.asarray(getattr(surf_g, name))[h],
            rtol=1e-4, atol=2e-5, err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(surf_k.mat_id)[h], np.asarray(surf_g.mat_id)[h]
    )
    # miss lanes carry zeros (finite; downstream is epsilon-guarded)
    if (~h).any():
        assert np.isfinite(np.asarray(surf_k.world_pos)[~h]).all()
        np.testing.assert_array_equal(np.asarray(at.pos)[~h], 0.0)


def test_attr_budget_gate():
    """Over-budget scenes must fall back to gather shading (attr_cols=())."""
    import dataclasses

    import vkrt_tpu.ops.pallas.trace as tr

    soup = make_random_soup(300, seed=3)
    spec = dataclasses.replace(tr.DEFAULT_SPEC, attr_vmem_budget=1024)
    pt = tr.make_pallas_tracer(soup, interpret=True, spec=spec)
    assert not pt.resolves_attrs
    assert pt.cs.attr_cols == ()


def test_empty_boxes_cannot_vote(rng):
    """Pin the round-2 pad-box invariant: device AABB tables must never
    contain inverted (+-inf) boxes — an inverted box passes the slab test
    for EVERY ray (per-axis min(t0,t1)=-inf, max=+inf), which silently cost
    ~97% of round-1 kernel time on zeroed padding triangles. Empties must
    be point-encoded at 1e30, which no real ray can hit."""
    soup = make_random_soup(900, seed=5)  # forces cluster padding
    cs = build_cluster_scene(soup.tri_v0, soup.tri_e1, soup.tri_e2)
    for lvl in list(cs.level_aabb) + [cs.sup_oct_aabb]:
        a = np.asarray(lvl)[:, :6]
        assert np.isfinite(a).all(), "inf in device AABB table"
        empty = a[:, 0] >= 1e29
        assert (a[:, 0] <= a[:, 3] + 1e-6).all(), "inverted box in table"
        # numpy slab test: random rays vs every empty row -> zero passes
        if empty.any():
            o = rng.normal(size=(64, 3)).astype(np.float32) * 3
            d = rng.normal(size=(64, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
            box = a[empty]
            t0 = (box[None, :, 0:3] - o[:, None]) * inv[:, None]
            t1 = (box[None, :, 3:6] - o[:, None]) * inv[:, None]
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            assert not (np.maximum(tn, 1e-3) <= np.minimum(tf, 3e38)).any(), \
                "an empty box votes in"


def test_pallas_multilevel_scan(rng):
    """A scene big enough for a 3-deep level stack (>256 clusters) exercises
    the super-word scan AND the top-level early-out block cull — the paths a
    small fixture (L=1) never reaches."""
    from vkrt_tpu.ops.pallas.trace import CLUSTER
    soup = make_random_soup(270 * CLUSTER, seed=11)  # >256 clusters at any size
    cs = build_cluster_scene(soup.tri_v0, soup.tri_e1, soup.tri_e2)
    assert len(cs.level_counts) >= 3, cs.level_counts
    pt = make_pallas_tracer(soup, interpret=True)
    bf = make_tracer(soup, "bruteforce")
    o, d = _rays(256, rng, spread=1.5)
    ref = bf.closest(o, d, 1e-3, 1e4)
    got = pt.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-4, atol=1e-5
    )
    # parked rays (the fused-batch dead-lane convention) must all miss and
    # take the early-out path
    o_dead = jnp.full((256, 3), 1e30, jnp.float32)
    d_dead = jnp.zeros((256, 3), jnp.float32)
    assert not np.asarray(
        pt.closest(o_dead, d_dead, 1e-3, 1e4,
                   t_lim=jnp.full((256,), -1.0, jnp.float32)).hit
    ).any()


def test_sorting_tracer_identical_results(box, rng):
    bf = make_tracer(box, "bruteforce")
    st = make_sorting_tracer(bf, box)
    o, d = _rays(2000, rng)
    ref = bf.closest(o, d, 1e-3, 1e4)
    got = st.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t))
    ref_any = bf.any(o, d, 1e-3, 2.0)
    got_any = st.any(o, d, 1e-3, 2.0)
    np.testing.assert_array_equal(np.asarray(got_any), np.asarray(ref_any))


def test_ray_sort_keys_group_by_octant_and_cell(rng):
    lo = jnp.zeros(3)
    hi = jnp.ones(3) * 10
    o = jnp.asarray([[1.0, 1.0, 1.0], [1.01, 1.0, 1.0], [9.0, 9.0, 9.0]])
    d = jnp.asarray([[1.0, 0.0, 0.1], [1.0, 0.0, 0.1], [1.0, 0.0, 0.1]])
    k = np.asarray(ray_sort_keys(o, d, lo, hi))
    assert k[0] == k[1]  # same cell, same octant
    assert k[0] != k[2]  # far cell differs
    d2 = jnp.asarray([[-1.0, 0.0, 0.1]])
    k2 = np.asarray(ray_sort_keys(o[:1], d2, lo, hi))
    assert k2[0] != k[0]  # octant differs


def test_dyn_words_matches_default(rng):
    """spec.dyn_words (dynamic fori over super words instead of the static
    unroll — the program-size/compile-time lever for city-class scenes)
    must be BIT-identical to the static scan: same words voted in the same
    near-to-far order, state carried through out_ref either way."""
    from vkrt_tpu.scene import load_cornell

    scene = load_cornell()  # 16.7k tris -> 17 supers -> 2 words at C=64
    pt_ref = make_pallas_tracer(scene, interpret=True)
    pt_var = _variant_tracer(scene, dyn_words=True)
    assert pt_var.spec.dyn_words
    # the dynamic word loop must actually run >1 iteration
    assert -(-pt_ref.cs.level_counts[-2] // 16) > 1
    o, d = _rays(256, rng)
    lim = jnp.asarray(rng.uniform(0.3, 8.0, size=(256,)), jnp.float32)
    ref = pt_ref.closest(o, d, 1e-3, 1e4)
    got = pt_var.closest(o, d, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.u), np.asarray(ref.u))
    np.testing.assert_array_equal(
        np.asarray(pt_var.any(o, d, 1e-3, lim)),
        np.asarray(pt_ref.any(o, d, 1e-3, lim)),
    )
    # resolve path too (attr interpolation inside the dynamic loop)
    if pt_ref.resolves_attrs and pt_var.resolves_attrs:
        _, at_r = pt_ref.closest_surface(o, d, 1e-3, 1e4)
        _, at_v = pt_var.closest_surface(o, d, 1e-3, 1e4)
        np.testing.assert_array_equal(
            np.asarray(at_v.nrm), np.asarray(at_r.nrm)
        )
        np.testing.assert_array_equal(np.asarray(at_v.uv), np.asarray(at_r.uv))


def test_small_pool_under_wide_prog_rows(box, rng):
    """Regression for ADVICE r4 high / the round-4 all-NaN suite: a pool
    padded to 8-row blocks fed to a block_rows=16 tracer used to launch a
    ZERO-program grid (chunk=8, 8//16=0) and return uninitialized rows.
    _chunk_rows now rounds the chunk up to a prog_rows multiple, so every
    ray is traced regardless of the caller's padding granularity."""
    from vkrt_tpu.ops.pallas.trace import _pack_rays

    pt8 = _variant_tracer(box, block_rows=8)
    pt16 = _variant_tracer(box, block_rows=16)
    n = 700  # 6 rows -> pads to 8 under PROG_ROWS=8
    o, d = _rays(n, rng)
    lim = jnp.full((n,), 1e4, jnp.float32)
    # pack at the SHADE kernel's granularity (8 rows), trace with BOTH specs
    packed, _, rows = _pack_rays(o, d, lim, 8)
    assert rows == 8
    out16 = pt16.closest_packed_plain(packed, 1e-3)
    out8 = pt8.closest_packed_plain(packed, 1e-3)
    a16 = np.asarray(out16)
    assert np.isfinite(a16[:, :128]).all(), "untraced rows leaked through"
    idx16 = a16[:, 128:256].view(np.int32).reshape(-1)[:n]
    idx8 = np.asarray(out8)[:, 128:256].view(np.int32).reshape(-1)[:n]
    np.testing.assert_array_equal(idx16 >= 0, idx8 >= 0)
