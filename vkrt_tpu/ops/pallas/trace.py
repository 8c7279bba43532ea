"""Fused Pallas trace kernel: bit-voted two-level cluster tracing.

The TPU-native replacement for hardware BVH traversal where it matters — the
hot ``traceRayEXT`` loop. Design (see SURVEY.md §7 hard-parts; refined in
round 2 after per-stage ablation):

* Triangles are SAH-ordered and packed into **clusters of 64** (contiguous
  SAH-subtree ranges, so clusters are spatially tight). Clusters group by 16
  under **super AABBs** whose boxes live as plain VMEM tables; triangle SoA
  components sit in VMEM as row-major packed (T_pad/128, 128) blocks.
* One kernel program processes a **block of 1024 rays** (an (8, 128) tile
  per ray component; the engine feeds 32x32 pixel tiles so a block is a
  compact frustum). The block takes slab-test **votes** over 16 boxes at a
  time: per-lane hit bits OR-fold into ONE scalar bitmask (per-box
  ``jnp.any`` syncs cost ~400 cycles and would dominate), then only set
  bits are visited (popcount/ctz iteration, no branches).
* Traversal is deliberately SHALLOW: a static unrolled scan over super
  words, one dynamic loop over voted supers, one over voted clusters.
  Round 2 measured the "obvious" improvement — a full 16-ary tree with
  per-octant near-to-far child ordering — at 31x SLOWER (0.16 vs 5.1
  Mrays/s, benchmarks/scratch/variants.py) despite visiting fewer boxes:
  Mosaic compiles nested dynamic fori loops with scalar-dependent VMEM
  reads into code whose per-iteration overhead dwarfs the saved slab
  tests (and compile time explodes to tens of minutes). Static unrolls +
  shallow dynamic nesting is the shape this hardware rewards.
* Surviving clusters run an all-vector Möller-Trumbore: triangle components
  broadcast as (8, 1) group columns against (1, 128) ray rows — 1024
  ray-triangle pairs per VPU op, no per-lane gathers.
* **Closest-hit and any-hit are one kernel**: every lane carries its own
  ``t`` limit (shadow rays pass ``lightDist``; primary rays pass tMax), a
  hit is "index >= 0 at return", and a shadow lane's first hit tightens its
  limit to the hit distance so later votes stop feeding it. This halves the
  per-bounce program count vs separate closest/any kernels and lets callers
  batch shadow + bounce rays into one launch.

Rays per component are laid out (n_blocks*8, 128) so the grid BlockSpec
slices one (8, 128) tile per program — fully pipelined by Mosaic.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Triangles per cluster — the culling granularity / MT-work-per-visit
# tradeoff. 64 = half a packed 128-lane row; 32 = a quarter row (halves the
# Möller-Trumbore work per voted cluster at ~2x the cluster count). Env
# override for measurement sweeps (benchmarks/scratch).
CLUSTER = int(os.environ.get("VKRT_CLUSTER", "64"))
assert CLUSTER in (32, 64, 128), CLUSTER
GROUP = 8             # triangles per inner vector step (sublane dim)
FANOUT = 16           # tree fanout = boxes per vote word
# ray rows per program -> BLOCK_ROWS*128 rays per block. Bigger blocks
# amortize per-program overhead but widen each block's cluster-footprint
# union; measured on the e2e bench: 8 -> 4.96 Mrays/s, 16 -> 4.53, 4 fails
# Mosaic's sublane tiling. Env override for measurement sweeps.
BLOCK_ROWS = int(os.environ.get("VKRT_BLOCK_ROWS", "8"))
assert BLOCK_ROWS in (8, 16, 32), BLOCK_ROWS
PROG_ROWS = BLOCK_ROWS
LANES = 128
INF = 3e38  # python float: jnp scalars would be captured as kernel constants
_DET_EPS = 1e-9

# Ray-triangle intersector. "mt" = Möller-Trumbore on (v0, e1, e2); "bw" =
# Baldwin-Weber precomputed world->barycentric transform (n|nd, pu|pud,
# pv|pvd — 12 floats/tri vs 9). BW trades +3 component tables for ~1.5x
# fewer VPU ops per ray-triangle pair (no cross products at trace time: one
# plane solve + two affine barycentric evaluations), and the hit POINT falls
# out as o + t*d so the resolve path's position interpolation is free. The
# per-visit MT math is the measured bound of the incoherent-pool trace (the
# city frame's dominant stage), so op count there is the frame time.
ISECT = os.environ.get("VKRT_ISECT", "mt")
assert ISECT in ("mt", "bw"), ISECT
N_TRI_COLS = 12 if ISECT == "bw" else 9

# Key-packed winner selection for the PLAIN (non-resolve) kernel: per
# 8-triangle group, pack the candidate's member id into the low 3 mantissa
# bits of its t (bitcast int32 compare — order-preserving for positive
# floats) and merge ONE key instead of separate t/u/v/idx rows with
# iota-pick machinery (~11 fewer vector ops per group-row-visit, ~20% of
# the visit cost). Reported t is then up to 8 ULP above true t; u/v are
# recomputed OUTSIDE the kernel from the winner's gathered components
# (shadow pools never read them at all). Env-gated pending measurement.
KEYPACK = os.environ.get("VKRT_KEYPACK", "0") == "1"

# --- in-kernel attribute resolve -------------------------------------------
# 26 packed per-corner attribute tables, delta form (a0, a1-a0, a2-a0) so a
# candidate interpolates with 2 FMAs per component: value = a0 + u*d1 + v*d2.
# Table order:
#   0-2  n0 xyz      3-5  dn1 xyz     6-8  dn2 xyz     (corner normals)
#   9-11 t0 xyz     12-14 dt1 xyz    15-17 dt2 xyz     (corner tangents xyz)
#   18   tw (corner-0 tangent handedness w)
#   19-21 u0 du1 du2  22-24 v0 dv1 dv2                 (corner uvs)
#   25   mat (per-triangle material id as f32)
ATTR_TABLES = 26
# Kernel output block, in LANES-wide column slots:
#   plain:   [t | idx-bits | u | v]                        (4 cols)
#   resolve: + [nrm xyz | tan xyz | tw | uu | vv | mat]    (14 cols)
# (the hit POSITION is NOT carried: it is o + t*d, reconstructed by the
# consumer from the ray it already has — carrying it cost 3 interpolated
# ext values per candidate per visit, ~18 vector ops/group)
OUT_COLS_PLAIN = 4
OUT_COLS_RESOLVE = 14
# Total VMEM the kernel's resident tables may claim before attribute resolve
# is disabled (geometry cols + attr cols + AABB/order tables must share the
# ~16 MB/core VMEM with the pipelined ray/out blocks). The 143k-tri city
# (T_pad ~221k slots -> 9+26 tables ~31 MB) falls back to gather shading.
ATTR_VMEM_BUDGET = int(os.environ.get("VKRT_ATTR_BUDGET", str(12 * 2**20)))

# Row-gated cluster work: the cluster vote keeps a per-ROW bitmask (one
# lane-rotation pass before the sublane fold, stored to a VMEM scratch) and
# each (8,128)-row's Möller-Trumbore work runs under pl.when on its row bit.
# A block whose rays diverge (incoherent bounce pools) or die (fused batches)
# then pays per-visit cost proportional to the rows that can actually
# improve, instead of all BLOCK_ROWS — the sub-block granularity VERDICT
# round-2 item 2(a) asks for, with 8 scalar VMEM reads + branches per visit
# as the only overhead.
ROW_GATE = os.environ.get("VKRT_ROW_GATE", "1") == "1"

# Incremental near-to-far cluster votes: vote each voted super's 16
# clusters in TWO 8-slot halves along the block-dominant-octant distance
# permutation (the level_order tables), re-reading the tightened t between
# halves — near hits collapse the far half's votes before they are taken.
# Costs one extra vector->scalar sync + dynamic 4-bit slot decode per
# super; pays on incoherent pools where visits approach whole-super
# granularity (city d=1 bounce pools: 510 visits/block measured).
INC_VOTE = os.environ.get("VKRT_INC_VOTE", "0") == "1"

# Pure any-hit kernel specialization: pools where EVERY live lane is a
# first-hit-kills visibility query (PallasTracer.any — the hybrid shadow/AO
# batch, rgen:81-169) only ever read "idx >= 0", so the per-group winner
# machinery (is_min/win_sub/pick, u/v merge+stores) is dead weight; the
# specialized row path keeps the full intersection test but merges just a
# hit bit. Fused closest+any pools cannot use this (mixed lanes).
# MEASURED A 1.9% LOSS on the hybrid-city interleaved A/B (1143.6 vs
# 1122.1 ms) despite strictly fewer ops per group — the same Mosaic
# codegen lesson as BW/keypack/group-gate: the visit loop is not bound by
# the winner-merge ops the specialization removes. Default off.
PURE_ANY = os.environ.get("VKRT_PURE_ANY", "0") == "1"

# Deferred winner resolve (resolve kernels): the attr interpolation
# (13 ext values x 2-FMA + pick-sum, ~1.7x the intersection math) currently
# runs for EVERY group of EVERY visit even though a row's winner changes
# only a handful of times per launch (~2-4 of ~35 visits on Cornell bounce
# pools). Deferred mode runs phase A as the PLAIN merge (t/idx/u/v) while
# OR-accumulating a per-row improved mask, then a pl.when-gated phase B per
# improved row-visit resolves attributes by exact winner identity
# (idx == base + member) using the already-merged u/v — no intersection
# recompute, no per-visit attr-tile extraction, bit-identical ext values
# (the picked candidate interpolates with the same u,v,a,d1,d2 in the same
# FMA order; unpicked candidates are zeroed by the same pick-sum).
# Cost: 7 lane rolls + 1 scalar read per live row-visit (the rowvote fold
# pattern). Env-gated pending an interleaved on-device A/B.
DEFER_RESOLVE = os.environ.get("VKRT_DEFER_RESOLVE", "0") == "1"

# Dynamic super-word scan: run the outer scan over super words as ONE
# lax.fori_loop instead of a static unroll. The kernel body (16 slab votes +
# cluster vote + cluster_work) is then emitted ONCE instead of n_words
# times — on city-class scenes (14-37 words) the unroll dominates program
# size and the tunnel compile (~500s first compile on the city hybrid,
# STATUS r3 agenda item 4). The loop carries nothing (state lives in
# out_ref/scratch, same as the set-bit loops), so the added per-word
# dynamic-loop overhead is one scalar bound check per word — amortized over
# a whole word's votes+visits, unlike the round-2 per-visit dynamic tree
# that lost 65x. Parity-tested bit-exact against the static scan (interpret
# AND device — the one "inequality" ever seen was a NaN-blind harness bug:
# miss-lane idx = -1 bitcast to f32 is a NaN, and np.array_equal on the
# packed f32 block reports bit-identical NaNs as unequal; uint32-view
# comparison shows zero mismatches). Default ON for big scenes via
# spec_for_scene (measured: 224k-tri city first compile 89.9s static vs
# 11.6s dyn, steady state identical at 605 ms); this env knob pins a
# process-wide override for sweeps.
DYN_WORDS = os.environ.get("VKRT_DYN_WORDS", "0") == "1"

# Group gating (plain kernels): per visited cluster, one vector pass votes
# every ROW's rays against the cluster's per-8-triangle-GROUP AABBs (the
# same zero-sync lane-fold+scratch trick as ROW_GATE, one level finer), and
# each live row then runs only the groups its rays can actually reach —
# pl.when per group on the row's scratch word. Upfront cost ~_GPC slab
# votes + 7 lane rolls per visit; saving = the skipped groups' intersection
# math. Pays when a row's rays cross a cluster's box but only graze a few
# of its 8-triangle sub-ranges (SAH order makes groups spatially tight
# sub-runs). Env-gated pending an interleaved on-device A/B.
GROUP_GATE = os.environ.get("VKRT_GROUP_GATE", "0") == "1"


@dataclasses.dataclass(frozen=True)
class TraceSpec:
    """Per-tracer kernel configuration.

    Round 3 kept these as import-time module globals, which pinned one
    process to one configuration — the measured per-scene CLUSTER optimum
    (128 on city-class geometry: +1.7% and 1.5x faster compiles; 64 on
    Cornell-class: 128 was a 17% loss) could not ship, and every A/B needed
    a re-imported module copy. A TraceSpec instead rides on the
    ClusterScene it packed (registered as a STATIC pytree node, so it is
    jit-cache-key data, not a traced leaf): two tracers with different
    specs coexist in one process and each launch compiles for its own
    constants.

    The module-level env globals above remain the DEFAULTS (so
    ``VKRT_CLUSTER=128 python ...`` still pins a process-wide choice for
    sweep harnesses), but nothing below reads them directly.
    """

    cluster: int = CLUSTER          # triangles per cluster (culling grain)
    block_rows: int = BLOCK_ROWS    # ray rows per kernel program
    isect: str = ISECT              # "mt" | "bw" ray-triangle intersector
    keypack: bool = KEYPACK         # packed-key winner merge (plain kernels)
    row_gate: bool = ROW_GATE       # per-row cluster-work gating
    inc_vote: bool = INC_VOTE       # incremental near-to-far cluster votes
    pure_any: bool = PURE_ANY       # pure any-hit row specialization
    defer_resolve: bool = DEFER_RESOLVE  # two-phase attribute resolve
    group_gate: bool = GROUP_GATE   # per-8-triangle-group vote gating
    dyn_words: bool = DYN_WORDS     # dynamic (fori) super-word scan
    attr_vmem_budget: int = ATTR_VMEM_BUDGET

    def __post_init__(self):
        assert self.cluster in (32, 64, 128), self.cluster
        assert self.block_rows in (8, 16, 32), self.block_rows
        assert self.isect in ("mt", "bw"), self.isect

    # --- derived constants ---------------------------------------------
    @property
    def n_tri_cols(self) -> int:
        return 12 if self.isect == "bw" else 9

    @property
    def prog_rows(self) -> int:
        return self.block_rows

    @property
    def pp(self) -> bool:
        """Pre-pivoted component layout (see _layout_col)."""
        return self.cluster in (64, 128)

    @property
    def gpc(self) -> int:
        """MT groups per cluster (lanes per cluster in pivoted layout)."""
        return self.cluster // GROUP

    @property
    def cpt(self) -> int:
        """Clusters per (8,128) tile in the pivoted layout."""
        return LANES // self.gpc


# Static node: flattens to zero leaves with itself as treedef aux data, so a
# ClusterScene carrying its spec stays a valid jit argument and the spec
# participates in the compilation cache key.
jax.tree_util.register_static(TraceSpec)

DEFAULT_SPEC = TraceSpec()

# City/Sponza-class triangle count at which CLUSTER=128 measured faster
# (interleaved A/B, STATUS r3: city d4 +1.7% e2e, 1.5x faster compile)
# while Cornell-class geometry measured it a 17% loss.
BIG_SCENE_TRIS = 100_000


# Whether the env PINNED these knobs, captured at IMPORT time like the
# values themselves: envsweep-style harnesses exec module copies under a
# temporary env and restore it afterwards, so a call-time os.environ check
# in spec_for_scene would silently un-pin their variants.
_CLUSTER_PINNED = "VKRT_CLUSTER" in os.environ
_DYN_WORDS_PINNED = "VKRT_DYN_WORDS" in os.environ
_BLOCK_ROWS_PINNED = "VKRT_BLOCK_ROWS" in os.environ


def spec_for_scene(n_tris: int) -> TraceSpec:
    """Per-scene kernel spec (VERDICT r3 item 2): big scenes take
    CLUSTER=128 and the dynamic super-word scan (their static unrolls are
    what made city-class first compiles cost minutes; steady state measured
    identical — see DYN_WORDS), small scenes keep 64 + static unroll (2-3
    words; nothing to save). Explicit VKRT_CLUSTER / VKRT_DYN_WORDS env
    pins (at module import) win over the heuristic (sweep harnesses rely
    on it)."""
    spec = DEFAULT_SPEC
    if not _CLUSTER_PINNED and n_tris >= BIG_SCENE_TRIS:
        spec = dataclasses.replace(spec, cluster=128)
    if not _DYN_WORDS_PINNED and n_tris >= BIG_SCENE_TRIS:
        spec = dataclasses.replace(spec, dyn_words=True)
    if not _BLOCK_ROWS_PINNED:
        # 2048-ray blocks under the round-4 CORRELATED sampler: the shared
        # per-block draw set doubles its amortization and the per-program
        # overhead halves, while the coherent pool keeps the footprint
        # union from widening. Interleaved on-device A/Bs (envsweep):
        # Cornell d3 43.1 -> 39.7 ms (-7.9%, r4); the city measured +2.0%
        # pre-sandwich (shading-dominated frame masked the trace effect)
        # but -4.9% once the gather-fed shade kernel made the frame
        # trace-launch-heavy again (416.3 -> 396.1 ms, r5; rows=32 -4.3%),
        # so 16 is now universal. Pre-corr (independent draws) 16 measured
        # a no-op — this flip is only correct because corr_sampler is the
        # default.
        spec = dataclasses.replace(spec, block_rows=16)
    return spec


class ClusterScene(NamedTuple):
    """Triangle + vote-tree data packed for the kernel (host-built)."""

    tri_cols: tuple          # N_TRI_COLS arrays (T_pad//128, 128) f32:
                             # mt: v0,e1,e2 xyz (9); bw: n xyz, nd, pu xyz,
                             # pud, pv xyz, pvd (12) — lane-dim fully packed
    level_aabb: tuple        # top..bottom, (n_pad, 8) f32 (minxyz,maxxyz,pad)
    level_order: tuple       # top..bottom, (n_parent_pad*8, 16) i32: packed
                             # 4-bit child-slot permutations, cols 0/1 =
                             # lo/hi words, row = parent*8 + octant (kept for
                             # the scratch tree-variant experiments; the
                             # production kernel uses sup_oct_* below)
    cluster_aabb: jnp.ndarray  # alias of level_aabb[-1] (bottom level)
    tri_remap: jnp.ndarray   # (T_pad,) i32: packed slot -> original tri id
                             # (-1 for padding slots; pads have degenerate
                             # all-zero triangles that can never win a hit)
    n_clusters: int
    level_counts: tuple      # top..bottom true node counts (static jit key)
    # near-to-far super visiting: 8 copies of the super-level AABB table,
    # copy o sorted by box center . octant-o direction (pads/invalid last),
    # plus the position -> true super id map. The flat scan walks copy
    # ``block_octant`` so early hits tighten every lane's t and the FAR
    # supers' cluster votes collapse — front-to-back culling with zero
    # extra loop nesting (the recursive tree that "should" do this was
    # measured 31x slower; see module docstring).
    sup_oct_aabb: jnp.ndarray  # (8 * n_sup_pad, 8) f32
    sup_oct_id: jnp.ndarray    # (8 * n_sup_pad, 16) i32, col 0 = super id
    # In-kernel attribute resolve (round 3): packed per-corner shading
    # attributes in delta form, () when the scene's tables don't fit the
    # VMEM budget (see ATTR_TABLES / _attr_budget_ok). When present, the
    # kernel interpolates the winning triangle's normal/tangent/uv/material
    # while its corner data is VMEM-resident — the rchit fetch+interpolate
    # (raytrace.rchit:41-79) done where the RT core does it, replacing ~36
    # floats/lane of gather-bound XLA in the shading stage.
    attr_cols: tuple = ()      # 26 arrays (T_pad//128, 128) f32
    # per-8-triangle-group AABBs for GROUP_GATE: row c*(CLUSTER//GROUP)+g =
    # group g of packed cluster c, (minxyz, maxxyz, pad, pad); empty groups
    # point-encoded at 1e30 (see _build_levels). Always built (cheap numpy);
    # only DMA'd to VMEM when the gate is on.
    group_aabb: jnp.ndarray = ()
    # the kernel configuration this scene was packed for (STATIC pytree
    # node — jit-cache-key data, zero leaves); consumers derive every
    # layout/kernel constant from here, never from the module globals
    spec: TraceSpec = DEFAULT_SPEC


def _inverted_aabb(n):
    out = np.zeros((n, 6), np.float32)
    out[:, :3] = np.inf
    out[:, 3:] = -np.inf
    return out


def _build_levels(cluster_aabb6: np.ndarray):
    """16-ary AABB tree over clusters + per-octant near-to-far child orders.

    Returns (level_aabb [(n_pad, 8) f32], level_order [(n_parent*8, 16) i32],
    level_counts), all top..bottom. Empty/padded nodes carry inverted boxes
    so they never vote in.
    """
    aabbs = [np.asarray(cluster_aabb6[:, :6], np.float32)]
    counts = [len(cluster_aabb6)]
    while counts[0] > FANOUT:
        n = counts[0]
        npar = -(-n // FANOUT)
        pad = npar * FANOUT - n
        if pad:
            aabbs[0] = np.concatenate([aabbs[0], _inverted_aabb(pad)])
        grp = aabbs[0].reshape(npar, FANOUT, 6)
        valid = grp[:, :, 0] <= grp[:, :, 3]
        pmin = np.where(valid[..., None], grp[:, :, :3], np.inf).min(1)
        pmax = np.where(valid[..., None], grp[:, :, 3:], -np.inf).max(1)
        aabbs.insert(0, np.concatenate([pmin, pmax], 1).astype(np.float32))
        counts.insert(0, npar)
    # virtual root: pad the top level to one full word of 16
    if len(aabbs[0]) < FANOUT:
        aabbs[0] = np.concatenate(
            [aabbs[0], _inverted_aabb(FANOUT - len(aabbs[0]))]
        )

    octs = np.array(
        [[(1.0 if o & 4 else -1.0), (1.0 if o & 2 else -1.0),
          (1.0 if o & 1 else -1.0)] for o in range(8)],
        np.float32,
    )  # octant o -> direction sign vector (x=bit2, y=bit1, z=bit0)

    level_aabb, level_order = [], []
    for lvl, a in enumerate(aabbs):
        # Pad to the TRUE parent count's children, not the padded parent
        # length: padding to len(padded_parent)*FANOUT compounds per level
        # (a ragged tree's bottom table grows to 16^(L-1) rows regardless of
        # the true cluster count, ~15x VMEM waste) and every row is DMA'd to
        # VMEM per program. Invalid parents are point-encoded and never vote,
        # so their child slots are never indexed.
        n_parent = 1 if lvl == 0 else counts[lvl - 1]
        a = np.concatenate([a, _inverted_aabb(n_parent * FANOUT - len(a))]) \
            if len(a) < n_parent * FANOUT else a
        aabbs[lvl] = a
        packed = np.zeros((len(a), 8), np.float32)
        packed[:, :6] = a
        # DEVICE encoding of empty boxes: a POINT at 1e30, not the inverted
        # +-inf box. An inverted box passes the slab test for EVERY ray
        # (per-axis min(t0,t1) = -inf, max = +inf, so tnear = t_min <= t_lim
        # = tfar) — round 2 measured 115 junk cluster visits per block from
        # exactly this (~77x the true geometric overlap), silently costing
        # ~10x frame time while every image stayed correct. The point box
        # yields tnear ~ 1e30/|d| > tfar for any real ray.
        inv_rows = a[:, 0] > a[:, 3]
        packed[inv_rows, 0:6] = 1e30
        level_aabb.append(jnp.asarray(packed))

        with np.errstate(invalid="ignore"):  # inverted pad boxes -> NaN center
            centers = 0.5 * (a[:, :3] + a[:, 3:6]).reshape(n_parent, FANOUT, 3)
        invalid = (a[:, 0] > a[:, 3]).reshape(n_parent, FANOUT)
        order = np.zeros((n_parent * 8, 16), np.int32)
        for o in range(8):
            key = np.einsum("pkc,c->pk", centers, octs[o])
            key = np.where(invalid, np.inf, key)
            perm = np.argsort(key, axis=1, kind="stable")  # (n_parent, 16)
            lo = np.zeros(n_parent, np.uint64)
            hi = np.zeros(n_parent, np.uint64)
            for b in range(8):
                lo |= perm[:, b].astype(np.uint64) << np.uint64(4 * b)
                hi |= perm[:, b + 8].astype(np.uint64) << np.uint64(4 * b)
            # row layout: parent*8 + octant
            order[o::8, 0] = lo.astype(np.uint32).view(np.int32)
            order[o::8, 1] = hi.astype(np.uint32).view(np.int32)
        level_order.append(jnp.asarray(order))
    return tuple(level_aabb), tuple(level_order), tuple(counts)


def build_cluster_scene(tri_v0, tri_e1, tri_e2, attrs=None,
                        spec: TraceSpec = None) -> ClusterScene:
    """Pack triangles into clusters + vote tree for the kernel.

    Prefers the native binned-SAH decomposition (native/bvh_builder.cpp via
    utils.native) — SAH subtrees give tighter cluster boxes than Morton runs,
    which directly cuts the triangles each ray block tests. Falls back to
    Morton-order clustering when the native library is unavailable.

    ``attrs``: optional (corner_normal (T,3,3), corner_tangent (T,3,4),
    corner_uv (T,3,2), tri_mat (T,)) — packed for in-kernel attribute
    resolve when the tables fit the VMEM budget.
    """
    from vkrt_tpu.utils import native

    if spec is None:
        spec = DEFAULT_SPEC
    sah = native.build_sah_clusters(
        np.asarray(tri_v0, np.float32),
        np.asarray(tri_e1, np.float32),
        np.asarray(tri_e2, np.float32),
        spec.cluster,
        FANOUT,
    )
    if sah is not None:
        tri_order, cluster_aabb, _super_aabb, n_clusters, _ = sah
        return _pack_cluster_scene(tri_v0, tri_e1, tri_e2, tri_order,
                                   cluster_aabb, n_clusters, attrs, spec)
    return _build_cluster_scene_morton(tri_v0, tri_e1, tri_e2, attrs, spec)


def _attrs_fit_budget(t_pad: int, spec: TraceSpec) -> bool:
    """Do geometry + attribute tables fit the resident-VMEM budget?"""
    return 4 * t_pad * (spec.n_tri_cols + ATTR_TABLES) \
        <= spec.attr_vmem_budget


# Pre-pivoted component layout (CLUSTER=64 only): tile row (c//16)*8 + s,
# lane (c%16)*8 + g holds packed slot c*64 + g*8 + s (group member s in
# SUBLANES, group g in lanes). A cluster's 8 (8,1) Möller-Trumbore group
# columns then come from ONE dynamic sublane read + ONE dynamic lane
# rotation + static width-1 lane slices, replacing the 8 (1,8)->(8,1)
# shape-cast pivots per table per visit of the row-major layout (72
# pivots/visit plain, ~280 with attribute resolve — measured 21% of
# dynamic-visit cost on geometry alone, benchmarks/scratch/variants.py
# bit16 25.1 -> ppbit16 19.7 ms). Same bytes, same VMEM.
# (kept as module names for the scratch harnesses; internal code reads the
# TraceSpec properties pp/gpc/cpt instead)
_PP = DEFAULT_SPEC.pp
_GPC = DEFAULT_SPEC.gpc      # MT groups per cluster (lanes per cluster)
_CPT = DEFAULT_SPEC.cpt      # clusters per (8,128) tile


def _layout_col(flat: np.ndarray, spec: TraceSpec) -> np.ndarray:
    """(T_pad,) packed-slot-order component -> device table layout."""
    if not spec.pp:
        return flat.reshape(-1, LANES)
    n_c = flat.size // spec.cluster
    a = flat.reshape(n_c, spec.gpc, 8).transpose(0, 2, 1)      # (c, s, g)
    a = a.reshape(-1, spec.cpt, 8, spec.gpc).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(a.reshape(-1, LANES))          # (t, s, ci, g)


def _dirty_rows(dirty_clusters: np.ndarray, spec: TraceSpec) -> np.ndarray:
    """Cluster dirty mask -> device-table row dirty mask (layout-aware)."""
    if not spec.pp:
        return dirty_clusters.reshape(-1, LANES // spec.cluster).any(axis=1)
    tile_dirty = dirty_clusters.reshape(-1, spec.cpt).any(axis=1)
    return np.repeat(tile_dirty, 8)


def _pack_attr_cols(tri_order, attrs, sel=None, as_numpy=False,
                    spec: TraceSpec = DEFAULT_SPEC) -> tuple:
    """Pack per-corner attributes into 26 delta-form column tables (see
    ATTR_TABLES for the layout), reordered by the packed slot order.

    ``sel``: optional slot selection (refit: the dirty rows' slot ranges,
    in device order) — cost then scales with the moved subset."""
    corner_normal, corner_tangent, corner_uv, tri_mat = attrs
    valid = tri_order >= 0
    safe = np.where(valid, tri_order, 0)
    if sel is not None:
        valid = valid[sel]
        safe = safe[sel]
    cn = np.asarray(corner_normal, np.float32)[safe]    # (S,3,3)
    ct = np.asarray(corner_tangent, np.float32)[safe]   # (S,3,4)
    cu = np.asarray(corner_uv, np.float32)[safe]        # (S,3,2)
    tm = np.asarray(tri_mat, np.float32)[safe]          # (S,)

    srcs = []
    for arr in (cn, ct[..., :3]):
        srcs += [arr[:, 0, j] for j in range(3)]
        srcs += [arr[:, 1, j] - arr[:, 0, j] for j in range(3)]
        srcs += [arr[:, 2, j] - arr[:, 0, j] for j in range(3)]
    srcs.append(ct[:, 0, 3])  # handedness w from corner 0 (rchit:77-78)
    for j in range(2):
        srcs += [cu[:, 0, j],
                 cu[:, 1, j] - cu[:, 0, j],
                 cu[:, 2, j] - cu[:, 0, j]]
    srcs.append(tm)
    assert len(srcs) == ATTR_TABLES
    cols = tuple(
        _layout_col(np.where(valid, s, 0.0).astype(np.float32), spec)
        for s in srcs
    )
    if as_numpy:
        return cols
    return tuple(jnp.asarray(c) for c in cols)


def _tri_component_arrays(v0, e1, e2, spec: TraceSpec = DEFAULT_SPEC):
    """Per-slot intersector component arrays ((S,) f32 each, table order).

    mt: v0/e1/e2 xyz (Möller-Trumbore operands). bw: the Baldwin-Weber
    transform — unit plane normal n̂ + offset nd = -n̂·v0, and the two
    barycentric functionals pu|pud, pv|pvd with pu·e1 = 1, pu·e2 = 0 (and
    symmetrically pv), so u(p) = pu·p + pud, v(p) = pv·p + pvd for any
    plane point p. Precomputed in float64: the |e1×e2|² Gram determinant
    spans ~1e-12..1e8 across real scenes and an f32 reciprocal there would
    bleed into every u/v. Degenerate (pad) triangles get all-zero rows:
    n̂ = 0 ⇒ denom = 0 ⇒ guarded invalid, exactly like mt's det = 0.
    """
    if spec.isect == "mt":
        return [np.ascontiguousarray(a[:, j], np.float32)
                for a in (v0, e1, e2) for j in range(3)]
    v0d = v0.astype(np.float64)
    e1d = e1.astype(np.float64)
    e2d = e2.astype(np.float64)
    n = np.cross(e1d, e2d)
    n2 = (n * n).sum(1)
    ok = n2 > 0
    inv_len = np.where(ok, 1.0 / np.sqrt(np.where(ok, n2, 1.0)), 0.0)
    nu = n * inv_len[:, None]                        # unit normal (or 0)
    # pu = (e2 × n̂)/|n|: pu·e1 = n̂·(e1×e2)/|n| = 1, pu·e2 = 0
    pu = np.cross(e2d, nu) * inv_len[:, None]
    pv = np.cross(nu, e1d) * inv_len[:, None]
    nd = -(nu * v0d).sum(1)
    pud = -(pu * v0d).sum(1)
    pvd = -(pv * v0d).sum(1)
    comps = [nu[:, 0], nu[:, 1], nu[:, 2], nd,
             pu[:, 0], pu[:, 1], pu[:, 2], pud,
             pv[:, 0], pv[:, 1], pv[:, 2], pvd]
    return [np.ascontiguousarray(c, np.float32) for c in comps]


def _group_aabbs(v0s, e1s, e2s, valid) -> np.ndarray:
    """Packed-slot-order geometry -> per-GROUP AABB table (G_total, 8) f32,
    row c*(CLUSTER//GROUP)+g. Empty groups point-encoded at 1e30."""
    p1 = v0s + e1s
    p2 = v0s + e2s
    lo = np.minimum(np.minimum(v0s, p1), p2)
    hi = np.maximum(np.maximum(v0s, p1), p2)
    vm = valid[:, None]
    lo = np.where(vm, lo, np.inf).reshape(-1, GROUP, 3).min(axis=1)
    hi = np.where(vm, hi, -np.inf).reshape(-1, GROUP, 3).max(axis=1)
    out = np.zeros((len(lo), 8), np.float32)
    out[:, :3] = lo
    out[:, 3:6] = hi
    out[lo[:, 0] > hi[:, 0], 0:6] = 1e30  # empty -> unvotable point
    return out


def _pack_cluster_scene(tri_v0, tri_e1, tri_e2, tri_order, cluster_aabb,
                        n_clusters, attrs=None,
                        spec: TraceSpec = DEFAULT_SPEC) -> ClusterScene:
    v0 = np.asarray(tri_v0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    valid = tri_order >= 0
    safe = np.where(valid, tri_order, 0)

    vm = valid[:, None]
    v0s = np.where(vm, v0[safe], 0.0)
    e1s = np.where(vm, e1[safe], 0.0)
    e2s = np.where(vm, e2[safe], 0.0)
    comps = _tri_component_arrays(v0s, e1s, e2s, spec)
    tri_cols = tuple(jnp.asarray(_layout_col(c, spec)) for c in comps)
    group_aabb = jnp.asarray(_group_aabbs(v0s, e1s, e2s, valid))
    level_aabb, level_order, counts = _build_levels(
        np.asarray(cluster_aabb[:, :6], np.float32)
    )
    sup_oct_aabb, sup_oct_id = _build_super_octants(level_aabb, counts)
    attr_cols = ()
    if attrs is not None and _attrs_fit_budget(tri_order.size, spec):
        attr_cols = _pack_attr_cols(np.asarray(tri_order), attrs, spec=spec)
    return ClusterScene(
        tri_cols=tri_cols,
        level_aabb=level_aabb,
        level_order=level_order,
        cluster_aabb=level_aabb[-1],
        tri_remap=jnp.asarray(np.asarray(tri_order, np.int32)),
        n_clusters=int(n_clusters),
        level_counts=counts,
        sup_oct_aabb=sup_oct_aabb,
        sup_oct_id=sup_oct_id,
        attr_cols=attr_cols,
        group_aabb=group_aabb,
        spec=spec,
    )


def _build_super_octants(level_aabb, counts):
    """8 near-to-far-ordered copies of the super level + id maps.

    For octant o (direction signs x=bit2, y=bit1, z=bit0), supers sort by
    ascending box-center projection onto that direction — a ray block whose
    dominant direction is in octant o then visits supers front-to-back.
    Invalid/pad supers sort last (key +inf) and never vote in anyway.
    For single-level scenes (<= FANOUT clusters) the CLUSTER level plays
    the super role so tiny scenes get the same ordering.
    """
    sup = np.asarray(level_aabb[-2] if len(level_aabb) > 1 else level_aabb[-1])
    n_pad = len(sup)
    # empties carry the device point-at-1e30 encoding (see _build_levels)
    invalid = sup[:, 0] >= 1e30
    with np.errstate(invalid="ignore"):
        centers = 0.5 * (sup[:, :3] + sup[:, 3:6])
    octs = np.array(
        [[(1.0 if o & 4 else -1.0), (1.0 if o & 2 else -1.0),
          (1.0 if o & 1 else -1.0)] for o in range(8)],
        np.float32,
    )
    aabb_out = np.zeros((8 * n_pad, 8), np.float32)
    id_out = np.zeros((8 * n_pad, 16), np.int32)
    for o in range(8):
        key = centers @ octs[o]
        key = np.where(invalid, np.inf, key)
        order = np.argsort(key, kind="stable").astype(np.int32)
        aabb_out[o * n_pad : (o + 1) * n_pad] = sup[order]
        id_out[o * n_pad : (o + 1) * n_pad, 0] = order
    return jnp.asarray(aabb_out), jnp.asarray(id_out)


def _build_cluster_scene_morton(tri_v0, tri_e1, tri_e2, attrs=None,
                                spec: TraceSpec = DEFAULT_SPEC) -> ClusterScene:
    from vkrt_tpu.bvh.lbvh import morton3d

    CLUSTER = spec.cluster  # local shadow: packing grain of THIS scene

    v0 = np.asarray(tri_v0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    n = len(v0)
    v1 = v0 + e1
    v2 = v0 + e2
    bmin = np.minimum(np.minimum(v0, v1), v2)
    bmax = np.maximum(np.maximum(v0, v1), v2)
    # degenerate padding triangles (all-zero) would pollute cluster bounds at
    # the origin; give them inverted boxes so they never vote a cluster in
    degen = (np.abs(e1).sum(1) == 0) & (np.abs(e2).sum(1) == 0)
    centroid = 0.5 * (bmin + bmax)
    lo, hi = centroid.min(0), centroid.max(0)
    codes = np.asarray(morton3d(jnp.asarray((centroid - lo) / np.maximum(hi - lo, 1e-12))))
    order = np.argsort(
        codes.astype(np.int64) * (n + 1) + np.arange(n), kind="stable"
    )
    # push degenerate pad tris to the end so real clusters stay tight
    order = np.concatenate([order[~degen[order]], order[degen[order]]])

    n_clusters = -(-n // CLUSTER)
    n_clusters_pad = -(-n_clusters // FANOUT) * FANOUT
    t_pad = n_clusters_pad * CLUSTER

    remap = np.full(t_pad, 0, np.int32)
    remap[:n] = order
    valid = np.zeros(t_pad, bool)
    valid[:n] = ~degen[order]
    tri_order = np.where(valid, remap, -1)

    cmin = np.full((n_clusters_pad, 3), np.inf, np.float32)
    cmax = np.full((n_clusters_pad, 3), -np.inf, np.float32)
    bmin_o = bmin[order]
    bmax_o = bmax[order]
    for c in range(n_clusters):
        s, e = c * CLUSTER, min((c + 1) * CLUSTER, n)
        m = valid[s:e]
        if m.any():
            cmin[c] = bmin_o[s:e][m].min(0)
            cmax[c] = bmax_o[s:e][m].max(0)
    cluster_aabb = np.concatenate([cmin, cmax], 1)
    return _pack_cluster_scene(tri_v0, tri_e1, tri_e2, tri_order,
                               cluster_aabb, n_clusters_pad, attrs, spec)


# Bounded host-side mirror cache for the two refit inputs that otherwise
# round-trip FROM the device every re-pose (tri_remap never changes across
# refits; cluster_aabb is re-seeded with the host copy of each refit's own
# output). Entries hold the device array itself, so ids stay valid.
_REFIT_NP_CACHE = collections.OrderedDict()


def _cached_np(arr, compute, limit=8):
    key = id(arr)
    ent = _REFIT_NP_CACHE.get(key)
    if ent is not None and ent[0] is arr:
        _REFIT_NP_CACHE.move_to_end(key)
        return ent[1]
    data = compute(arr)
    _REFIT_NP_CACHE[key] = (arr, data)
    if len(_REFIT_NP_CACHE) > limit:
        _REFIT_NP_CACHE.popitem(last=False)
    return data


@jax.jit
def _apply_refit(tri_cols, attr_cols, group_aabb, r_idx, fresh_tri,
                 fresh_attr, g_rows, fresh_groups):
    """ONE jitted dispatch for every refit scatter (9 tri cols + 26 attr
    cols + the group-AABB table): each .at[rows].set was a separate
    device round trip before — the dominant re-pose cost through the
    high-latency device link."""
    new_tri = tuple(
        c.at[r_idx].set(fresh_tri[i]) for i, c in enumerate(tri_cols)
    )
    new_attr = tuple(
        c.at[r_idx].set(fresh_attr[i]) for i, c in enumerate(attr_cols)
    )
    new_group = group_aabb.at[g_rows].set(fresh_groups)
    return new_tri, new_attr, new_group


def refit_cluster_scene(cs: ClusterScene, tri_v0, tri_e1, tri_e2,
                        moved: np.ndarray, attrs=None) -> ClusterScene:
    """Refit the cluster scene after a subset of triangles moved.

    The TPU analog of a TLAS-only update (the reference re-records the top
    level per pose while BLASes persist, hello_vulkan.cpp:1031-1047): the SAH
    *clustering* (tri_order) is kept, only the moved slots' packed columns +
    their clusters' AABBs are recomputed, and the (tiny) upper vote-tree
    levels are rebuilt. Cost scales with the moved subset + O(n_clusters),
    not with a full SAH rebuild.

    ``moved``: (T,) bool over ORIGINAL triangle ids, True where geometry
    changed. Returns a new ClusterScene sharing untouched arrays.
    """
    v0 = np.asarray(tri_v0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    moved = np.asarray(moved, bool)
    spec = cs.spec
    CLUSTER = spec.cluster  # local shadow: THIS scene's packing grain
    # (T_pad,) packed slot -> orig; constant across refits — cached so the
    # steady-state animation loop never pulls it from the device
    order = _cached_np(cs.tri_remap, lambda a: np.asarray(a))
    valid = order >= 0
    safe = np.where(valid, order, 0)
    slot_moved = valid & moved[safe]          # (T_pad,)
    dirty = slot_moved.reshape(-1, CLUSTER).any(axis=1)  # (n_cluster_pad,)
    if not dirty.any():
        return cs

    # update packed triangle columns for dirty clusters only (device-table
    # row granularity, layout-aware: pre-pivoted tables dirty 8 rows per
    # 16-cluster tile, row-major tables LANES//CLUSTER clusters per row)
    rows_dirty = _dirty_rows(dirty, spec)
    r_idx = np.nonzero(rows_dirty)[0]
    # Host cost scales with the MOVED subset, not the scene: recompute
    # components only on the dirty rows' slots. The device layout is
    # tile-local (pre-pivoted: 8 rows = one 16-cluster tile = 8*LANES
    # slots; row-major: 1 row = LANES slots), so _layout_col over the
    # concatenated dirty slot ranges yields exactly the dirty rows.
    if spec.pp:
        sel = (
            (r_idx[::8] // 8)[:, None] * (8 * LANES) + np.arange(8 * LANES)
        ).reshape(-1)
    else:
        sel = (r_idx[:, None] * LANES + np.arange(LANES)).reshape(-1)
    vsel = valid[sel]
    ssel = safe[sel]
    vm = vsel[:, None]
    comps = _tri_component_arrays(
        np.where(vm, v0[ssel], 0.0), np.where(vm, e1[ssel], 0.0),
        np.where(vm, e2[ssel], 0.0), spec,
    )
    fresh_tri = np.stack([_layout_col(c, spec) for c in comps])  # (9|12, R, 128)

    # attribute columns move with the geometry (normals/tangents rotate
    # under a re-pose); refresh the dirty rows from the caller's updated
    # corner arrays. A resolving scene MUST pass attrs or the kernel would
    # shade moved triangles with stale frames.
    if cs.attr_cols:
        assert attrs is not None, \
            "refit of an attribute-resolving ClusterScene needs attrs"
        fresh_attr = np.stack(
            _pack_attr_cols(order, attrs, sel=sel, as_numpy=True, spec=spec)
        )  # (26, R, 128)
    else:
        fresh_attr = np.zeros((0, len(r_idx), LANES), np.float32)

    # recompute DIRTY clusters' AABBs only (slots of a cluster are
    # contiguous in packed order)
    dc = np.nonzero(dirty)[0]
    dslots = (dc[:, None] * CLUSTER + np.arange(CLUSTER)).reshape(-1)
    vld = valid[dslots].reshape(-1, CLUSTER)
    dsafe = safe[dslots]
    c_v0 = v0[dsafe].reshape(-1, CLUSTER, 3)
    c_e1 = e1[dsafe].reshape(-1, CLUSTER, 3)
    c_e2 = e2[dsafe].reshape(-1, CLUSTER, 3)
    p1 = c_v0 + c_e1
    p2 = c_v0 + c_e2
    lo = np.minimum(np.minimum(c_v0, p1), p2)
    hi = np.maximum(np.maximum(c_v0, p1), p2)
    lo = np.where(vld[..., None], lo, np.inf).min(axis=1)
    hi = np.where(vld[..., None], hi, -np.inf).max(axis=1)
    # group-AABB table rows of the dirty clusters (GROUP_GATE input)
    fresh_groups = _group_aabbs(
        c_v0.reshape(-1, 3), c_e1.reshape(-1, 3), c_e2.reshape(-1, 3),
        vld.reshape(-1),
    )
    g_rows = (dc[:, None] * spec.gpc + np.arange(spec.gpc)).reshape(-1)
    new_cols, new_attr_cols, group_aabb = _apply_refit(
        tuple(cs.tri_cols), tuple(cs.attr_cols), cs.group_aabb,
        jnp.asarray(r_idx), jnp.asarray(fresh_tri),
        jnp.asarray(fresh_attr), jnp.asarray(g_rows),
        jnp.asarray(fresh_groups),
    )
    if not cs.attr_cols:
        new_attr_cols = ()
    # rebuild levels from the TRUE cluster count (cs.cluster_aabb is the
    # padded bottom level; feeding the padded length would shift level_counts
    # — a static jit key — and force a recompile)
    n_c = order.size // CLUSTER
    assert n_c == cs.level_counts[-1], (n_c, cs.level_counts)

    def _pull_caabb(arr):
        # undo the device point-at-1e30 empty encoding (the union/ordering
        # math expects inverted boxes for empties)
        a = np.asarray(arr)[:n_c, :6].copy()
        empty = a[:, 0] >= 1e30
        a[empty, 0:3] = np.inf
        a[empty, 3:6] = -np.inf
        return a

    caabb = _cached_np(cs.cluster_aabb, _pull_caabb).copy()
    caabb[dc, :3] = lo
    caabb[dc, 3:] = hi

    level_aabb, level_order, counts = _build_levels(caabb)
    assert counts == cs.level_counts
    sup_oct_aabb, sup_oct_id = _build_super_octants(level_aabb, counts)
    # seed the cache for the next refit in the chain: the new bottom table
    # IS caabb (modulo the device empty-encoding the pull would undo)
    _REFIT_NP_CACHE[id(level_aabb[-1])] = (level_aabb[-1], caabb)
    return cs._replace(
        tri_cols=tuple(new_cols),
        level_aabb=level_aabb,
        level_order=level_order,
        cluster_aabb=level_aabb[-1],
        level_counts=counts,
        sup_oct_aabb=sup_oct_aabb,
        sup_oct_id=sup_oct_id,
        attr_cols=new_attr_cols,
        group_aabb=group_aabb,
    )


def _slab_vote(aabb_ref, idx, ox, oy, oz, ix, iy, iz, t_min, t_lim):
    """AABB slab test of one box (scalars from VMEM) vs an (8,128) ray tile
    with a per-lane ``t_lim``. Returns (8,128) bool hit."""
    minx = aabb_ref[idx, 0]
    miny = aabb_ref[idx, 1]
    minz = aabb_ref[idx, 2]
    maxx = aabb_ref[idx, 3]
    maxy = aabb_ref[idx, 4]
    maxz = aabb_ref[idx, 5]
    tx0 = (minx - ox) * ix
    tx1 = (maxx - ox) * ix
    ty0 = (miny - oy) * iy
    ty1 = (maxy - oy) * iy
    tz0 = (minz - oz) * iz
    tz1 = (maxz - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_lim),
    )
    return tnear <= tfar


def _cluster_tiles(tri_refs, c, spec: TraceSpec):
    """Extract cluster c's triangle components as lists of (8, 1) group
    columns, one list per table.

    CLUSTER=64/128 (production): tables are PRE-PIVOTED (see _layout_col) —
    one dynamic sublane read of the cluster's (8, 128) tile, one dynamic
    lane rotation to bring its lanes to the front, then static width-1 lane
    slices. No shape casts.

    CLUSTER=32 (sweep knob): row-major tables — load the row, select the
    piece by scalar predicates, then cut static (1, 8) group slices and
    pivot each to a sublane column ((1,64)->(8,8) reshapes and dynamic
    lane slicing are rejected / crash the compile helper)."""
    if spec.pp:
        t8 = (c // spec.cpt) * 8
        shift = (LANES - (c % spec.cpt) * spec.gpc) % LANES
        tiles = []
        for r in tri_refs:
            blk = pltpu.roll(r[pl.ds(t8, 8), :], shift, 1)
            tiles.append([blk[:, g : g + 1] for g in range(spec.gpc)])
        return tiles
    per_row = LANES // spec.cluster
    row = c // per_row
    tiles = []
    for r in tri_refs:
        piece = r[pl.ds(row, 1), :]                     # (1,128)
        piece = jnp.where((c % per_row) >= per_row // 2,
                          piece[:, 64:], piece[:, :64])  # (1,64)
        if spec.cluster == 32:
            piece = jnp.where((c % 2) == 1, piece[:, 32:], piece[:, :32])
        tiles.append(
            [
                piece[:, g * GROUP : (g + 1) * GROUP].reshape(GROUP, 1)
                for g in range(spec.gpc)
            ]
        )
    return tiles


def _mt_group(
    tiles, g, ox, oy, oz, dx, dy, dz, t_min
):
    """Möller-Trumbore for an 8-triangle group vs a 128-ray row.

    tri components come as (8,1) columns from the cluster tiles, ray
    components are (1,128) rows; every op below computes 1024 ray-triangle
    pairs. Returns (t, u, v, valid) all (8,128) with t = INF where invalid.
    """
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (comp[g] for comp in tiles)
    # pvec = cross(d, e2)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, pl.reciprocal(det, approx=False), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = cross(tvec, e1)
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(valid, t, INF), u, v, valid, None


def _bw_group(tiles, g, ox, oy, oz, dx, dy, dz, t_min):
    """Baldwin-Weber plane-transform intersection for an 8-triangle group
    vs a 128-ray row: solve the plane (t = -(n̂·o + nd)/(n̂·d)), take the
    hit point h = o + t d, evaluate the two precomputed barycentric
    functionals at h. ~1.5x fewer vector ops than Möller-Trumbore (no
    trace-time cross products) on the same (8,1)x(1,128) broadcast
    pattern; h doubles as the resolve path's hit position (saving its
    v0 + u·e1 + v·e2 interpolation). Returns (t, u, v, valid, (hx,hy,hz)).
    """
    (nx, ny, nz, nd, pux, puy, puz, pud,
     pvx, pvy, pvz, pvd) = (comp[g] for comp in tiles)
    denom = nx * dx + ny * dy + nz * dz
    dist = nx * ox + ny * oy + nz * oz + nd
    # guarded -1/denom: degenerate (pad) rows have n̂ = 0 and parallel rays
    # denom ~ 0 — both rejected like mt's det = 0
    ok = jnp.abs(denom) > _DET_EPS
    neg_inv = jnp.where(ok, -pl.reciprocal(denom, approx=False), 0.0)
    t = dist * neg_inv
    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    u = pux * hx + puy * hy + puz * hz + pud
    v = pvx * hx + pvy * hy + pvz * hz + pvd
    valid = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min)
    return jnp.where(valid, t, INF), u, v, valid, (hx, hy, hz)


def _or_reduce_scalar(mask):
    """(8,128) uint32 bitmask -> scalar uint32 OR over every lane.

    The naive per-box ``jnp.any`` costs a full vector->scalar sync (~400
    cycles) per box and was measured to dominate the whole kernel; this
    folds 16 boxes' votes into ONE sync: 3 sublane folds + 7 lane rotations
    leave the OR of all 1024 lanes in every element, then a single scalar
    reduction extracts it.
    """
    m = mask
    r = m.shape[0]
    while r > 1:
        m = m[: r // 2, :] | m[r // 2 : r, :]
        r //= 2
    for sh in (64, 32, 16, 8, 4, 2, 1):
        m = m | pltpu.roll(m, sh, 1)
    # every lane now holds the identical OR; Mosaic lacks unsigned reductions,
    # so bitcast and pick the common value with a signed max (sign-safe since
    # all values are equal). Bit tests downstream use (x >> k) & 1, which is
    # correct under arithmetic shift too.
    return jnp.max(pltpu.bitcast(m, jnp.int32))


def _popcount32(x):
    """Scalar population count (uint32)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _ctz32(x):
    """Scalar count-trailing-zeros (x != 0), 5-step binary search."""
    c = jnp.int32(0)
    for shift, mask in ((16, 0xFFFF), (8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        low = x & jnp.uint32(mask)
        zero = low == 0
        c = c + jnp.where(zero, shift, 0)
        x = jnp.where(zero, x >> shift, x)
    return c


def _for_each_set_bit(word, body):
    """Run ``body(bit_index)`` for every set bit of ``word``, LSB first
    (= near-to-far under the octant-ordered vote bits).

    Iterating only voted entries (popcount iterations, next bit by ctz)
    replaces the dense fori + pl.when pattern whose per-iteration scalar
    overhead dominated the kernel. ``body`` communicates through out_ref —
    vector loop carries through nested fori_loops were measured ~200x
    slower (Mosaic copies the carried vregs at every loop boundary)."""
    word_u = word.astype(jnp.uint32)

    def step(_, w):
        body(_ctz32(w))
        return w & (w - jnp.uint32(1))

    jax.lax.fori_loop(0, _popcount32(word_u), step, word_u)


def _trace_kernel(spec: TraceSpec, n_levels: int, t_min: float,
                  true_super: int, resolve: bool, inc_vote: bool,
                  group_gate: bool, pure_any: bool, defer: bool, *refs):
    """Unified closest/any trace: static super-word scan + voted visits.

    Rays arrive as ONE packed (8, 7*128) block [o.xyz | d.xyz | t_lim]
    (t_lim < 0 = first-hit-kills lane with bound |t_lim|; see ``any_kill``)
    and results leave as ONE packed (8, 4*128) block [t | idx-bits | u | v]
    (u/v zero under KEYPACK — recomputed by _uv_from_hit outside): a
    single DMA each way (small-block DMA latency was a large share of the
    per-program floor). A lane's ``t_lim`` is both its tMax and, once a hit
    lands, its tightening search bound — "any-hit" lanes simply pass their
    shadow distance and test ``idx >= 0`` afterwards.

    Traversal is a TWO-deep structure over the bottom levels of the vote
    tree: a *static* unrolled scan over super words (16 slab votes -> one
    scalar bitmask each), then per set super a vote over its 16 clusters,
    then the voted clusters' triangles. Round 2 measured the deeper
    recursive tree (dynamic fori at every level, octant-ordered child
    permutations) at ~65x SLOWER end-to-end despite visiting fewer boxes:
    Mosaic compiles nested dynamic loops with scalar-dependent VMEM reads
    into code whose per-iteration overhead dwarfs the saved slab tests, and
    compile time explodes (minutes -> tens of minutes). Static unrolls +
    one dynamic nesting level is the shape this hardware rewards
    (benchmarks/scratch/variants.py: flat 5.1 Mrays/s vs tree 0.08 on
    tile-ordered Cornell primaries).
    """
    L = n_levels
    BLOCK_ROWS = spec.block_rows    # local shadows of THIS launch's config
    CLUSTER = spec.cluster
    _GPC = spec.gpc
    ROW_GATE = spec.row_gate
    _isect_group = _bw_group if spec.isect == "bw" else _mt_group
    aabb_refs = refs[0:L]
    sup_oct_aabb, sup_oct_id = refs[L], refs[L + 1]
    nxt = L + 2
    clu_order = None
    if inc_vote and L > 1:
        clu_order = refs[nxt]
        nxt += 1
    out_cols = OUT_COLS_RESOLVE if resolve else OUT_COLS_PLAIN
    # see KEYPACK: plain kernels only; a pure-any pool's hit-bit merge is
    # strictly cheaper than the packed-key merge, so pure_any wins the slot
    keypack = spec.keypack and not resolve and not pure_any
    # caller enables group_gate only for plain non-keypack launches
    use_ggate = group_gate
    group_ref = None
    if use_ggate:
        group_ref = refs[nxt]
        nxt += 1
    tri_refs = refs[nxt : nxt + spec.n_tri_cols]
    nxt += spec.n_tri_cols
    attr_refs = ()
    if resolve:
        attr_refs = refs[nxt : nxt + ATTR_TABLES]
        nxt += ATTR_TABLES
    rays_ref, out_ref, rowvote_ref = refs[nxt], refs[nxt + 1], refs[nxt + 2]
    # one extra scratch word slot, shared: group-vote words (plain gated
    # kernels) or the per-row improved mask (deferred resolve) — the caller
    # enables at most one of the two per launch
    aux_ref = refs[nxt + 3] if (use_ggate or defer) else None
    groupvote_ref = aux_ref if use_ggate else None

    rays = rays_ref[:]
    ox = rays[:, 0 * LANES : 1 * LANES]
    oy = rays[:, 1 * LANES : 2 * LANES]
    oz = rays[:, 2 * LANES : 3 * LANES]
    dx = rays[:, 3 * LANES : 4 * LANES]
    dy = rays[:, 4 * LANES : 5 * LANES]
    dz = rays[:, 5 * LANES : 6 * LANES]
    tm = rays[:, 6 * LANES : 7 * LANES]
    # A NEGATIVE t_lim flags a first-hit-kills lane (shadow/AO/visibility —
    # the rgen terminateOnFirstHit analog): its search bound is |t_lim| and
    # the first improvement collapses the bound to -INF, so every later
    # slab vote and row gate drops the lane instead of hunting for a CLOSER
    # occluder it doesn't need. Dead/pad lanes (t_lim = -1, origin parked
    # at 1e30) read as kill-lanes that can never hit — a no-op as before.
    any_kill = tm < 0.0
    t_start = jnp.abs(tm)

    def safe_inv(d):
        return pl.reciprocal(
            jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d),
            approx=False,
        )

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 0)

    # hit state lives in out_ref (read/modify/write row slices): [t | idx
    # bits | u | v]. t starts at each lane's t limit and tightens as hits
    # land, so it doubles as the vote cull bound.
    neg1_bits = pltpu.bitcast(
        jnp.full((BLOCK_ROWS, LANES), -1, jnp.int32), jnp.float32
    )
    out_ref[:] = jnp.concatenate(
        [t_start, neg1_bits,
         jnp.zeros((BLOCK_ROWS, (out_cols - 2) * LANES), jnp.float32)],
        axis=1,
    )

    def cluster_work(c, bit=None):
        """Test all 64 triangles of cluster c against the ray block.

        ``bit``: this cluster's bit index in the rowvote scratch (row-gated
        execution, see ROW_GATE); None disables gating.

        With ``resolve``, the winning candidate's shading attributes are
        interpolated HERE, while the cluster's corner tables are
        VMEM-resident — the rchit attribute fetch (raytrace.rchit:41-79)
        done where the data already is, instead of a gather-bound XLA pass
        over HBM afterwards. Delta-form interpolation (a0 + u*d1 + v*d2)
        costs 2 FMAs per component per candidate; the winner is selected
        with the same pick mask as u/v.
        """
        tiles = _cluster_tiles(tri_refs, c, spec)
        # deferred resolve extracts attr tiles only inside phase B (per
        # improved row-visit), not once per visit
        atiles = (
            _cluster_tiles(attr_refs, c, spec)
            if resolve and not defer else None
        )

        if use_ggate:
            # one vector pass votes every row's rays against this cluster's
            # per-group boxes; lane-fold leaves row r's word in all its
            # lanes, stored so row_work_gated can read it as a scalar
            t_lim_g = t_best()
            m = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
            for g in range(_GPC):
                hitg = _slab_vote(group_ref, c * _GPC + g,
                                  ox, oy, oz, ix, iy, iz, t_min, t_lim_g)
                m = m | jnp.where(hitg, jnp.uint32(1 << g), jnp.uint32(0))
            for sh in (64, 32, 16, 8, 4, 2, 1):
                m = m | pltpu.roll(m, sh, 1)
            groupvote_ref[:] = pltpu.bitcast(m, jnp.int32)

        def row_work_gated(row):
            """Plain-kernel row work with the group loop gated per set bit
            of the row's group-vote word. Hit state is read-modified-written
            per EXECUTED group (pl.when bodies can't carry locals) — ~8
            extra (1,128) VMEM ops per run group vs the carried version,
            against ~40 vector ops per skipped group."""
            gw = groupvote_ref[row, 0]
            oxr = ox[row : row + 1, :]
            oyr = oy[row : row + 1, :]
            ozr = oz[row : row + 1, :]
            dxr = dx[row : row + 1, :]
            dyr = dy[row : row + 1, :]
            dzr = dz[row : row + 1, :]
            kill_row = any_kill[row : row + 1, :]
            for g in range(_GPC):
                def g_body(g=g):
                    base = c * CLUSTER + g * GROUP
                    t_row = out_ref[row : row + 1, 0:LANES]
                    idx_row = pltpu.bitcast(
                        out_ref[row : row + 1, LANES : 2 * LANES], jnp.int32
                    )
                    t_c, u_c, v_c, valid, _ = _isect_group(
                        tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min
                    )
                    t_min_g = jnp.min(t_c, axis=0, keepdims=True)
                    improved = t_min_g < t_row
                    if pure_any:
                        # visibility verdict: park at -INF, any idx >= 0
                        out_ref[row : row + 1, 0:LANES] = jnp.where(
                            improved, -INF, t_row
                        )
                        out_ref[row : row + 1, LANES : 2 * LANES] = (
                            pltpu.bitcast(
                                jnp.where(improved, base, idx_row),
                                jnp.float32,
                            )
                        )
                        return
                    u_row = out_ref[row : row + 1, 2 * LANES : 3 * LANES]
                    v_row = out_ref[row : row + 1, 3 * LANES : 4 * LANES]
                    is_min = t_c == t_min_g
                    win_sub = jnp.min(
                        jnp.where(is_min, sub_iota, GROUP),
                        axis=0, keepdims=True,
                    )
                    pick = sub_iota == win_sub
                    u_g = jnp.sum(
                        jnp.where(pick, u_c, 0.0), axis=0, keepdims=True
                    )
                    v_g = jnp.sum(
                        jnp.where(pick, v_c, 0.0), axis=0, keepdims=True
                    )
                    out_ref[row : row + 1, 0:LANES] = jnp.where(
                        improved, jnp.where(kill_row, -INF, t_min_g), t_row
                    )
                    out_ref[row : row + 1, LANES : 2 * LANES] = pltpu.bitcast(
                        jnp.where(improved, base + win_sub, idx_row),
                        jnp.float32,
                    )
                    out_ref[row : row + 1, 2 * LANES : 3 * LANES] = jnp.where(
                        improved, u_g, u_row
                    )
                    out_ref[row : row + 1, 3 * LANES : 4 * LANES] = jnp.where(
                        improved, v_g, v_row
                    )

                pl.when(((gw >> g) & 1) != 0)(g_body)

        def row_work(row):
            oxr = ox[row : row + 1, :]
            oyr = oy[row : row + 1, :]
            ozr = oz[row : row + 1, :]
            dxr = dx[row : row + 1, :]
            dyr = dy[row : row + 1, :]
            dzr = dz[row : row + 1, :]
            kill_row = any_kill[row : row + 1, :]
            t_row = out_ref[row : row + 1, 0:LANES]
            idx_row = pltpu.bitcast(
                out_ref[row : row + 1, LANES : 2 * LANES], jnp.int32
            )
            if keypack:
                # merge ONE packed key (t bits | member id in the low 3
                # mantissa bits) per group instead of t/u/v/idx rows +
                # iota-pick: int32 compare == float compare for positive
                # floats, and a kill-lane's -INF bits are the int32
                # minimum so nothing ever improves it
                k_row = pltpu.bitcast(t_row, jnp.int32)
                kill_bits = pltpu.bitcast(
                    jnp.full((1, LANES), -INF, jnp.float32), jnp.int32
                )
                for g in range(CLUSTER // GROUP):
                    base = c * CLUSTER + g * GROUP
                    t_c, _, _, _, _ = _isect_group(
                        tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min
                    )
                    key_c = (
                        pltpu.bitcast(t_c, jnp.int32) & jnp.int32(~7)
                    ) | sub_iota
                    kmin = jnp.min(key_c, axis=0, keepdims=True)
                    improved = kmin < k_row
                    k_row = jnp.where(
                        improved,
                        jnp.where(kill_row, kill_bits, kmin),
                        k_row,
                    )
                    idx_row = jnp.where(
                        improved, base + (kmin & 7), idx_row
                    )
                out_ref[row : row + 1, 0:LANES] = pltpu.bitcast(
                    k_row, jnp.float32
                )
                out_ref[row : row + 1, LANES : 2 * LANES] = pltpu.bitcast(
                    idx_row, jnp.float32
                )
                return
            if pure_any:
                for g in range(CLUSTER // GROUP):
                    base = c * CLUSTER + g * GROUP
                    t_c, _, _, _, _ = _isect_group(
                        tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min
                    )
                    t_min_g = jnp.min(t_c, axis=0, keepdims=True)
                    improved = t_min_g < t_row
                    t_row = jnp.where(improved, -INF, t_row)
                    idx_row = jnp.where(improved, base, idx_row)
                out_ref[row : row + 1, 0:LANES] = t_row
                out_ref[row : row + 1, LANES : 2 * LANES] = pltpu.bitcast(
                    idx_row, jnp.float32
                )
                return
            u_row = out_ref[row : row + 1, 2 * LANES : 3 * LANES]
            v_row = out_ref[row : row + 1, 3 * LANES : 4 * LANES]
            if resolve and defer:
                # ---- phase A: plain merge + OR-accumulated improved mask
                imp = jnp.zeros((1, LANES), jnp.int32)
                for g in range(CLUSTER // GROUP):
                    base = c * CLUSTER + g * GROUP
                    t_c, u_c, v_c, _, _ = _isect_group(
                        tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min
                    )
                    t_min_g = jnp.min(t_c, axis=0, keepdims=True)
                    is_min = t_c == t_min_g
                    win_sub = jnp.min(
                        jnp.where(is_min, sub_iota, GROUP),
                        axis=0, keepdims=True,
                    )
                    pick = sub_iota == win_sub
                    u_g = jnp.sum(
                        jnp.where(pick, u_c, 0.0), axis=0, keepdims=True
                    )
                    v_g = jnp.sum(
                        jnp.where(pick, v_c, 0.0), axis=0, keepdims=True
                    )
                    improved = t_min_g < t_row
                    imp = imp | jnp.where(improved, 1, 0)
                    t_row = jnp.where(
                        improved, jnp.where(kill_row, -INF, t_min_g), t_row
                    )
                    idx_row = jnp.where(improved, base + win_sub, idx_row)
                    u_row = jnp.where(improved, u_g, u_row)
                    v_row = jnp.where(improved, v_g, v_row)
                out_ref[row : row + 1, 0:LANES] = t_row
                out_ref[row : row + 1, LANES : 2 * LANES] = pltpu.bitcast(
                    idx_row, jnp.float32
                )
                out_ref[row : row + 1, 2 * LANES : 3 * LANES] = u_row
                out_ref[row : row + 1, 3 * LANES : 4 * LANES] = v_row
                # lane-fold so lane 0 holds the row's any-improved word
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    imp = imp | pltpu.roll(imp, sh, 1)
                aux_ref[row : row + 1, :] = imp

                def resolve_body(row=row, c=c):
                    # ---- phase B: interpolate the attrs of THIS row's
                    # winners that live in cluster c, picked by exact
                    # winner identity with the already-merged u/v — runs
                    # only when this visit improved the row
                    atl = _cluster_tiles(attr_refs, c, spec)
                    idx_r = pltpu.bitcast(
                        out_ref[row : row + 1, LANES : 2 * LANES], jnp.int32
                    )
                    u_r = out_ref[row : row + 1, 2 * LANES : 3 * LANES]
                    v_r = out_ref[row : row + 1, 3 * LANES : 4 * LANES]
                    ext = [
                        out_ref[row : row + 1, k * LANES : (k + 1) * LANES]
                        for k in range(4, out_cols)
                    ]
                    for g in range(CLUSTER // GROUP):
                        base = c * CLUSTER + g * GROUP
                        in_g = (idx_r >= base) & (idx_r < base + GROUP)
                        pick = idx_r == base + sub_iota

                        def a(i, g=g):
                            return atl[i][g]

                        def psum(x):
                            return jnp.sum(
                                jnp.where(pick, x, 0.0),
                                axis=0, keepdims=True,
                            )

                        cand = []
                        for k in range(3):   # normal xyz
                            cand.append(
                                a(k) + u_r * a(3 + k) + v_r * a(6 + k)
                            )
                        for k in range(3):   # tangent xyz
                            cand.append(
                                a(9 + k) + u_r * a(12 + k) + v_r * a(15 + k)
                            )
                        cand.append(a(18))                          # tan w
                        cand.append(a(19) + u_r * a(20) + v_r * a(21))  # u
                        cand.append(a(22) + u_r * a(23) + v_r * a(24))  # v
                        cand.append(a(25))                          # mat id
                        ext = [
                            jnp.where(in_g, psum(x), e)
                            for x, e in zip(cand, ext)
                        ]
                    for k, e in enumerate(ext):
                        out_ref[
                            row : row + 1, (4 + k) * LANES : (5 + k) * LANES
                        ] = e

                pl.when(aux_ref[row, 0] != 0)(resolve_body)
                return
            ext = [
                out_ref[row : row + 1, k * LANES : (k + 1) * LANES]
                for k in range(4, out_cols)
            ]
            for g in range(CLUSTER // GROUP):
                base = c * CLUSTER + g * GROUP
                t_c, u_c, v_c, valid, h_c = _isect_group(
                    tiles, g, oxr, oyr, ozr, dxr, dyr, dzr, t_min
                )
                # reduce 8 candidate triangles -> best per lane
                t_min_g = jnp.min(t_c, axis=0, keepdims=True)  # (1,128)
                is_min = t_c == t_min_g
                win_sub = jnp.min(
                    jnp.where(is_min, sub_iota, GROUP), axis=0, keepdims=True
                )
                pick = sub_iota == win_sub
                u_g = jnp.sum(jnp.where(pick, u_c, 0.0), axis=0, keepdims=True)
                v_g = jnp.sum(jnp.where(pick, v_c, 0.0), axis=0, keepdims=True)
                improved = t_min_g < t_row  # t_row starts at the lane's tMax
                # kill-lanes park at -INF on their first hit: no later
                # candidate can improve and their votes collapse
                t_row = jnp.where(
                    improved, jnp.where(kill_row, -INF, t_min_g), t_row
                )
                idx_row = jnp.where(improved, base + win_sub, idx_row)
                u_row = jnp.where(improved, u_g, u_row)
                v_row = jnp.where(improved, v_g, v_row)
                if resolve:
                    def a(i, g=g):
                        return atiles[i][g]

                    def psum(x):
                        return jnp.sum(
                            jnp.where(pick, x, 0.0), axis=0, keepdims=True
                        )

                    cand = []
                    for k in range(3):   # normal xyz
                        cand.append(a(k) + u_c * a(3 + k) + v_c * a(6 + k))
                    for k in range(3):   # tangent xyz
                        cand.append(
                            a(9 + k) + u_c * a(12 + k) + v_c * a(15 + k)
                        )
                    cand.append(a(18))                            # tangent w
                    cand.append(a(19) + u_c * a(20) + v_c * a(21))  # uv.u
                    cand.append(a(22) + u_c * a(23) + v_c * a(24))  # uv.v
                    cand.append(a(25))                            # mat id
                    ext = [
                        jnp.where(improved, psum(x), e)
                        for x, e in zip(cand, ext)
                    ]
            out_ref[row : row + 1, 0:LANES] = t_row
            out_ref[row : row + 1, LANES : 2 * LANES] = pltpu.bitcast(
                idx_row, jnp.float32
            )
            out_ref[row : row + 1, 2 * LANES : 3 * LANES] = u_row
            out_ref[row : row + 1, 3 * LANES : 4 * LANES] = v_row
            if resolve:
                for k, e in enumerate(ext):
                    out_ref[row : row + 1, (4 + k) * LANES : (5 + k) * LANES] = e

        work = row_work_gated if use_ggate else row_work
        for row in range(BLOCK_ROWS):  # static unroll: 128 rays per row
            if bit is None:
                work(row)
            else:
                # gate the row on its own vote bit: a row whose 128 rays all
                # missed this cluster's box (under their CURRENT t bounds)
                # cannot improve and skips its ~280 vector ops
                live = ((rowvote_ref[row, 0] >> bit) & 1) != 0
                pl.when(live)(lambda row=row, work=work: work(row))

    def t_best():
        return out_ref[:, 0:LANES]

    def fold_word(m, save_rows: bool):
        """(8,128) uint32 vote bits -> scalar word; ``save_rows``
        additionally stores each ROW's own vote word to the rowvote scratch
        (lane-rotation fold first, so every lane of row r holds row r's
        word, then one vector store) — consumed by cluster_work's per-row
        gating. Same total fold ops as _or_reduce_scalar, reordered."""
        if not save_rows:
            return _or_reduce_scalar(m)
        for sh in (64, 32, 16, 8, 4, 2, 1):
            m = m | pltpu.roll(m, sh, 1)
        rowvote_ref[:] = pltpu.bitcast(m, jnp.int32)
        r = m.shape[0]
        while r > 1:
            m = m[: r // 2, :] | m[r // 2 : r, :]
            r //= 2
        return jnp.max(pltpu.bitcast(m, jnp.int32))

    def vote_word(aabb_ref, idx_base, save_rows: bool):
        """Vote 16 consecutive boxes at ``idx_base`` -> one scalar bitmask."""
        t_lim = t_best()
        m = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
        for b in range(FANOUT):  # static unroll
            hit = _slab_vote(aabb_ref, idx_base + b,
                             ox, oy, oz, ix, iy, iz, t_min, t_lim)
            m = m | jnp.where(hit, jnp.uint32(1 << b), jnp.uint32(0))
        return fold_word(m, save_rows)

    def vote_slots(aabb_ref, child_base, w4, save_rows: bool):
        """Vote 8 boxes at ``child_base + slot`` for the 4-bit slots packed
        in ``w4`` (a level_order half-word, near-to-far) -> scalar bitmask
        with bit b = slot (w4 >> 4b) & 15. Reads t_best() NOW, so votes
        taken after earlier visits see their tightened t."""
        t_lim = t_best()
        m = jnp.zeros((BLOCK_ROWS, LANES), jnp.uint32)
        for b in range(8):  # static unroll; slots are dynamic scalars
            slot = (
                jax.lax.shift_right_logical(w4, jnp.uint32(4 * b))
                & jnp.uint32(15)
            ).astype(jnp.int32)
            hit = _slab_vote(aabb_ref, child_base + slot,
                             ox, oy, oz, ix, iy, iz, t_min, t_lim)
            m = m | jnp.where(hit, jnp.uint32(1 << b), jnp.uint32(0))
        return fold_word(m, save_rows)

    def vote_children(aabb_ref, parent, save_rows=False):
        """Vote the 16 children of ``parent`` -> one scalar bitmask."""
        return vote_word(aabb_ref, parent * FANOUT, save_rows)

    if L == 1:
        # tiny scene: every cluster fits one top level — scan its words
        n_words = -(-true_super // FANOUT)
        for w in range(n_words):
            word = vote_word(aabb_refs[0], w * FANOUT, ROW_GATE)
            _for_each_set_bit(
                word,
                lambda k, w=w: cluster_work(
                    w * FANOUT + k, k if ROW_GATE else None
                ),
            )
    else:
        # block-level early-out: one 16-box vote over the TOP level covers
        # the whole scene — a block of dead/parked rays (fused batches park
        # finished lanes at 1e30) skips the entire super scan for the cost
        # of 16 slab tests + one sync
        top_word = vote_children(aabb_refs[0], jnp.int32(0)) if L > 2 else None

        # block-dominant direction octant picks the near-to-far-ordered
        # super table copy: front supers are visited first, their hits
        # tighten every lane's t, and the far supers' votes collapse.
        # 3 vector->scalar syncs, once per program; dead lanes have d=0
        # and don't skew the vote.
        oct = (
            (jnp.sum(dx) >= 0.0).astype(jnp.int32) * 4
            + (jnp.sum(dy) >= 0.0).astype(jnp.int32) * 2
            + (jnp.sum(dz) >= 0.0).astype(jnp.int32)
        )
        n_sup_pad = sup_oct_aabb.shape[0] // 8
        base = oct * n_sup_pad

        def scan_supers():
            # scan over ordered super words; per voted super, map the
            # ordered slot back to the true super id and vote its clusters.
            # spec.dyn_words runs the word scan as ONE dynamic fori (the
            # word body — and with it cluster_work — is emitted once, not
            # n_words times; see DYN_WORDS), else a static unroll.
            aabb_clu = aabb_refs[L - 1]
            n_words = -(-true_super // FANOUT)

            def word_body(w):
                word = vote_word(sup_oct_aabb, base + w * FANOUT, False)

                def super_body(sb):
                    sid = sup_oct_id[base + w * FANOUT + sb, 0]
                    if clu_order is None:
                        cword = vote_children(aabb_clu, sid, ROW_GATE)
                        _for_each_set_bit(
                            cword,
                            lambda k, s=sid: cluster_work(
                                s * FANOUT + k, k if ROW_GATE else None
                            ),
                        )
                        return
                    # incremental near-to-far halves: the near half's hits
                    # tighten t_best before the far half is voted at all
                    row = sid * 8 + oct
                    for half in (0, 1):
                        # int32 -> uint32 view (astype wraps mod 2^32;
                        # pltpu.bitcast rejects scalars)
                        w4 = clu_order[row, half].astype(jnp.uint32)

                        def cbody(k, w4=w4, s=sid):
                            slot = (
                                jax.lax.shift_right_logical(
                                    w4, (4 * k).astype(jnp.uint32)
                                )
                                & jnp.uint32(15)
                            ).astype(jnp.int32)
                            cluster_work(
                                s * FANOUT + slot, k if ROW_GATE else None
                            )

                        cword = vote_slots(
                            aabb_clu, sid * FANOUT, w4, ROW_GATE
                        )
                        _for_each_set_bit(cword, cbody)

                _for_each_set_bit(word, super_body)

            if spec.dyn_words and n_words > 1:
                jax.lax.fori_loop(
                    0, n_words,
                    lambda w, c: (word_body(w), c)[1], jnp.int32(0),
                )
            else:
                for w in range(n_words):
                    word_body(w)

        if top_word is None:
            scan_supers()
        else:
            pl.when(top_word != 0)(scan_supers)


# Rows of 128 rays per lax.map chunk. Chunking bounds the scoped-VMEM
# footprint XLA assigns to the kernel's operands/outputs when the call sits
# inside the frame loop (whole-frame buffers tripped compile-time VMEM OOM).
# Must be a PROG_ROWS multiple; env override for measurement sweeps.
CHUNK_ROWS = int(os.environ.get("VKRT_CHUNK_ROWS", "1200"))
assert CHUNK_ROWS % 16 == 0, CHUNK_ROWS  # divisible by every prog_rows


def _pack_rays(orig, direction, t_lim, prog_rows: int = PROG_ROWS):
    """Pad to prog_rows blocks and pack components lane-wise into ONE array:
    (rows, 7*128) [o | d | t_lim], so each kernel program takes a single
    input DMA."""
    n = orig.shape[0]
    block = prog_rows * LANES
    n_pad = (-n) % block
    if n_pad:
        # park pad-ray origins at 1e30 with t_lim=-1: an origin-0/dir-0 pad
        # would still slab-test positive for any box spanning the world
        # origin (safe_inv maps dir=0 to +-1e20) and vote clusters in
        orig = jnp.concatenate([orig, jnp.full((n_pad, 3), 1e30, orig.dtype)])
        direction = jnp.concatenate([direction, jnp.zeros((n_pad, 3), direction.dtype)])
        t_lim = jnp.concatenate([t_lim, jnp.full((n_pad,), -1.0, t_lim.dtype)])
    total = orig.shape[0]
    rows = total // LANES

    comps = [orig[:, j].reshape(rows, LANES) for j in range(3)]
    comps += [direction[:, j].reshape(rows, LANES) for j in range(3)]
    comps.append(t_lim.reshape(rows, LANES))
    return jnp.concatenate(comps, axis=1), n, rows


def _chunk_rows(packed, rows, prog_rows: int = PROG_ROWS):
    """Reshape (rows, C) to (n_chunks, chunk, C), padding rows to a chunk
    multiple. Pad rays get origin=1e30 / dir=0 / t_lim=0 so every slab test
    rejects them.

    The chunk is rounded UP to a prog_rows multiple so the launch grid
    (chunk // prog_rows) is never 0: a pool padded to 8-row blocks fed to a
    block_rows=16 tracer would otherwise silently trace NOTHING and hand
    uninitialized output rows to the shade kernel (the round-4 all-NaN
    regression — ADVICE r4 high)."""
    # both arms rounded UP to a prog_rows multiple: CHUNK_ROWS=1200 is not
    # a multiple of prog_rows=32, and a non-multiple chunk silently drops
    # its tail rows from the grid (the same class of bug as the round-4
    # zero-grid regression this docstring describes)
    chunk = min(-(-CHUNK_ROWS // prog_rows) * prog_rows,
                -(-rows // prog_rows) * prog_rows)
    pad = (-rows) % chunk
    if pad:
        pad_row = jnp.zeros((packed.shape[1],), packed.dtype)
        pad_row = pad_row.at[: 3 * LANES].set(1e30)
        packed = jnp.concatenate(
            [packed, jnp.broadcast_to(pad_row, (pad, packed.shape[1]))]
        )
    return packed.reshape(-1, chunk, packed.shape[1]), chunk


def _packed_trace(cs: ClusterScene, packed, n_levels, t_min, true_super,
                  interpret, resolve, inc_vote, pure_any=False):
    """Core chunked kernel launch: packed rays (R, 7*128) -> packed hit
    blocks (R, out_cols*128). Shared by the (N,3) API and the fully-packed
    bounce loop (ops.pallas.shade)."""
    spec = cs.spec
    prog_rows = spec.prog_rows
    rows = packed.shape[0]
    chunks, chunk_rows = _chunk_rows(packed, rows, prog_rows)
    out_cols = OUT_COLS_RESOLVE if resolve else OUT_COLS_PLAIN
    ray_spec = pl.BlockSpec(
        (prog_rows, 7 * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (prog_rows, out_cols * LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # group gating: plain non-keypack kernels only (resolve's attr machinery
    # keeps carried locals; keypack's single-key merge has its own row path;
    # pure-any pools disable keypack in-kernel so they may gate)
    use_ggate = spec.group_gate and not resolve \
        and (pure_any or not spec.keypack) \
        and getattr(cs.group_aabb, "ndim", 0) == 2
    use_defer = spec.defer_resolve and resolve
    kernel = functools.partial(
        _trace_kernel, spec, n_levels, t_min, true_super, resolve, inc_vote,
        use_ggate, pure_any, use_defer,
    )
    attr_cols = cs.attr_cols if resolve else ()
    # incremental near-to-far votes consume the bottom level_order table
    order_ops = (
        (cs.level_order[-1],) if inc_vote and n_levels > 1 else ()
    )
    group_ops = (cs.group_aabb,) if use_ggate else ()
    scratch = [pltpu.VMEM((prog_rows, LANES), jnp.int32)]
    if use_ggate or use_defer:
        scratch.append(pltpu.VMEM((prog_rows, LANES), jnp.int32))

    def chunk_body(chunk):
        out = pl.pallas_call(
            kernel,
            grid=(chunk_rows // prog_rows,),
            in_specs=[
                # AABB/order tables live in VMEM: SMEM overflows past ~2k
                # nodes and Mosaic supports scalar loads from VMEM refs
                *[pl.BlockSpec(memory_space=pltpu.VMEM)]
                * (n_levels + 2 + len(order_ops) + len(group_ops)),
                *[pl.BlockSpec(memory_space=pltpu.VMEM)]
                * (spec.n_tri_cols + len(attr_cols)),
                ray_spec,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(
                (chunk_rows, out_cols * LANES), jnp.float32
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*cs.level_aabb, cs.sup_oct_aabb, cs.sup_oct_id, *order_ops,
          *group_ops, *cs.tri_cols, *attr_cols, chunk)
        # barrier: stop XLA from fusing/holding the frame-sized outputs in
        # scoped VMEM (repeated compile-time VMEM OOMs without it)
        return jax.lax.optimization_barrier(out)

    out = jax.lax.map(chunk_body, chunks).reshape(-1, out_cols * LANES)
    return out[:rows]


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "t_min", "true_super", "interpret",
                     "resolve", "inc_vote", "pure_any"),
)
def _trace_call_packed(cs: ClusterScene, packed, n_levels, t_min,
                       true_super, interpret, resolve=True, inc_vote=None,
                       pure_any=False):
    if inc_vote is None:
        inc_vote = cs.spec.inc_vote
    return _packed_trace(cs, packed, n_levels, t_min, true_super,
                         interpret, resolve, inc_vote, pure_any=pure_any)


def _slot_flat_index(slot, spec: TraceSpec):
    """Packed slot id -> flat element index into a device column table
    (inverse of _layout_col's permutation)."""
    if not spec.pp:
        return slot
    c = slot // spec.cluster
    g = (slot % spec.cluster) // GROUP
    s = slot % GROUP
    return ((c // spec.cpt) * 8 + s) * LANES + (c % spec.cpt) * spec.gpc + g


def _uv_from_hit(cs, idx, t, orig, direction):
    """Recompute the winner's barycentrics in XLA (keypack kernels don't
    track per-candidate u/v): evaluate the intersector's own functionals
    at the hit point p = o + t*d. ~8-9 gathered floats per ray — a few ms
    at frame size vs the ~20%-of-visit-cost the kernel saves."""
    flat = _slot_flat_index(jnp.maximum(idx, 0), cs.spec)

    def gat(k):
        return jnp.take(cs.tri_cols[k].reshape(-1), flat)

    p = orig + t[:, None] * direction
    if cs.spec.isect == "bw":
        u = gat(4) * p[:, 0] + gat(5) * p[:, 1] + gat(6) * p[:, 2] + gat(7)
        v = gat(8) * p[:, 0] + gat(9) * p[:, 1] + gat(10) * p[:, 2] + gat(11)
        return u, v
    v0 = jnp.stack([gat(0), gat(1), gat(2)], axis=-1)
    e1 = jnp.stack([gat(3), gat(4), gat(5)], axis=-1)
    e2 = jnp.stack([gat(6), gat(7), gat(8)], axis=-1)
    w = p - v0
    d11 = jnp.sum(e1 * e1, axis=-1)
    d12 = jnp.sum(e1 * e2, axis=-1)
    d22 = jnp.sum(e2 * e2, axis=-1)
    dw1 = jnp.sum(w * e1, axis=-1)
    dw2 = jnp.sum(w * e2, axis=-1)
    den = d11 * d22 - d12 * d12
    inv = jnp.where(jnp.abs(den) > 1e-30, 1.0 / den, 0.0)
    u = (d22 * dw1 - d12 * dw2) * inv
    v = (d11 * dw2 - d12 * dw1) * inv
    return u, v


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "t_min", "true_super", "interpret",
                     "resolve", "inc_vote", "pure_any"),
)
def _trace_call(cs: ClusterScene, orig, direction, t_lim, n_levels, t_min,
                true_super, interpret, resolve=False, inc_vote=None,
                pure_any=False):
    if inc_vote is None:
        inc_vote = cs.spec.inc_vote
    packed, n, rows = _pack_rays(orig, direction, t_lim, cs.spec.prog_rows)
    out_cols = OUT_COLS_RESOLVE if resolve else OUT_COLS_PLAIN
    out = _packed_trace(cs, packed, n_levels, t_min, true_super, interpret,
                        resolve, inc_vote, pure_any=pure_any)

    def col(k):
        return out[:, k * LANES : (k + 1) * LANES].reshape(-1)[:n]

    t = col(0)
    idx = jax.lax.bitcast_convert_type(
        out[:, LANES : 2 * LANES], jnp.int32
    ).reshape(-1)[:n]
    hit = idx >= 0
    if pure_any:
        # visibility pools only read the hit bit; t/u/v slots are parked
        return (hit, jnp.zeros_like(t), jnp.where(hit, 0, -1),
                jnp.zeros_like(t), jnp.zeros_like(t))
    if cs.spec.keypack and not resolve:
        u, v = _uv_from_hit(cs, idx, t, orig[:n], direction[:n])
        u = jnp.where(hit, u, 0.0)
        v = jnp.where(hit, v, 0.0)
    else:
        u = col(2)
        v = col(3)
    tri = jnp.take(cs.tri_remap, jnp.maximum(idx, 0))
    base = (hit, jnp.where(hit, t, 0.0), jnp.where(hit, tri, -1), u, v)
    if not resolve:
        return base
    # hit position reconstructed from the ray (not carried by the kernel);
    # zero on miss lanes to keep the HitAttrs contract
    pos = jnp.where(
        hit[:, None], orig[:n] + t[:, None] * direction[:n], 0.0
    )
    attrs = (
        pos,
        jnp.stack([col(4), col(5), col(6)], axis=-1),    # nrm (unnormalized)
        jnp.stack([col(7), col(8), col(9)], axis=-1),    # tan (unnormalized)
        col(10),                                          # tan w
        jnp.stack([col(11), col(12)], axis=-1),           # uv
        col(13).astype(jnp.int32),                        # mat id
    )
    return base + attrs


class PallasTracer(NamedTuple):
    """Trace backend running the fused cluster-vote kernel."""

    cs: ClusterScene
    interpret: bool
    # None = follow cs.spec.inc_vote; _replace for in-process A/B sweeps
    inc_vote: bool = None

    @property
    def spec(self) -> TraceSpec:
        """The kernel configuration this tracer's scene was packed for."""
        return self.cs.spec

    @property
    def resolves_attrs(self) -> bool:
        """True when ``closest_surface`` is available (attr tables resident)."""
        return bool(self.cs.attr_cols)

    def _call(self, orig, direction, t_min, t_lim, resolve=False,
              pure_any=False):
        counts = self.cs.level_counts
        true_super = counts[-2] if len(counts) > 1 else counts[-1]
        return _trace_call(
            self.cs, orig, direction, t_lim,
            len(counts), float(t_min), true_super, self.interpret,
            resolve=resolve, inc_vote=self.inc_vote, pure_any=pure_any,
        )

    def closest(self, orig, direction, t_min, t_max, t_lim=None):
        """Closest hit. ``t_lim``: optional per-ray tMax override (used by
        fused shadow+bounce batches)."""
        from vkrt_tpu.ops.trace import HitInfo

        if t_lim is None:
            t_lim = jnp.broadcast_to(
                jnp.asarray(t_max, orig.dtype), orig.shape[:1]
            )
        hit, t, tri, u, v = self._call(orig, direction, t_min, t_lim)
        return HitInfo(hit=hit, t=t, tri=tri, u=u, v=v)

    def closest_surface(self, orig, direction, t_min, t_max, t_lim=None):
        """Closest hit + in-kernel-resolved shading attributes.

        Returns (HitInfo, HitAttrs); attr fields are raw interpolants
        (normal/tangent unnormalized, Gram-Schmidt done by the shading
        stage) and are zero on miss lanes. Requires ``resolves_attrs``.
        """
        from vkrt_tpu.ops.trace import HitAttrs, HitInfo

        assert self.cs.attr_cols, "scene attribute tables not resident"
        if t_lim is None:
            t_lim = jnp.broadcast_to(
                jnp.asarray(t_max, orig.dtype), orig.shape[:1]
            )
        hit, t, tri, u, v, pos, nrm, tan, tan_w, uv, mat = self._call(
            orig, direction, t_min, t_lim, resolve=True
        )
        return (
            HitInfo(hit=hit, t=t, tri=tri, u=u, v=v),
            HitAttrs(pos=pos, nrm=nrm, tan=tan, tan_w=tan_w, uv=uv, mat=mat),
        )

    # fused shadow+bounce callers may negate shadow lanes' t_lim for the
    # kernel's first-hit-kills mode (see _trace_kernel); gate on this so
    # oracle/alpha tracers (which need closest semantics) are never fed
    # negative limits
    @property
    def anyhit_kill_capable(self) -> bool:
        return True

    def any(self, orig, direction, t_min, t_max):
        """Any-hit (shadow/visibility); ``t_max`` may be per-ray.

        Limits are negated into the kernel's first-hit-kills mode: a lane
        stops tracing at its first hit instead of searching for the
        closest (zero-limit skip lanes stay -0.0 = closest-mode bound 0,
        i.e. still skipped). An all-anykill pool additionally runs the
        PURE_ANY-specialized row path (no winner/u/v machinery)."""
        t_lim = jnp.broadcast_to(
            jnp.asarray(t_max, orig.dtype), orig.shape[:1]
        )
        hit, _, _, _, _ = self._call(
            orig, direction, t_min, -jnp.abs(t_lim),
            pure_any=self.spec.pure_any,
        )
        return hit

    def closest_packed(self, rays_packed, t_min):
        """Fully-packed closest trace with attribute resolve: rays as
        (R, 7*128) [o|d|t_lim] blocks -> (R, OUT_COLS_RESOLVE*128) hit
        blocks. The zero-unpack path used by the Pallas shade kernel
        (ops.pallas.shade)."""
        assert self.cs.attr_cols, "scene attribute tables not resident"
        counts = self.cs.level_counts
        true_super = counts[-2] if len(counts) > 1 else counts[-1]
        return _trace_call_packed(
            self.cs, rays_packed, len(counts), float(t_min), true_super,
            self.interpret, resolve=True, inc_vote=self.inc_vote,
        )

    def closest_packed_plain(self, rays_packed, t_min, pure_any=False):
        """Packed trace WITHOUT attribute resolve: (R, 7*128) rays ->
        (R, OUT_COLS_PLAIN*128) [t|idx|u|v]. Shadow/visibility pools use
        this — resolve's per-visit tile machinery (26 attr tiles + winner
        interpolation) measured 2x the whole plain traversal on incoherent
        pools, and a shadow verdict only reads idx >= 0.

        ``pure_any``: caller asserts every live lane is a first-hit-kills
        visibility query whose consumer only reads "idx >= 0" (the shade
        loop's split shadow pools) — runs the PURE_ANY-specialized row path
        (no winner/u/v machinery; t parks at -INF on hit)."""
        counts = self.cs.level_counts
        true_super = counts[-2] if len(counts) > 1 else counts[-1]
        return _trace_call_packed(
            self.cs, rays_packed, len(counts), float(t_min), true_super,
            self.interpret, resolve=False, inc_vote=self.inc_vote,
            pure_any=pure_any and self.spec.pure_any,
        )


def tracer_arrays(pt: PallasTracer):
    """The tracer's device arrays as one pytree (all-jnp leaves).

    Pose animation support: a jitted frame step that takes this pytree as
    an ARGUMENT (static config stays in the closure via the tracer
    prototype) keeps a stable treedef/avals across re-poses, so
    ``engine.set_node_transform`` never retraces — the TLAS-update analog
    becomes frame-loop-viable (the reference re-records the instance
    buffer per pose, hello_vulkan.cpp:1031-1047)."""
    cs = pt.cs
    return (cs.tri_cols, cs.level_aabb, cs.level_order, cs.cluster_aabb,
            cs.tri_remap, cs.sup_oct_aabb, cs.sup_oct_id, cs.attr_cols,
            cs.group_aabb)


def tracer_with_arrays(proto: PallasTracer, arrs) -> PallasTracer:
    """Rebind a tracer prototype's static config to fresh device arrays
    (inverse of ``tracer_arrays``; shapes/treedef must match)."""
    cs = proto.cs._replace(
        tri_cols=tuple(arrs[0]), level_aabb=tuple(arrs[1]),
        level_order=tuple(arrs[2]), cluster_aabb=arrs[3], tri_remap=arrs[4],
        sup_oct_aabb=arrs[5], sup_oct_id=arrs[6], attr_cols=tuple(arrs[7]),
        group_aabb=arrs[8],
    )
    return proto._replace(cs=cs)


def make_pallas_tracer(scene, interpret: bool = None,
                       spec: TraceSpec = None) -> PallasTracer:
    from vkrt_tpu.utils.hostmirror import asnumpy

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if spec is None:
        spec = spec_for_scene(int(scene.tri_v0.shape[0]))
    # host mirrors: the whole cluster build is numpy work; pulling the
    # device copies instead cost the tunnel's one-time ~100 s transfer
    # init inside make_tracer (utils/hostmirror.py)
    cs = build_cluster_scene(
        asnumpy(scene.tri_v0), asnumpy(scene.tri_e1), asnumpy(scene.tri_e2),
        attrs=(asnumpy(scene.corner_normal), asnumpy(scene.corner_tangent),
               asnumpy(scene.corner_uv), asnumpy(scene.tri_mat)),
        spec=spec,
    )
    return PallasTracer(cs=cs, interpret=interpret)
