"""Pallas TPU megakernel: the full Whitted DFS per pixel tile.

The performance engine.  One kernel instance owns a (SUBLANES x 128) block
of pixels and runs the reference's complete per-pixel traversal
(raytracing.cl:14-195) — primary-ray generation (raygen.cl:5-25), the
depth-first reflect/refract stack machine, Phong direct lighting with
xorshift32 soft shadows — to completion in VMEM registers, with lane-wise
masks in place of the reference's branches.  Tiles exit their loop as soon
as *their* worst lane finishes, which is what the whole-image XLA while-loop
cannot do: straggler pixels (glass/mirror chains) only stall their own
16x128 neighborhood.

Design constraints that shaped this kernel (see /opt/skills/guides/
pallas_guide.md):

* No general gather in VMEM -> data-dependent texel fetches (plane textures,
  the 50 MB skybox cross) cannot run in-kernel.  Both are *terminal additive*
  contributions in the reference shading model — material rgb only ever
  multiplies the ambient term (raytracing.cl:83-84), and sky radiance ends a
  chain (raytracing.cl:61-81) — so the kernel instead emits bounded
  per-lane (flat_texel_index, weight) **event records**, and one XLA gather
  outside the kernel resolves them against a packed u32 atlas
  (textures ++ skybox).  Everything else (light-hit colors, untextured
  ambient, diffuse/specular, Schlick, refraction) is computed in-kernel via
  one-hot contractions over the tiny primitive tables.
* Scene + camera basis live in SMEM as one flat f32 "uniform" array --
  value changes (camera motion, scene optimization) re-invoke the same
  executable, like the reference re-binding 6 camera scalars per keypress
  (rayinteractive.c:98-103).
* The per-lane ray stack ((max_depth, S, 128) register arrays) is
  indexed with one-hot selects over the depth axis, the Pallas analog of
  trace.py's _stack_set/_stack_get.

Event capacity: a depth-D DFS visits at most 2^(D+1)-1 nodes and each step
emits at most one event, so K = 2^(D+1)-1 is exact for shallow depths; for
deep traces K is capped and an overflow counter is returned (overflowed
events drop terminal contributions with tiny throughput; the golden-parity
path uses the XLA tracer).
"""
from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import PerspectiveBasis
from ..config import RenderConfig
from ..scene import Scene
from ..textures import SceneAssets

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

SUBLANES = 16
LANES = 128
TILE = SUBLANES * LANES

EV_NONE = np.int32(-1)

# Event-resolve chunking: XLA materializes the row-gather intermediate
# ([E, 64] u32, 256 B/event) when the one-hot select does not fuse into
# the gather, so _resolve_events processes at most CHUNK_EV events per
# step.  9M events = a 2.3 GB temp: the dense width-2 tier runs direct
# through 1080p (4.1M events) and splits into two chunks at 4K (16.6M —
# measured 151.9 ms total, the chunk pad costs ~8%), while the
# adversarial wide dense-fallback branches (which would otherwise
# allocate tens of GB) stay compilable.  Module-level so tests can
# monkeypatch it to exercise the chunked path at test sizes.
CHUNK_EV = 9_000_000

# XLA:TPU lowers the fused one-hot row-gather (jnp.take of [R, 64] atlas
# rows + in-register lane select, see _resolve_events) to a DMA fast path
# only when the gather is LARGE: measured ~2.2-2.9 ns/element above
# ~3.1M elements and ~11-12 ns/element below it (scripts/bench_gather.py
# and the round-3 cliff study; the threshold sits between 2.6M and 3.1M
# elements and is insensitive to index order, index-array shape, and
# table size).  Gathers bigger than GATHER_PAD_MIN are therefore PADDED
# up to GATHER_FAST_ELEMS with EV_NONE events (weight 0, row-0 fetches):
# N*11.4ns > GATHER_FAST_ELEMS*2.2ns crosses over at ~0.6M elements.
GATHER_FAST_ELEMS = 3_145_728
# Below the cliff a flat ELEMENT gather (~7 ns/element, size-independent)
# beats the unpadded row-gather (~11 ns) — and padding a row-gather up to
# the cliff only beats 7 ns/element above ~1M elements
# (7 ns * N > 2.2 ns * GATHER_FAST_ELEMS at N ~ 0.99M), so small-image
# resolves (stage 1: 65k events) use the element path (r5; was the
# stage-1 constant-cost item, ROADMAP 3 / VERDICT r4 item 8)
ELEM_GATHER_MAX = 1_000_000
GATHER_PAD_MIN = ELEM_GATHER_MAX


# ---------------------------------------------------------------------------
# uniform packing: scene + camera basis -> one flat f32 array (SMEM)
# ---------------------------------------------------------------------------

class UniformLayout(NamedTuple):
    """Static offsets into the flat uniform array (python ints, baked into
    the kernel at trace time; sizes depend only on scene topology)."""
    n_spheres: int
    n_planes: int
    n_lights: int
    size: int
    off: dict


_MAT_FIELDS = ("rgb0", "rgb1", "rgb2", "ambient", "diffuse", "specular",
               "shininess", "transparent", "dielectric", "n", "reflectivity",
               "texture_id", "texture_scale")


def uniform_layout(n_spheres: int, n_planes: int, n_lights: int
                   ) -> UniformLayout:
    off = {}
    cur = 0

    def alloc(name, count):
        nonlocal cur
        off[name] = cur
        cur += count

    alloc("basis", 14)          # corner3, origin3, up3, right3, wf, hf
    alloc("row0", 1)            # first image row of this shard (0 unsharded)
    alloc("sph_o", 3 * n_spheres)
    alloc("sph_r", n_spheres)
    for f in _MAT_FIELDS:
        alloc("sph_" + f, n_spheres)
    alloc("pl_nrm", 3 * n_planes)   # geometry keys distinct from
    alloc("pl_pt", 3 * n_planes)    # the material field "pl_n" (IoR)
    for f in _MAT_FIELDS:
        alloc("pl_" + f, n_planes)
    alloc("li_o", 3 * n_lights)
    alloc("li_r", n_lights)
    alloc("li_i", n_lights)
    alloc("li_rgb", 3 * n_lights)
    return UniformLayout(n_spheres, n_planes, n_lights, cur, off)


def _mat_values(mat, i):
    return (mat.rgb[i, 0], mat.rgb[i, 1], mat.rgb[i, 2], mat.ambient[i],
            mat.diffuse[i], mat.specular[i], mat.shininess[i],
            mat.transparent[i].astype(F32), mat.dielectric[i].astype(F32),
            mat.n[i], mat.reflectivity[i], mat.texture_id[i].astype(F32),
            mat.texture_scale[i])


def pack_uniforms(scene: Scene, basis: PerspectiveBasis,
                  lay: UniformLayout, row0=0.0) -> jnp.ndarray:
    """Flatten scene+basis into the uniform array (pure jnp: differentiable
    and jit-safe; value changes don't recompile).  ``row0`` is the global
    image row of this shard's first row (row sharding keeps ray dirs and
    the per-pixel RNG seed bit-identical to the unsharded render)."""
    parts = [basis.corner.astype(F32), basis.origin.astype(F32),
             basis.up.astype(F32), basis.right.astype(F32),
             jnp.stack([basis.w_factor.astype(F32),
                        basis.h_factor.astype(F32)]),
             jnp.asarray(row0, F32).reshape(1)]
    parts.append(scene.sphere_origin.reshape(-1).astype(F32))
    parts.append(scene.sphere_radius.astype(F32))
    sm = scene.sphere_mat
    for k in range(len(_MAT_FIELDS)):
        parts.append(jnp.stack([_mat_values(sm, i)[k]
                                for i in range(lay.n_spheres)]).astype(F32)
                     if lay.n_spheres else jnp.zeros((0,), F32))
    parts.append(scene.plane_normal.reshape(-1).astype(F32))
    parts.append(scene.plane_point.reshape(-1).astype(F32))
    pm = scene.plane_mat
    for k in range(len(_MAT_FIELDS)):
        parts.append(jnp.stack([_mat_values(pm, i)[k]
                                for i in range(lay.n_planes)]).astype(F32)
                     if lay.n_planes else jnp.zeros((0,), F32))
    parts.append(scene.light_origin.reshape(-1).astype(F32))
    parts.append(scene.light_radius.astype(F32))
    parts.append(scene.light_intensity.astype(F32))
    parts.append(scene.light_rgb.reshape(-1).astype(F32))
    return jnp.concatenate(parts)


# ---------------------------------------------------------------------------
# texel atlas: textures ++ skybox packed as one u32 rgb table
# ---------------------------------------------------------------------------

class TexelAtlas(NamedTuple):
    rows: jnp.ndarray     # [R, 64] u32 0x00RRGGBB (flat index i -> [i>>6, i&63])
    tex_h: int
    tex_w: int
    n_textures: int
    sky_base: int         # flat offset of skybox texels
    sky_h: int
    sky_w: int

    def flat(self) -> jnp.ndarray:
        """Flat [R*64] u32 view (trailing pad texels are zero/garbage;
        valid flat indices are < sky_base + sky_h*sky_w)."""
        return self.rows.reshape(-1)


def build_atlas(assets: SceneAssets) -> TexelAtlas:
    """Texel atlas metadata + the 64-wide row table the event resolve
    gathers from.  When ``assets.atlas_rows`` is precomputed (asset load
    time, textures.pack_atlas_rows) this is free inside a jit trace; the
    fallback packs in-graph (raw test assets)."""
    tex = assets.textures  # [N, H, W, 3] u8
    sky = assets.skybox    # [Hs, Ws, 3] u8

    if assets.atlas_rows is not None:
        rows = assets.atlas_rows
    else:
        def pack(img):
            u = img.astype(jnp.uint32)
            return (u[..., 0] << 16) | (u[..., 1] << 8) | u[..., 2]

        flat = jnp.concatenate([pack(tex).reshape(-1),
                                pack(sky).reshape(-1)])
        rows = jnp.pad(flat, (0, (-flat.shape[0]) % 64)).reshape(-1, 64)
    return TexelAtlas(rows=rows,
                      tex_h=tex.shape[1], tex_w=tex.shape[2],
                      n_textures=tex.shape[0],
                      sky_base=int(np.prod(tex.shape[:3])),
                      sky_h=sky.shape[0], sky_w=sky.shape[1])


# ---------------------------------------------------------------------------
# triangle meshes: per-block matmul constants (the megakernel's triangle
# extension; BASELINE.json config 5 — the reference has no triangles)
# ---------------------------------------------------------------------------

# triangles per matmul block.  128 measured best on stage 5 under the
# block-outer sweeps (tighter AABBs cut pairs 4x and the whole-tile cond
# amortizes the branch): 512 -> 52.5 ms, 128 -> 37.9 ms
TRI_TB = int(os.environ.get("TPURAY_TRI_TB", "128"))
TRI_ATTR_ROWS = 16    # nx, ny, nz + the 13 _MAT_FIELDS
TRI_TRANSP_ROW = 3 + _MAT_FIELDS.index("transparent")
# VMEM budget cap: b_lhs (160 B/tri) + attr (64 B/tri) + pair temps must
# leave room for the ray stacks and event buffers in ~16 MB of VMEM.
# Scenes above it stream triangle blocks through a double-buffered VMEM
# scratch from HBM instead (see _pallas_forward) up to
# TRI_STREAM_MAX_TRIANGLES; only beyond THAT does the engine fall back
# to the XLA tracer.
TRI_MAX_TRIANGLES = 32768
# streamed-path block size: chunky DMAs amortize the per-copy latency
# that TRI_TB-sized blocks cannot, but now that the stream path culls
# (r5: per-superblock DMA skipping + the whole-mesh level-0 cond),
# tighter 256-tri AABBs beat 512's bigger copies: 164k tris at 512x384
# d3 measured 390 ms @ 512 vs 228 ms @ 256
TRI_STREAM_TB = int(os.environ.get("TPURAY_TRI_STREAM_TB", "256"))
# block AABBs live in SMEM (6 f32 each); 2048 blocks keeps that at
# 48 KB.  256 * 2048 = 524,288 triangles, 16x the VMEM-resident cap
TRI_STREAM_MAX_BLOCKS = 2048
TRI_STREAM_MAX_TRIANGLES = TRI_STREAM_TB * TRI_STREAM_MAX_BLOCKS
_TRI_CULL = True      # debug toggle: False = brute-force every block
# MXU passes for the Moller-Trumbore bilinear forms (see tri_pair_ts):
# highest = 6-pass f32 emulation, high = 3-pass (~f32 mantissa via
# bf16x3 — halves the closest-sweep matmul cost), default = 1-pass bf16
_TRI_PREC_CHOICES = {
    # Mosaic's dot lowering supports only DEFAULT (1-pass bf16) and
    # HIGHEST (6-pass f32 emulation); Precision.HIGH raises
    # NotImplementedError inside pallas_call (measured round 5).
    # 'bf16x3' is a manual 3-pass hi/lo split (see tri_pair_ts): ~16-bit
    # mantissa on det/t at half HIGHEST's MXU cost — the default since
    # r5 (mesh parity tests pass at the same tolerances as HIGHEST)
    "default": jax.lax.Precision.DEFAULT,
    "bf16x3": "bf16x3",
    "highest": jax.lax.Precision.HIGHEST,
}
_TRI_T_PREC_NAME = os.environ.get("TPURAY_TRI_T_PREC", "bf16x3")
if _TRI_T_PREC_NAME not in _TRI_PREC_CHOICES:
    raise ValueError(
        f"TPURAY_TRI_T_PREC={_TRI_T_PREC_NAME!r} is not one of "
        f"{sorted(_TRI_PREC_CHOICES)}")
_TRI_DOT_PRECISION = _TRI_PREC_CHOICES[_TRI_T_PREC_NAME]
# shadow feelers only need a boolean any-hit, not an accurate t, so
# their pair matmuls run single-pass bf16 (~2x whole-render speedup on
# mesh scenes).  bf16's absolute tn noise is ~0.4% of the |o|,|v0|
# feature magnitudes; the plane-distance guard below keeps that noise
# from self-shadowing faces, leaving only sub-sample boundary noise at
# shadow silhouettes
_TRI_FEELER_PRECISION = jax.lax.Precision.DEFAULT
_TRI_FEELER_PLANE_DIST = 0.05
# feeler queries per matmul: tv is [4*TB, TRI_FEELER_QCH*LANES] f32 live
# in VMEM (3.1 MB at QCH=3) next to the ray stacks
TRI_FEELER_QCH = int(os.environ.get("TPURAY_TRI_QCH", "3"))
# sublane rows per closest-hit pair matmul (tv is [4*TB, CGROUP*LANES]);
# block sweeps branch once per block on a whole-tile cull, then run all
# SUBLANES/CGROUP matmuls back-to-back (8 measured best at TB=128)
TRI_CGROUP = int(os.environ.get("TPURAY_TRI_CGROUP", "8"))
# sublane rows per feeler branch inside a hit block: the scalar sync
# per cond, not the pair matmuls, dominated at per-sublane granularity
# (measured: FG=1 36.7 ms, FG=2 33.8, FG=4 32.7 on stage 5; FG >= 8
# explodes Mosaic compile time).  Must divide SUBLANES
TRI_FGROUP = int(os.environ.get("TPURAY_TRI_FGROUP", "4"))
# blocks per superblock for the superblock-level AABB cull: one union slab
# test rejects TRI_SB blocks at once, so miss-heavy tiles (sky, geometry
# far off-axis) pay nblk/TRI_SB mask computes instead of nblk — the
# per-block mask arithmetic itself, not just the cond sync, is a real
# cost at [S, Q*L] feeler width.  Morton-sorted blocks keep the unions
# tight.  Applied on BOTH table modes: the streamed path drives its
# double-buffered DMA chain per visited superblock, so missed
# superblocks skip their block DMAs entirely (cull-aware streaming)
TRI_SB = int(os.environ.get("TPURAY_TRI_SB", "8"))
# winner-attribute one-hot pick precision (HIGHEST: normals/materials
# must not round to bf16; env knob exists to measure its cost)
_TRI_PICK_PRECISION = (jax.lax.Precision.DEFAULT
                       if int(os.environ.get("TPURAY_TRI_PICK_BF16", "0"))
                       else jax.lax.Precision.HIGHEST)
_TRI_DEBUG = int(os.environ.get("TPURAY_TRI_DEBUG", "0"))
# compacted hit-block lists (r5): sweeps precompute ALL block hits in
# one vectorized pass and loop over only the hit blocks — one scalar
# sync per HIT block instead of one per block.  0 restores the
# per-block cond machinery (A/B knob)
_TRI_COMPACT = int(os.environ.get("TPURAY_TRI_COMPACT", "1"))
# experiment: feeler blocks run all sublane groups unconditionally
# (skips the exact per-block mask + per-group conds; same results)
_TRI_FEELER_NOCOND = int(os.environ.get("TPURAY_TRI_FEELER_NOCOND", "0"))
# experiment: closest sweep trusts the compacted hit list and skips the
# per-block running-best recheck cond (same results, possibly more work)
_TRI_CLOSEST_NORECHECK = int(
    os.environ.get("TPURAY_TRI_CLOSEST_NORECHECK", "0"))


class TriBlocks(NamedTuple):
    b_lhs: jnp.ndarray   # [10, nblk*4*TB] Moller-Trumbore matmul blocks
    attr: jnp.ndarray    # [TRI_ATTR_ROWS, nblk*TB] winner-extraction table
    aabb: jnp.ndarray    # [nblk*6] per-block bounds (lo3 ++ hi3), SMEM
    nblk: int
    # cull hierarchy: union bounds of each TRI_SB-block superblock
    # ([nsb*6]) and of the whole mesh ([6]), appended after aabb in the
    # kernel's SMEM table.  Required (no defaults): build_tri_blocks
    # always populates them, and a missing field must fail at the
    # construction site, not as an opaque concatenate error deep in
    # _pallas_forward
    sb_aabb: jnp.ndarray
    nsb: int
    sc_aabb: jnp.ndarray
    # static: does ANY triangle have a transparent material?  False lets
    # the feeler sweep drop the whole transparency-weighting machinery
    # (wop select / weighted sum / mod / exp) for a plain any-hit and
    # skip the attr-block load (r5 opaque fast path).  Traced scenes
    # conservatively report True.
    has_transp: bool


def _mat_columns(mat, concrete: bool = False) -> list:
    """Material table as per-field [T] f32 columns, _MAT_FIELDS order.

    ``concrete=True`` slices host-side numpy copies so no trace ops touch
    the data (see build_tri_blocks on why that matters)."""
    if concrete:
        cv = lambda a: np.asarray(a, np.float32)     # noqa: E731
        rgb = cv(mat.rgb)
        return [rgb[:, 0], rgb[:, 1], rgb[:, 2], cv(mat.ambient),
                cv(mat.diffuse), cv(mat.specular), cv(mat.shininess),
                cv(mat.transparent), cv(mat.dielectric), cv(mat.n),
                cv(mat.reflectivity), cv(mat.texture_id),
                cv(mat.texture_scale)]
    return [mat.rgb[:, 0], mat.rgb[:, 1], mat.rgb[:, 2], mat.ambient,
            mat.diffuse, mat.specular, mat.shininess,
            mat.transparent.astype(F32), mat.dielectric.astype(F32),
            mat.n, mat.reflectivity, mat.texture_id.astype(F32),
            mat.texture_scale]


def build_tri_blocks(scene: Scene, tb: int = None) -> "TriBlocks | None":
    """Pure-jnp per-triangle constants for the in-kernel MXU intersection.

    Moller-Trumbore for ray (o, d) and triangle (v0, e1=v1-v0, e2=v2-v0):
        det   = -d . n                 (n = e1 x e2)
        t*det = o . n - v0 . n
        u*det = (o x d) . e2 + d . (v0 x e2)
        v*det = -(o x d) . e1 - d . (v0 x e1)
    i.e. every pair quantity is a dot of the ray features [o, d, o x d, 1]
    with a per-triangle 10-vector — columns of ``b_lhs``.  Both device
    tables keep the TRIANGLE axis on the 128-lane (minor) dim: a
    triangle-major layout pads the 10/16-wide minor dim to 128 lanes and
    wastes ~10x VMEM (a 7k-triangle scene overflows the 16 MB scoped
    budget).  Zero-padded columns are degenerate (det == 0 -> never hit);
    block AABBs pad with the last real triangle so culling stays tight.

    Concrete scenes are preprocessed on the HOST in numpy.  This is the
    natural place for per-scene table building, and it is also
    load-bearing: when the table computation is traced with the scene as
    a closed-over jit constant, XLA's constant folding on the axon
    backend silently drops the face-normal normalization (the kernel's
    attr buffer receives raw e1 x e2 while the identical computation
    read back on the host, or run with the scene as a jit argument, is
    correctly unit-length).  Tracers (scene passed as a jit/shard_map
    argument) take the equivalent jnp path, which compiles correctly."""
    t_count = scene.num_triangles
    if t_count == 0:
        return None
    tb = TRI_TB if tb is None else tb
    concrete = not any(
        isinstance(leaf, jax.core.Tracer)
        for leaf in jax.tree.leaves((scene.tri_v0, scene.tri_v1,
                                     scene.tri_v2, scene.tri_mat)))
    has_transp = True
    if concrete:
        has_transp = bool(np.any(
            np.asarray(scene.tri_mat.transparent) > 0.5))
    xp = np if concrete else jnp
    nblk = -(-t_count // tb)
    tp = nblk * tb
    pad = tp - t_count

    def as_f32(a):
        return np.asarray(a, np.float32) if concrete else a.astype(F32)

    v0 = as_f32(scene.tri_v0)
    v1 = as_f32(scene.tri_v1)
    v2 = as_f32(scene.tri_v2)
    z3 = xp.zeros((pad, 3), F32)
    v0z, v1z, v2z = (xp.concatenate([v, z3]) for v in (v0, v1, v2))
    e1 = v1z - v0z
    e2 = v2z - v0z
    n = xp.cross(e1, e2)
    # normalize every pair row by |n| (= 2*area): t = tn/det and all the
    # sign tests are scale-invariant, but it makes tn the SIGNED PLANE
    # DISTANCE of the ray origin times the direction cosine — the
    # feeler's bf16 self/adjacent-shadow guard keys on that (see
    # tri_pair_sum's plane-distance guard) — and conditions det as a direction
    # cosine so the 1e-7 degeneracy threshold means the same thing for
    # every triangle size
    inv_n = 1.0 / xp.maximum(
        xp.sqrt(xp.sum(n * n, axis=1, keepdims=True)), np.float32(1e-30))
    nrm = n * inv_n
    e1n = e1 * inv_n
    e2n = e2 * inv_n
    m1 = xp.cross(v0z, e2n)
    m2 = xp.cross(v0z, e1n)
    c0 = xp.sum(v0z * nrm, axis=1)

    zc = xp.zeros((tp, 3), F32)
    z1 = xp.zeros((tp, 1), F32)
    det_r = xp.concatenate([zc, -nrm, zc, z1], axis=1)
    tn_r = xp.concatenate([nrm, zc, zc, -c0[:, None]], axis=1)
    un_r = xp.concatenate([zc, m1, e2n, z1], axis=1)
    vn_r = xp.concatenate([zc, -m2, -e1n, z1], axis=1)
    full = xp.stack([det_r, tn_r, un_r, vn_r])               # [4, Tp, 10]
    b_lhs = full.reshape(4, nblk, tb, 10).transpose(3, 1, 0, 2) \
        .reshape(10, nblk * 4 * tb)

    nn = n * inv_n
    zpad = xp.zeros((pad,), F32)
    cols = [nn[:, 0], nn[:, 1], nn[:, 2]] + \
        [xp.concatenate([as_f32(c), zpad]) for c in
         _mat_columns(scene.tri_mat, concrete)]
    attr = xp.stack(cols)                                    # [16, Tp]

    rep = lambda v: xp.concatenate(                          # noqa: E731
        [v, xp.repeat(v[-1:], pad, axis=0)])
    v0e, v1e, v2e = rep(v0), rep(v1), rep(v2)
    lo = xp.minimum(xp.minimum(v0e, v1e), v2e) \
        .reshape(nblk, tb, 3).min(axis=1)
    hi = xp.maximum(xp.maximum(v0e, v1e), v2e) \
        .reshape(nblk, tb, 3).max(axis=1)
    aabb = xp.concatenate([lo, hi], axis=1).reshape(-1)      # [nblk*6]
    # superblock union bounds (two-level cull); pad with +/-INF so the
    # tail union ignores missing blocks
    nsb = -(-nblk // TRI_SB)
    sb_pad = nsb * TRI_SB - nblk
    lo_p = xp.concatenate([lo, xp.full((sb_pad, 3), np.float32(np.inf))])
    hi_p = xp.concatenate([hi, xp.full((sb_pad, 3), np.float32(-np.inf))])
    sb_lo = lo_p.reshape(nsb, TRI_SB, 3).min(axis=1)
    sb_hi = hi_p.reshape(nsb, TRI_SB, 3).max(axis=1)
    sb_aabb = xp.concatenate([sb_lo, sb_hi], axis=1).reshape(-1)
    # whole-mesh union (level-0 cull: one cond skips the entire sweep —
    # and, streamed, every block DMA — for tiles whose rays miss the mesh)
    sc_aabb = xp.concatenate([lo.min(axis=0), hi.max(axis=0)])
    if concrete:
        b_lhs = b_lhs.astype(np.float32)
        attr = attr.astype(np.float32)
        aabb = aabb.astype(np.float32)
        sb_aabb = sb_aabb.astype(np.float32)
        sc_aabb = sc_aabb.astype(np.float32)
    return TriBlocks(b_lhs=b_lhs, attr=attr, aabb=aabb, nblk=nblk,
                     sb_aabb=sb_aabb, nsb=nsb, sc_aabb=sc_aabb,
                     has_transp=has_transp)


# ---------------------------------------------------------------------------
# kernel-side vector helpers ((S,128) register triples)
# ---------------------------------------------------------------------------

def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    n2 = x * x + y * y + z * z
    inv = jax.lax.rsqrt(jnp.where(n2 > 0, n2, 1.0))
    inv = jnp.where(n2 > 0, inv, 0.0)
    return x * inv, y * inv, z * inv


def _xorshift32(state):
    """xorshift32 (primitives.cl:116-125) on the i32 bit pattern — Mosaic
    has no u32->f32 convert, so shifts are done signed (<< identical,
    >> via shift_right_logical) and the float sample rebuilds the unsigned
    value by adding 2^32 to negative i32s."""
    x = state
    x = x ^ (x << np.int32(13))
    x = x ^ jax.lax.shift_right_logical(x, np.int32(17))
    x = x ^ (x << np.int32(5))
    fx = x.astype(F32)
    fx = jnp.where(fx < 0, fx + np.float32(4294967296.0), fx)
    # primitives.cl:124 — maps the u32 range onto [0, 4)
    sample = fx / np.float32(2147483648.0) * np.float32(2.0)
    return x, sample


def _map_to_cube(dx, dy, dz, face: int):
    """primitives.cl:14-109 on (S,128) registers; returns integer u, v."""
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    fs = np.int32(face)
    fsf = np.float32(face)

    m = jnp.ones_like(dx)
    uc = jnp.zeros_like(dx)
    vc = jnp.zeros_like(dx)
    su = jnp.zeros_like(dx, I32)
    sv = jnp.zeros_like(dx, I32)

    def app(cond, mm, u, v, s_u, s_v):
        nonlocal m, uc, vc, su, sv
        m = jnp.where(cond, mm, m)
        uc = jnp.where(cond, u, uc)
        vc = jnp.where(cond, v, vc)
        su = jnp.where(cond, np.int32(s_u), su)
        sv = jnp.where(cond, np.int32(s_v), sv)

    xp, yp, zp = dx > 0, dy > 0, dz > 0
    app(xp & (ax >= ay) & (ax >= az), ax, -dz, dy, fs * 2, fs)
    app(~xp & (ax >= ay) & (ax >= az), ax, dz, dy, 0, fs)
    app(yp & (ay >= ax) & (ay >= az), ay, dx, -dz, fs, fs * 2)
    app(~yp & (ay >= ax) & (ay >= az), ay, dx, dz, fs, 0)
    app(zp & (az >= ax) & (az >= ay), az, dx, dy, fs, fs)
    app(~zp & (az >= ax) & (az >= ay), az, -dx, dy, fs * 3, fs)

    safe = jnp.where(m != 0, m, 1.0)
    fu = 0.5 * (uc / safe + 1.0)
    fv = 0.5 * (vc / safe + 1.0)
    u = su + (fu * fsf).astype(I32)
    v = sv + (fv * fsf).astype(I32)
    return u, v


def _map_to_cube_float(dx, dy, dz, face: int):
    """Continuous cubemap coords on (S,128) registers — the bilinear
    analog of :func:`_map_to_cube` (truncating reproduces it); matches
    primitives.map_to_cube_float."""
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    fs = np.int32(face)
    fsf = np.float32(face)

    m = jnp.ones_like(dx)
    uc = jnp.zeros_like(dx)
    vc = jnp.zeros_like(dx)
    su = jnp.zeros_like(dx, I32)
    sv = jnp.zeros_like(dx, I32)

    def app(cond, mm, u, v, s_u, s_v):
        nonlocal m, uc, vc, su, sv
        m = jnp.where(cond, mm, m)
        uc = jnp.where(cond, u, uc)
        vc = jnp.where(cond, v, vc)
        su = jnp.where(cond, np.int32(s_u), su)
        sv = jnp.where(cond, np.int32(s_v), sv)

    xp, yp, zp = dx > 0, dy > 0, dz > 0
    app(xp & (ax >= ay) & (ax >= az), ax, -dz, dy, fs * 2, fs)
    app(~xp & (ax >= ay) & (ax >= az), ax, dz, dy, 0, fs)
    app(yp & (ay >= ax) & (ay >= az), ay, dx, -dz, fs, fs * 2)
    app(~yp & (ay >= ax) & (ay >= az), ay, dx, dz, fs, 0)
    app(zp & (az >= ax) & (az >= ay), az, dx, dy, fs, fs)
    app(~zp & (az >= ax) & (az >= ay), az, -dx, dy, fs * 3, fs)

    safe = jnp.where(m != 0, m, 1.0)
    fu = 0.5 * (uc / safe + 1.0)
    fv = 0.5 * (vc / safe + 1.0)
    return su.astype(F32) + fu * fsf, sv.astype(F32) + fv * fsf


def _plane_basis(nx, ny, nz):
    """primitives.cl:219-235 for scalar plane normal components."""
    # cross(e_i, n) for i = 0,1,2; pick the first with nonzero comp-sum
    c0 = (0.0 * nx, -nz, ny)
    c1 = (nz, 0.0 * nx, -nx)
    c2 = (-ny, nx, 0.0 * nx)
    s0 = c0[0] + c0[1] + c0[2]
    s1 = c1[0] + c1[1] + c1[2]

    b0x = jnp.where(s0 != 0, c0[0], jnp.where(s1 != 0, c1[0], c2[0]))
    b0y = jnp.where(s0 != 0, c0[1], jnp.where(s1 != 0, c1[1], c2[1]))
    b0z = jnp.where(s0 != 0, c0[2], jnp.where(s1 != 0, c1[2], c2[2]))
    # b1 = cross(n, b0)
    b1x = ny * b0z - nz * b0y
    b1y = nz * b0x - nx * b0z
    b1z = nx * b0y - ny * b0x
    return (b0x, b0y, b0z), (b1x, b1y, b1z)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(lay: UniformLayout, atlas_meta: Tuple, cfg: RenderConfig,
                 width: int, height: int, gx: int, nblk: int = 0,
                 record: bool = False, stream: bool = False,
                 tb: int = TRI_TB, tri_opaque: bool = False):
    """Builds the tile kernel closure.  All loop bounds / offsets static.

    v2 structure (after profiling the v1 kernel at ~116 us/DFS-step):
    * every SMEM uniform is prefetched ONCE before the while loop — v1
      re-read + re-broadcast them inside the body every step;
    * the 12 per-lane ray-stack arrays live in VMEM scratch, not in the
      while carry (v1 carried ~2*(14 + 12*D) vregs, far beyond the register
      file, so every iteration spilled the full stack);
    * stack writes/reads and event writes are wrapped in whole-tile
      ``@pl.when``/``lax.cond`` guards so steps without pushes/pops/events
      skip the VMEM traffic;
    * per-primitive (hit, t) pairs are computed once per step and shared
      between the light-occlusion test and the closest-solid query (v1
      intersected everything twice);
    * the whole direct-lighting block (the 3 lights x 2 soft-shadow samples
      x all-primitives feeler storm) is skipped when no lane in the tile
      hit a solid this step.
    """
    tex_h, tex_w, n_tex, sky_base, sky_h, sky_w = atlas_meta
    ns, npl, nl = lay.n_spheres, lay.n_planes, lay.n_lights
    D = cfg.max_depth
    K = cfg.resolved_event_slots()
    # numpy scalars: python-level constants folded into the kernel (a
    # jnp scalar would be a captured traced constant, which pallas rejects)
    Krec = cfg.resolved_record_slots() if record else 0
    wide_ids = record and stream
    bilinear = cfg.filter == "bilinear"
    eps = np.float32(cfg.epsilon)
    through = np.float32(cfg.transparent_through)
    default_n = np.float32(cfg.default_n)
    n_samples = cfg.shadow_samples
    inv_pi = np.float32(1.0 / np.pi)
    two_pi = np.float32(2.0 * np.pi)
    pi = np.float32(np.pi)
    INF = np.float32(np.inf)

    NF = 11  # f32 stack planes: o(3), d(3), c(3), f, n

    _counts = {"basis": 14, "row0": 1, "sph_o": 3 * ns, "sph_r": ns,
               "pl_nrm": 3 * npl, "pl_pt": 3 * npl,
               "li_o": 3 * nl, "li_r": nl, "li_i": nl, "li_rgb": 3 * nl}
    for _f in _MAT_FIELDS:
        _counts["sph_" + _f] = ns
        _counts["pl_" + _f] = npl

    def kernel(*refs):
        if nblk:
            # triangle scenes: AABBs in SMEM (per-block slab tests) AND
            # as a [8, NBP] VMEM table (the vectorized all-blocks cull
            # behind the compacted hit-block list); matmul blocks +
            # attrs in VMEM, or (stream mode, > TRI_MAX_TRIANGLES) in
            # HBM as [nblk, 10, 4*TB] / [nblk, ATTR, TB] arrays DMA'd
            # through a double-buffered VMEM scratch, one block ahead
            # of compute
            uni, tri_aabb, tri_aabb_v, tri_b, tri_attr = refs[:5]
            outs = refs[5:]
        else:
            uni = refs[0]
            tri_aabb = tri_aabb_v = tri_b = tri_attr = None
            outs = refs[1:]
        tri_buf_b = tri_buf_attr = tri_sem = None
        if nblk and stream:
            tri_buf_b, tri_buf_attr, tri_sem = outs[-3:]
            outs = outs[:-3]
        wid_out = None
        if record and wide_ids:
            # streamed scenes: winner ids exceed the packed record's 15
            # bits, so they get their own i32 plane
            (c_out, ev_idx_out, ev_w_out, over_out, rec_out, ssr_out,
             wid_out, stk_f, stk_i, stk_p) = outs
        elif record:
            (c_out, ev_idx_out, ev_w_out, over_out, rec_out, ssr_out,
             stk_f, stk_i, stk_p) = outs
        else:
            c_out, ev_idx_out, ev_w_out, over_out, stk_f, stk_i = outs
            rec_out = ssr_out = stk_p = None
        ty = pl.program_id(0)
        tx = pl.program_id(1)

        # ---- prefetch every uniform once (loop-invariant scalars) ----
        U = {k: [uni[lay.off[k] + i] for i in range(c)]
             for k, c in _counts.items()}

        def u(name, i=0):
            return U[name][i]

        # ---- raygen (raygen.cl:10-24) ----
        srow = jax.lax.broadcasted_iota(I32, (SUBLANES, LANES), 0)
        lcol = jax.lax.broadcasted_iota(I32, (SUBLANES, LANES), 1)
        row = ty * SUBLANES + srow
        col = tx * LANES + lcol
        # global row: local row + the shard's first row (0 unsharded), so
        # row-sharded renders keep bit-identical dirs and RNG pixel ids
        row_g = row + u("row0").astype(I32)
        pid = row_g * width + col
        in_image = (row < height) & (col < width)

        w_scale = u("basis", 12) * col.astype(F32)
        h_scale = u("basis", 13) * row_g.astype(F32)
        vx = u("basis", 0) + u("basis", 9) * w_scale - u("basis", 6) * h_scale
        vy = u("basis", 1) + u("basis", 10) * w_scale - u("basis", 7) * h_scale
        vz = u("basis", 2) + u("basis", 11) * w_scale - u("basis", 8) * h_scale
        dx, dy, dz = _normalize(vx, vy, vz)
        ox = jnp.full((SUBLANES, LANES), u("basis", 3))
        oy = jnp.full((SUBLANES, LANES), u("basis", 4))
        oz = jnp.full((SUBLANES, LANES), u("basis", 5))

        zero = jnp.zeros((SUBLANES, LANES), F32)
        izero = jnp.zeros((SUBLANES, LANES), I32)

        ev_idx_out[:] = jnp.full((K * SUBLANES, LANES), EV_NONE)
        ev_w_out[:] = jnp.zeros((K * SUBLANES, LANES), F32)
        stk_f[:] = jnp.zeros((NF * D * SUBLANES, LANES), F32)
        stk_i[:] = jnp.zeros((D * SUBLANES, LANES), I32)
        if record:
            rec_out[:] = jnp.full((Krec * SUBLANES, LANES), EV_NONE)
            ssr_out[:] = jnp.zeros((nl * Krec * SUBLANES, LANES), F32)
            stk_p[:] = jnp.zeros((D * SUBLANES, LANES), I32)
            if wide_ids:
                wid_out[:] = jnp.zeros((Krec * SUBLANES, LANES), I32)

        # row-of-stack -> level label, for masked level-indexed access
        lev_row = jax.lax.broadcasted_iota(
            I32, (D * SUBLANES, LANES), 0) // np.int32(SUBLANES)
        levK_row = jax.lax.broadcasted_iota(
            I32, (K * SUBLANES, LANES), 0) // np.int32(SUBLANES)
        if record:
            levR_row = jax.lax.broadcasted_iota(
                I32, (Krec * SUBLANES, LANES), 0) // np.int32(SUBLANES)

        def tile_r(x):
            return jnp.tile(x, (Krec, 1))

        def tile_d(x):
            return jnp.tile(x, (D, 1))

        # ---- per-primitive quadratic / plane tests (shared helpers) ----
        def sphere_t(i, px, py, pz, qx, qy, qz):
            """intersect_sphere w/ far-root rule (primitives.cl:170-195)."""
            cx0, cy0, cz0 = u("sph_o", 3 * i), u("sph_o", 3 * i + 1), \
                u("sph_o", 3 * i + 2)
            r = u("sph_r", i)
            vx0, vy0, vz0 = px - cx0, py - cy0, pz - cz0
            a = _dot(qx, qy, qz, qx, qy, qz)
            b = 2.0 * _dot(vx0, vy0, vz0, qx, qy, qz)
            c = _dot(vx0, vy0, vz0, vx0, vy0, vz0) - r * r
            disc = b * b - 4.0 * a * c
            has = disc >= 0
            sq = jnp.sqrt(jnp.where(has, disc, 0.0))
            t_near = (-b - sq) / (2.0 * a)
            t_far = (-b + sq) / (2.0 * a)
            t = jnp.where(t_near < 0, t_far, t_near)
            return has & (t > 0), t

        def plane_t(i, px, py, pz, qx, qy, qz):
            nx, ny, nz = u("pl_nrm", 3 * i), u("pl_nrm", 3 * i + 1), \
                u("pl_nrm", 3 * i + 2)
            ppx, ppy, ppz = u("pl_pt", 3 * i), u("pl_pt", 3 * i + 1), \
                u("pl_pt", 3 * i + 2)
            b = _dot(qx, qy, qz, nx, ny, nz)
            safe_b = jnp.where(b == 0, 1.0, b)
            t = _dot(ppx - px, ppy - py, ppz - pz, nx, ny, nz) / safe_b
            return (b != 0) & (t > 0), t

        def light_t(i, px, py, pz, qx, qy, qz):
            cx0, cy0, cz0 = u("li_o", 3 * i), u("li_o", 3 * i + 1), \
                u("li_o", 3 * i + 2)
            r = u("li_r", i)
            vx0, vy0, vz0 = px - cx0, py - cy0, pz - cz0
            a = _dot(qx, qy, qz, qx, qy, qz)
            b = 2.0 * _dot(vx0, vy0, vz0, qx, qy, qz)
            c = _dot(vx0, vy0, vz0, vx0, vy0, vz0) - r * r
            disc = b * b - 4.0 * a * c
            has = disc >= 0
            sq = jnp.sqrt(jnp.where(has, disc, 0.0))
            t_near = (-b - sq) / (2.0 * a)
            t_far = (-b + sq) / (2.0 * a)
            t = jnp.where(t_near < 0, t_far, t_near)
            return has & (t > 0), t

        # per-plane texture bases are ray-independent: compute once
        plane_bases = []
        for i in range(npl):
            plane_bases.append(_plane_basis(
                u("pl_nrm", 3 * i), u("pl_nrm", 3 * i + 1),
                u("pl_nrm", 3 * i + 2)))

        # ---- brute-force ray x triangle queries on the MXU ----------------
        # Moller-Trumbore's det / t*det / u*det / v*det are bilinear in the
        # per-ray features [o, d, o x d, 1] and per-triangle constants
        # [n, v0 x e2, v0 x e1, e1, e2, v0.n], so one [10,128] feature
        # matrix per sublane row against a [4*TB, 10] triangle block gives
        # every pair quantity in a single MXU matmul; validity uses the
        # sign trick (u >= 0 <=> u_num*det >= 0).  Matches the XLA path
        # (primitives.py:intersect_triangle) up to matmul rounding; same
        # brute-force no-BVH model as the reference's closest-hit loop
        # (primitives.cl:322-394), generalized to triangles.
        TB = tb
        A_ROWS = TRI_ATTR_ROWS

        # ---- triangle-table access: VMEM-resident vs HBM-streamed ----
        if nblk and stream:
            def tri_dma(b):
                """(b_lhs, attr) copies of block b into VMEM slot b%2.
                Slot strides are 16 sublanes (10 b_lhs rows padded) so
                Mosaic can prove the dynamic offsets 8-aligned."""
                slot = jax.lax.rem(b, 2)
                return (pltpu.make_async_copy(
                            tri_b.at[b],
                            tri_buf_b.at[pl.ds(slot * 16, 16), :],
                            tri_sem.at[slot, 0]),
                        pltpu.make_async_copy(
                            tri_attr.at[b],
                            tri_buf_attr.at[pl.ds(slot * A_ROWS, A_ROWS), :],
                            tri_sem.at[slot, 1]))

            def tri_stream_start(b):
                for c in tri_dma(b):
                    c.start()

            def tri_wait(b):
                """Wait block b's copies; slot for tri_load.  Every
                started copy is waited exactly once: starts/waits are
                driven by tri_sweep's segment loop, UNCONDITIONALLY per
                visited block (the per-block cull cond only guards the
                compute)."""
                for c in tri_dma(b):
                    c.wait()
                return jax.lax.rem(b, 2)

            def tri_load(b, slot, attrs=True):
                """(blk [10, 4*TB], attr [ATTR, TB]) for block b — reads
                the VMEM slot tri_wait(b) returned; call inside the hit
                branch so culled blocks skip the VMEM->register load.
                ``attrs=False`` skips the attr-table load (opaque
                feeler fast path)."""
                return (tri_buf_b[pl.ds(slot * 16, 10), :],
                        tri_buf_attr[pl.ds(slot * A_ROWS, A_ROWS), :]
                        if attrs else None)
        else:
            def tri_stream_start(b):
                pass

            def tri_wait(b):
                return b

            def tri_load(b, slot, attrs=True):
                return (tri_b[:, pl.ds(b * 4 * TB, 4 * TB)],
                        tri_attr[:, pl.ds(b * TB, TB)] if attrs else None)

        def tri_features(s, px, py, pz, qx, qy, qz):
            """[10, 128] feature matrix for sublane row s of a ray tile."""
            o1, o2, o3 = px[s:s + 1, :], py[s:s + 1, :], pz[s:s + 1, :]
            d1, d2, d3 = qx[s:s + 1, :], qy[s:s + 1, :], qz[s:s + 1, :]
            c1 = o2 * d3 - o3 * d2
            c2 = o3 * d1 - o1 * d3
            c3 = o1 * d2 - o2 * d1
            return jnp.concatenate(
                [o1, o2, o3, d1, d2, d3, c1, c2, c3,
                 jnp.ones((1, LANES), F32)], axis=0)

        def tri_pair_ts(blk, feat):
            """[TB, N] per-pair hit t for a loaded block (INF = no hit).

            Runs at bf16x3 by default (env-configurable via
            TPURAY_TRI_T_PREC=default|bf16x3|highest): single-pass bf16
            costs ~3 decimal digits on det/t — enough to flip edge sign
            tests and admit near-zero self-hit t values whose
            degenerate hit points NaN the view-vector normalize
            downstream.  bf16x3 splits both operands into hi + lo bf16
            halves (each exactly representable, so the DEFAULT dots are
            lossless) and sums hi@hi + hi@lo + lo@hi: ~16-bit mantissa
            at 3 MXU passes, i.e. half HIGHEST's 6-pass f32 emulation,
            the dropped lo@lo term bounded by ~2^-16 of the feature
            magnitudes.  (Shadow feelers, which only need a boolean
            any-hit, use the single-pass bf16 tri_pair_sum with its
            plane-distance guard instead.)

            Stream mode (TB = 512) keeps HIGHEST: bf16x3's three
            explicit [4*TB, N] partial products are 8 MB each at the
            streamed block size and blow the 16 MB scoped-VMEM budget
            (HIGHEST's passes accumulate inside the MXU op); the
            streamed path is DMA/sweep-bound, not matmul-bound."""
            if _TRI_DOT_PRECISION == "bf16x3" and not stream:
                dims = (((0,), (0,)), ((), ()))

                def hi_lo(x):
                    h = x.astype(jnp.bfloat16).astype(F32)
                    return h, x - h

                bh, bl_ = hi_lo(blk)
                fh, fl_ = hi_lo(feat)
                M = (jax.lax.dot_general(bh, fh, dims,
                                         preferred_element_type=F32)
                     + jax.lax.dot_general(bh, fl_, dims,
                                           preferred_element_type=F32)
                     + jax.lax.dot_general(bl_, fh, dims,
                                           preferred_element_type=F32))
            else:
                M = jax.lax.dot_general(
                    blk, feat, (((0,), (0,)), ((), ())),
                    preferred_element_type=F32,
                    precision=(jax.lax.Precision.HIGHEST
                               if _TRI_DOT_PRECISION == "bf16x3"
                               else _TRI_DOT_PRECISION))    # [4*TB, N]
            det = M[0 * TB:1 * TB, :]
            tn = M[1 * TB:2 * TB, :]
            un = M[2 * TB:3 * TB, :]
            vn = M[3 * TB:4 * TB, :]
            # the three non-strict sign tests min-combine into a single
            # compare (the feeler's tri_pair_sum trick)
            m3 = jnp.minimum(jnp.minimum(un * det, vn * det),
                             (det - un - vn) * det)
            okv = (m3 >= 0) & (tn * det > 0) \
                & (jnp.abs(det) > np.float32(1e-7))
            return jnp.where(okv, tn / jnp.where(det == 0, 1.0, det), INF)

        def tri_pair_sum(blk, feat, tmax, wop):
            """[1, N] weighted occluder sum for a feeler chunk.

            Division-free Moller-Trumbore validity, min-combined so the
            five sign tests cost 3 mins + 2 compares instead of five
            compare+and chains, then ONE weighted reduction: opaque
            occluders weigh W = 2*TB, transparent ones 1, so the caller
            recovers any-opaque-hit (sum >= W) and the transparent
            count (sum mod W) from a single [1, N] row — at most TB < W
            transparent hits per block keeps both fields exact for any
            block size (the streamed path runs TB = 512), and the worst
            sum TB*(2*TB+1) stays far below f32's 2^24 integer range.  The reference's source-
            triangle self-shadow risk is handled by the plane-distance
            guard alone: b_lhs rows are normalized by |n| so |tn| is the
            signed plane distance of the (eps-offset) origin — the
            source triangle's plane sits ~eps + bf16 noise away, well
            inside _TRI_FEELER_PLANE_DIST (the guard this constant was
            sized for); an explicit winner-id exclusion is redundant
            (verified against the XLA tracer, which has neither)."""
            M = jax.lax.dot_general(
                blk, feat, (((0,), (0,)), ((), ())),
                preferred_element_type=F32,
                precision=_TRI_FEELER_PRECISION)
            det = M[0 * TB:1 * TB, :]
            tn = M[1 * TB:2 * TB, :]
            un = M[2 * TB:3 * TB, :]
            vn = M[3 * TB:4 * TB, :]
            m3 = jnp.minimum(jnp.minimum(un * det, vn * det),
                             (det - un - vn) * det)
            m2 = jnp.minimum(tn * det, (tmax * det - tn) * det)
            rel = (m3 >= 0) & (m2 > 0) \
                & (jnp.abs(det) > np.float32(1e-7)) \
                & (jnp.abs(tn) > np.float32(_TRI_FEELER_PLANE_DIST))
            if tri_opaque:
                # any-hit only: every occluder fully blocks, no
                # transparency count to carry (r5 opaque fast path)
                return jnp.max(jnp.where(rel, 1.0, 0.0), axis=0,
                               keepdims=True)
            return jnp.sum(jnp.where(rel, wop, 0.0), axis=0,
                           keepdims=True)

        def tri_transp_col(attr_blk):
            """[TB, 1] per-triangle transparent flag for a loaded block."""
            return jnp.transpose(
                attr_blk[TRI_TRANSP_ROW:TRI_TRANSP_ROW + 1, :])

        def tri_inv3(d3):
            """Per-axis safe reciprocal of a direction triple, hoisted
            out of the per-block slab tests (both sweeps' directions are
            sweep-invariant, so the VPU divide runs once per sweep, not
            once per block).  Near-parallel axes get a tiny direction,
            which only widens the interval (conservative)."""
            return tuple(
                1.0 / jnp.where(jnp.abs(d3[k]) < np.float32(1e-12),
                                np.float32(1e-12), d3[k])
                for k in range(3))

        def tri_cull_tile(off, o3, inv3, act, bound):
            """Scalar: does ANY active lane's [0, bound] segment hit the
            AABB at SMEM element offset ``off``?  The slab test runs
            vectorized over the whole [S, L] tile (or [S, Q*L] feeler
            query batch) — per-lane exact, one scalar reduce + one
            branch per BLOCK instead of one per (sublane, block): the
            cond/scalar-sync machinery, not the pair matmuls, dominated
            mesh sweeps at per-sublane granularity (measured on stage 5:
            per-sublane conds 52.5 ms, whole-tile conds + grouped
            matmuls ~30 ms; doubling blocks via TB=256 under
            per-sublane conds REGRESSED to 65 ms)."""
            return jnp.any(tri_cull_mask(off, o3, inv3, act, bound))

        def tri_cull_mask(off, o3, inv3, act, bound, inflate=None):
            """Per-lane slab-test hit mask vs the AABB at SMEM element
            offset ``off`` (block b -> b*6, superblock s -> nblk*6 +
            s*6; the superblock unions are appended after the per-block
            entries — build_tri_blocks).  Feelers also reuse the mask
            rows for per-sublane skipping inside a hit block.
            ``inflate`` grows the AABB by a scalar radius on every axis
            (the per-light capsule precull: every sample segment to an
            area light lies inside the center segment Minkowski-summed
            with the light ball)."""
            tmn = jnp.zeros_like(bound)
            tmx = bound
            for k in range(3):
                lo = tri_aabb[off + k]
                hi = tri_aabb[off + 3 + k]
                if inflate is not None:
                    lo = lo - inflate
                    hi = hi + inflate
                t0 = (lo - o3[k]) * inv3[k]
                t1 = (hi - o3[k]) * inv3[k]
                tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
            return (tmx >= tmn) & (tmx >= 0) & act

        # compacted hit-block list (r5, VERDICT r4 item 2): ONE
        # vectorized slab pass over ALL blocks at once (blocks on the
        # sublane dim as [NBP, 1] columns from the [NBP, 8] VMEM AABB
        # table, rays broadcast as [1, L] rows) replaces the per-block
        # mask + cond machinery, so a sweep pays one scalar sync per
        # HIT block instead of one per block (and none of the
        # [S, W]-wide mask arithmetic for missed blocks).  Non-streamed
        # tables only: the streamed path's DMA chain wants contiguous
        # block segments.
        NBP = -(-nblk // 8) * 8 if nblk else 0
        use_compact = _TRI_COMPACT and _TRI_CULL and nblk and not stream

        def tri_hit_bits(o3, inv3, act, bound, inflate=None):
            """[NBP, 1] per-block any-lane-hit bits: the whole-tile
            slab test of tri_cull_mask vectorized over blocks.  One
            [NBP, L] pass per sublane row (Mosaic cannot reshape a ray
            tile to a [S*L, 1] column, so rays stay [1, L] rows and
            blocks broadcast down sublanes); padded block entries carry
            lo=+INF / hi=-INF and never hit."""
            hits = jnp.zeros((NBP, 1), jnp.bool_)
            los = [tri_aabb_v[:, k:k + 1] for k in range(3)]
            his = [tri_aabb_v[:, k + 3:k + 4] for k in range(3)]
            if inflate is not None:
                los = [lo - inflate for lo in los]
                his = [hi + inflate for hi in his]
            for s in range(SUBLANES):
                tmn = jnp.zeros((NBP, LANES), F32)
                tmx = jnp.broadcast_to(bound[s:s + 1, :], (NBP, LANES))
                for k in range(3):
                    t0 = (los[k] - o3[k][s:s + 1, :]) \
                        * inv3[k][s:s + 1, :]
                    t1 = (his[k] - o3[k][s:s + 1, :]) \
                        * inv3[k][s:s + 1, :]
                    tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                    tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                hit = (tmx >= tmn) & (tmx >= 0) & act[s:s + 1, :]
                hits = hits | jnp.any(hit, axis=1, keepdims=True)
            # explicit pad-block mask: the lo=hi=+INF pad rows still
            # "hit" a degenerate lane whose slab points coincide on all
            # axes (zero-padded rays: o=0, d=0 -> identical +INF points,
            # INF >= INF).  An index test is robust against any such
            # coincidence
            return hits & (jax.lax.broadcasted_iota(I32, (NBP, 1), 0)
                           < nblk)

        def tri_hit_list(hits):
            """(count, pos): hit count and [NBP, 1] prefix-sum
            positions for the compacted sweep loop (position j's block
            id is recovered by a masked reduce per iteration — scalar
            extraction from a dynamic index is cheaper as one [NBP, 1]
            reduce than an SMEM round-trip).  Non-hit blocks get pos 0
            so position j+1 matches exactly one entry.  The prefix sum
            runs as one [NBP, NBP] lower-triangular-ones matmul (Mosaic
            has no cumsum lowering; counts <= nblk are exact in f32)."""
            hf = hits.astype(F32)
            ir = jax.lax.broadcasted_iota(I32, (NBP, NBP), 0)
            ic2 = jax.lax.broadcasted_iota(I32, (NBP, NBP), 1)
            pos = jax.lax.dot_general(
                (ic2 <= ir).astype(F32), hf, (((1,), (0,)), ((), ())),
                preferred_element_type=F32)
            return (jnp.sum(hits.astype(I32)),
                    jnp.where(hits, pos.astype(I32), 0))

        # superblock cull applies on BOTH table modes when there is more
        # than one superblock to skip (round-5: the streamed path's DMA
        # chain is driven per-superblock, so missed superblocks skip
        # their block DMAs entirely — cull-aware streaming)
        nsb = -(-nblk // TRI_SB) if nblk else 0
        use_sb = _TRI_CULL and nblk > TRI_SB

        def tri_sweep(body, init, o3, inv3, act_of, bound_of,
                      level0=True, hitlist=None, live_of=None):
            """Run per-block ``body(b, slot, carry)`` over the nblk
            blocks under a three-level AABB cull:

            0. whole-mesh union (SMEM offset (nblk+nsb)*6): ONE cond
               skips the entire sweep — and, streamed, every DMA — for
               tiles whose active segments miss the mesh (the dominant
               case on large images where the mesh covers few tiles);
            1. superblock unions (TRI_SB blocks each, offset nblk*6 +
               sb*6): a miss skips those blocks' masks, conds, matmuls
               and (streamed) DMAs;
            2. ``body``'s own per-block cull cond.

            ``act_of(carry)`` / ``bound_of(carry)`` recompute the
            active-lane mask and segment bound at cull granularity
            (both only shrink, so testing them one level up is
            conservative).  Streamed DMA double-buffering is driven
            here: block b+1's copies start before block b's are waited,
            chained within the visited segment (the first block of each
            segment pays one exposed ~90 KB copy).

            ``hitlist``: optional (count, pos) from tri_hit_list — the
            compacted path: loop count iterations, recover block id j
            by masked reduce, run body (whose own cull cond still
            rechecks against the CURRENT carry, preserving the dynamic
            running-best / blocked-lane shrink the precomputed list
            cannot see).  Identical results to the level-1/2 path: the
            list is a superset of the blocks whose body cond would have
            fired (same slab test, initial bounds)."""
            if hitlist is not None:
                count, pos = hitlist
                biota = jax.lax.broadcasted_iota(I32, (NBP, 1), 0)

                if live_of is not None:
                    # early-out sweep: stop visiting blocks once the
                    # carry says no live work remains (opaque feelers:
                    # every sample blocked — the common fully-shadowed
                    # case ends after the first few Morton-near blocks)
                    def wcond(jc):
                        j, c = jc
                        return (j < count) & live_of(c)

                    def wbody(jc):
                        j, c = jc
                        b = jnp.sum(jnp.where(pos == j + 1, biota, 0))
                        return j + 1, body(b, b, c)

                    return jax.lax.while_loop(
                        wcond, wbody, (jnp.int32(0), init))[1]

                def cloop(j, c):
                    b = jnp.sum(jnp.where(pos == j + 1, biota, 0))
                    return body(b, b, c)

                return jax.lax.fori_loop(0, count, cloop, init)
            if nblk and stream:
                def seg_loop(b0, b1, c):
                    tri_stream_start(b0)

                    def sbody(b, c2):
                        @pl.when(b + 1 < b1)
                        def _():
                            tri_stream_start(b + 1)
                        return body(b, tri_wait(b), c2)

                    return jax.lax.fori_loop(b0, b1, sbody, c)
            else:
                def seg_loop(b0, b1, c):
                    return jax.lax.fori_loop(
                        b0, b1, lambda b, c2: body(b, b, c2), c)

            if use_sb:
                def sb_body(sb, carry):
                    hit = jnp.any(tri_cull_mask(
                        np.int32(nblk * 6) + sb * np.int32(6),
                        o3, inv3, act_of(carry), bound_of(carry)))
                    b0 = sb * np.int32(TRI_SB)
                    return jax.lax.cond(
                        hit,
                        lambda c: seg_loop(
                            b0, jnp.minimum(b0 + np.int32(TRI_SB),
                                            np.int32(nblk)), c),
                        lambda c: c, carry)

                def run_all(c):
                    return jax.lax.fori_loop(0, nsb, sb_body, c)
            else:
                def run_all(c):
                    return seg_loop(np.int32(0), np.int32(nblk), c)

            if not _TRI_CULL or not level0:
                # level0=False: the CALLER already branched on the
                # whole-mesh test (so its feature/query-batch builds
                # are skipped too, not just the block loop)
                return run_all(init)
            hit0 = jnp.any(tri_cull_mask(
                np.int32((nblk + nsb) * 6), o3, inv3, act_of(init),
                bound_of(init)))
            return jax.lax.cond(hit0, run_all, lambda c: c, init)

        def tri_closest(px, py, pz, qx, qy, qz, act, lt, bt):
            """Closest triangle + winner attrs + light-occlusion, whole tile.

            Returns (t_tri [S,L] (INF miss), attrs list of 16 [S,L] regs
            (nx,ny,nz + material fields), lblock_tri [S,L] bool,
            wid [S,L] i32 winning global triangle id — recorded by the
            replay VJP, kernels/replay.py).  One whole-tile AABB cull +
            cond per block (tri_cull_tile); a hit block runs all
            SUBLANES pair matmuls back-to-back, TRI_CGROUP sublanes wide
            per MXU call.  Blocks beyond max(min(bt, running tri best),
            lt) for every lane are culled (they can affect neither the
            closest hit nor light occlusion); the running-best term
            shrinks the cull segment as earlier blocks land hits."""
            G = TRI_CGROUP
            lt_seg = jnp.where(lt < INF, lt, 0.0)
            inv3 = tri_inv3((qx, qy, qz))
            A = TRI_ATTR_ROWS
            # ray-feature construction is DEFERRED into run() below so
            # a mesh-missing tile's level-0 cond skips it too — at 4K
            # most (tile, step) sweeps end at that one cond (r5).  body
            # is only traced inside run(), after the cell is filled.
            featg_cell = []

            def cbound(carry):
                return jnp.maximum(lt_seg, jnp.minimum(bt, carry[0]))

            def body(b, slot, carry):
                bound = cbound(carry)

                def hit_branch(c):
                    tb_c, pick_c, lb_c, wid_c = c
                    blk, attr_blk = tri_load(b, slot)
                    tr = tri_transp_col(attr_blk)
                    t_rows, a_rows, lb_rows, w_rows = [], [], [], []
                    for gi, g in enumerate(range(0, SUBLANES, G)):
                        gw = min(G, SUBLANES - g)
                        tvg = tri_pair_ts(blk, featg_cell[gi])  # [TB, gw*L]
                        # winner reduction + one-hot over the WHOLE
                        # group width: ONE pick matmul per group (the
                        # per-sublane picks were G small HIGHEST-
                        # precision matmuls per block — fixed MXU issue
                        # cost x16 per block dominated the pick)
                        tmin_g = jnp.min(tvg, axis=0, keepdims=True)
                        ridx = jax.lax.broadcasted_iota(
                            I32, (TB, gw * LANES), 0)
                        first_g = jnp.min(
                            jnp.where(tvg == tmin_g, ridx, np.int32(TB)),
                            axis=0, keepdims=True)
                        oh_g = ((ridx == first_g) & (tvg < INF)).astype(F32)
                        # one-hot pick: HIGHEST so normals/materials
                        # are not rounded to bf16 on the MXU
                        picked_g = jnp.dot(
                            attr_blk, oh_g, preferred_element_type=F32,
                            precision=_TRI_PICK_PRECISION)  # [A, gw*L]
                        for i in range(gw):
                            s = g + i
                            sl = slice(i * LANES, (i + 1) * LANES)
                            tv = tvg[:, sl]
                            # light-occlusion test per sublane (a grouped
                            # [1, gw*L] lt row would need a lane-concat
                            # of sublane-offset slices, which Mosaic
                            # rejects: offset mismatch on non-concat dim)
                            rel = (tv < INF) \
                                & (tv <= lt[s:s + 1, :]) & (tr < 0.5)
                            lb_new = jnp.max(rel.astype(F32), axis=0,
                                             keepdims=True)
                            tmin = tmin_g[:, sl]
                            better = tmin < tb_c[s:s + 1, :]
                            t_rows.append(jnp.where(better, tmin,
                                                    tb_c[s:s + 1, :]))
                            a_rows.append(jnp.where(
                                better, picked_g[:, sl],
                                pick_c[s * A:(s + 1) * A, :]))
                            lb_rows.append(jnp.maximum(
                                lb_c[s:s + 1, :], lb_new))
                            w_rows.append(jnp.where(
                                better, b * np.int32(TB) + first_g[:, sl],
                                wid_c[s:s + 1, :]))
                    return (jnp.concatenate(t_rows, axis=0),
                            jnp.concatenate(a_rows, axis=0),
                            jnp.concatenate(lb_rows, axis=0),
                            jnp.concatenate(w_rows, axis=0))

                if _TRI_CULL and not (use_compact and _TRI_CLOSEST_NORECHECK):
                    # per-block recheck against the CURRENT carry — its
                    # value over the precomputed hit list is the
                    # running-best shrink (earlier hits cull later
                    # blocks).  TPURAY_TRI_CLOSEST_NORECHECK=1 drops it
                    # to measure what that shrink is worth.
                    return jax.lax.cond(
                        tri_cull_tile(b * np.int32(6), (px, py, pz), inv3,
                                      act, bound),
                        hit_branch, lambda c: c, carry)
                return hit_branch(carry)

            init = (jnp.full((SUBLANES, LANES), INF),
                    jnp.zeros((A * SUBLANES, LANES), F32),
                    jnp.zeros((SUBLANES, LANES), F32),
                    jnp.zeros((SUBLANES, LANES), I32))

            def run(c):
                feats = [tri_features(s, px, py, pz, qx, qy, qz)
                         for s in range(SUBLANES)]
                featg_cell[:] = [
                    jnp.concatenate(feats[g:g + G], axis=1)
                    for g in range(0, SUBLANES, G)]
                hl = None
                if use_compact:
                    hl = tri_hit_list(tri_hit_bits(
                        (px, py, pz), inv3, act, cbound(c)))
                return tri_sweep(body, c, (px, py, pz), inv3,
                                 lambda c2: act, cbound, level0=False,
                                 hitlist=hl)

            if _TRI_CULL:
                hit0 = jnp.any(tri_cull_mask(
                    np.int32((nblk + nsb) * 6), (px, py, pz), inv3, act,
                    cbound(init)))
                t_tri, pick, lb, wid = jax.lax.cond(
                    hit0, run, lambda c: c, init)
            else:
                t_tri, pick, lb, wid = run(init)
            lb_tri = lb > 0.5
            attrs = [jnp.concatenate([pick[s * A + j:s * A + j + 1, :]
                                      for s in range(SUBLANES)], axis=0)
                     for j in range(A)]
            return t_tri, attrs, lb_tri, wid


        def tri_feeler_multi(px, py, pz, queries, act, pre_bl=None,
                             precull=None, gate_q=None):
            """ALL shadow-feeler queries of a shading step in ONE block
            sweep — the triangle extension of testShadowPath
            (primitives.cl:396-442), batched over the nl * n_samples
            light-sample segments (shared origin ph, per-query direction
            and range).

            ``queries``: list of (qx, qy, qz, tmax) [S, L] tuples.
            The feeler pair matmuls run at _TRI_FEELER_PRECISION (bf16):
            absolute t noise (~1e-2 at scene scale) swamps the eps
            offset and would self-shadow entire faces; the plane-
            distance guard in tri_pair_sum suppresses that (see its
            docstring — the old winner-id exclusion it replaced was
            strictly weaker).
            Returns (blocked list of [S, L] bool, opac list of [S, L]).
            Batching matters because feelers dominate mesh scenes: one
            block sweep serves all nl * n_samples queries, the pair
            matmuls run TRI_FEELER_QCH queries wide on the MXU, and the
            two-level cull (whole-batch cond per block + per-sublane
            conds inside, sharing one vectorized slab mask) skips the
            pairs that can't occlude.  The AABB cull unions the query
            segments per lane (they share an origin and aim at the same
            light cluster, so the union is nearly as tight as any
            single segment).

            ``precull``: list of (sdx, sdy, sdz, dist, radius) per
            light — center direction, center distance, light radius.
            When given, a per-light CAPSULE test (center segment vs the
            whole-mesh AABB inflated by the light radius; every sample
            segment lies inside that capsule) gates the ENTIRE feeler
            sweep including the [S, Q*L] query-batch construction — at
            4K most (tile, step) shades end at those nl cheap [S, L]
            masks (r5).

            ``gate_q``: queries per gate group (the caller passes
            n_samples so each gate is one light).  Inside a hit block,
            each (sublane group, light) pair's matmul+epilogue chunk
            runs under its own cond on that light's mask columns — a
            tile in light A's mesh shadow no longer pays B and C's
            pair sums (the dominant 4K case: floor tiles sweep for the
            one light whose capsule their shadow region crosses)."""
            Q = len(queries)
            if Q == 0:
                return [], []
            # the [S, Q*L] query batch is built inside run() (cells
            # filled before body/fact are traced) so the capsule
            # precull's false branch skips the construction cost too
            cell = {}

            def build_batch():
                # [S, Q*L] layout: query q occupies lane columns
                # [q*L, (q+1)*L) of every sublane row.  Features are
                # built WIDE-FIRST: concatenate o/d once on the lane
                # dim, compute the cross products on the wide arrays,
                # then assemble each sublane's [10, Q*L] feature matrix
                # by cheap sublane-dim row concats — the old per-(s, q)
                # tri_features + 16 Q-piece lane concats paid a Mosaic
                # relayout per piece and dominated the per-sweep fixed
                # cost (r5)
                cell["tmaxQ"] = jnp.concatenate(
                    [t for (_, _, _, t) in queries], axis=1)  # [S, Q*L]
                dQ = tuple(jnp.concatenate(
                    [q[k] for q in queries], axis=1) for k in range(3))
                oQ = tuple(jnp.concatenate([v] * Q, axis=1)
                           for v in (px, py, pz))
                cell["oQ"] = oQ
                cell["actQ"] = jnp.concatenate([act] * Q, axis=1)
                cell["invQ"] = tri_inv3(dQ)
                c1 = oQ[1] * dQ[2] - oQ[2] * dQ[1]
                c2 = oQ[2] * dQ[0] - oQ[0] * dQ[2]
                c3 = oQ[0] * dQ[1] - oQ[1] * dQ[0]
                ones = jnp.ones((1, Q * LANES), F32)
                cell["featQ_s"] = [
                    jnp.concatenate(
                        [oQ[0][s:s + 1, :], oQ[1][s:s + 1, :],
                         oQ[2][s:s + 1, :], dQ[0][s:s + 1, :],
                         dQ[1][s:s + 1, :], dQ[2][s:s + 1, :],
                         c1[s:s + 1, :], c2[s:s + 1, :], c3[s:s + 1, :],
                         ones], axis=0)
                    for s in range(SUBLANES)]

            def fact(carry):
                return cell["actQ"] & (carry[0] < 0.5)

            def body_nocond(b, slot, carry):
                bl_c, cnt_c = carry
                if tri_opaque:
                    blk, _ = tri_load(b, slot, attrs=False)
                    wop = None
                else:
                    blk, attr_blk = tri_load(b, slot)
                    tr = tri_transp_col(attr_blk)
                    wop = jnp.where(tr > 0.5, 1.0, np.float32(2.0 * TB))
                rows = []
                for s in range(SUBLANES):
                    sums = []
                    for q0 in range(0, Q, TRI_FEELER_QCH):
                        q1 = min(q0 + TRI_FEELER_QCH, Q)
                        sl = slice(q0 * LANES, q1 * LANES)
                        sums.append(tri_pair_sum(
                            blk, cell["featQ_s"][s][:, sl],
                            cell["tmaxQ"][s:s + 1, sl], wop))
                    rows.append(jnp.concatenate(sums, axis=1))
                sv = jnp.concatenate(rows, axis=0)
                if tri_opaque:
                    return jnp.maximum(bl_c, sv), cnt_c
                wtb = np.float32(2.0 * TB)
                return (jnp.maximum(bl_c, (sv >= wtb).astype(F32)),
                        cnt_c + (sv - wtb * jnp.floor(sv / wtb)))

            def body(b, slot, carry):
                # drop lanes already known blocked, so shadowed regions
                # stop sweeping.  Two cull levels, one mask computation:
                # a whole-batch cond per block, then per-sublane conds
                # inside the hit block reusing the mask rows — feeler
                # lanes diverge as they get blocked, so per-sublane
                # matmul skipping pays for its 16 small branches
                # (measured: tile-cond-only regressed 55->65 ms on
                # stage 5; the hybrid is the fastest of the three)
                if _TRI_FEELER_NOCOND:
                    # experiment knob: every listed block runs every
                    # sublane group unconditionally (no exact mask, no
                    # conds) — attributes feeler time to matmul vs
                    # mask/cond machinery
                    return body_nocond(b, slot, carry)
                act_dyn = fact(carry)
                mask = tri_cull_mask(b * np.int32(6), cell["oQ"],
                                     cell["invQ"], act_dyn,
                                     cell["tmaxQ"])

                def hit_branch(c):
                    bl_c, cnt_c = c                         # [S, Q*L]
                    if tri_opaque:
                        blk, _ = tri_load(b, slot, attrs=False)
                        wop = None
                    else:
                        blk, attr_blk = tri_load(b, slot)
                        tr = tri_transp_col(attr_blk)
                        wop = jnp.where(tr > 0.5, 1.0,
                                        np.float32(2.0 * TB))
                    FG = TRI_FGROUP
                    # gate granularity: one light's sample columns per
                    # cond (gate_q), or the whole batch when ungated
                    GQ = gate_q if gate_q else Q
                    ngate = Q // GQ

                    def sgate(g, gi):
                        """(bl, cn) [FG, GQ*L] for sublanes [g, g+FG)
                        x queries [gi*GQ, (gi+1)*GQ) — per-sublane pair
                        matmuls back to back under ONE branch (the
                        scalar sync per cond, not the matmul, is what
                        grouping amortizes)."""
                        rows = []
                        for i in range(FG):
                            s = g + i
                            sums = []
                            for q0 in range(gi * GQ, (gi + 1) * GQ,
                                            TRI_FEELER_QCH):
                                q1 = min(q0 + TRI_FEELER_QCH,
                                         (gi + 1) * GQ)
                                sl = slice(q0 * LANES, q1 * LANES)
                                sums.append(tri_pair_sum(
                                    blk, cell["featQ_s"][s][:, sl],
                                    cell["tmaxQ"][s:s + 1, sl], wop))
                            rows.append(jnp.concatenate(sums, axis=1))
                        sv = jnp.concatenate(rows, axis=0)  # [FG, GQ*L]
                        if tri_opaque:
                            return sv, jnp.zeros_like(sv)
                        wtb = np.float32(2.0 * TB)
                        return ((sv >= wtb).astype(F32),
                                sv - wtb * jnp.floor(sv / wtb))

                    bl_rows, cnt_rows = [], []
                    for g in range(0, SUBLANES, FG):
                        bl_parts, cn_parts = [], []
                        for gi in range(ngate):
                            slg = slice(gi * GQ * LANES,
                                        (gi + 1) * GQ * LANES)
                            if _TRI_CULL:
                                bl_g, cn_g = jax.lax.cond(
                                    jnp.any(mask[g:g + FG, slg]),
                                    lambda _, g=g, gi=gi: sgate(g, gi),
                                    lambda _: (
                                        jnp.zeros((FG, GQ * LANES), F32),
                                        jnp.zeros((FG, GQ * LANES), F32)),
                                    0)
                            else:
                                bl_g, cn_g = sgate(g, gi)
                            bl_parts.append(jnp.maximum(
                                bl_c[g:g + FG, slg], bl_g))
                            cn_parts.append(cnt_c[g:g + FG, slg] + cn_g)
                        bl_rows.append(jnp.concatenate(bl_parts, axis=1))
                        cnt_rows.append(jnp.concatenate(cn_parts, axis=1))
                    return (jnp.concatenate(bl_rows, axis=0),
                            jnp.concatenate(cnt_rows, axis=0))

                if _TRI_CULL:
                    return jax.lax.cond(jnp.any(mask), hit_branch,
                                        lambda c: c, carry)
                return hit_branch(carry)

            # seed with lanes the cheap sphere/plane occluders already
            # blocked (caller ORs our result into theirs, so reporting
            # them blocked is a no-op) — they drop out of every cull
            # level from the first block, and whole superblocks of
            # pre-shadowed tiles reject without a mask compute
            if pre_bl is None:
                bl0 = jnp.zeros((SUBLANES, Q * LANES), F32)
            else:
                bl0 = jnp.concatenate(
                    [b.astype(F32) for b in pre_bl], axis=1)
            init = (bl0, jnp.zeros((SUBLANES, Q * LANES), F32))

            # a lane is live if any of its queries is unblocked
            if pre_bl is None:
                live = act
            else:
                all_bl = pre_bl[0]
                for bq in pre_bl[1:]:
                    all_bl = all_bl & bq
                live = act & ~all_bl

            def light_body(i):
                """Per-block body for light i's own compacted sweep:
                the [S, GQ*L] column slice of the batch, a mask 1/nl
                the width of the union sweep's, and ONE whole-slice
                cond per block (plus per-group conds inside).  Lights
                sweep independently — block b in light A's shadow
                volume but not B's is visited once, with A-width work,
                instead of once at full batch width with per-light
                cond skips (r5, second feeler restructure)."""
                GQ = gate_q
                sl = slice(i * GQ * LANES, (i + 1) * GQ * LANES)
                featQ_i = [cell["featQ_s"][s][:, sl]
                           for s in range(SUBLANES)]
                tmax_i = cell["tmaxQ"][:, sl]
                oQ_i = tuple(v[:, sl] for v in cell["oQ"])
                invQ_i = tuple(v[:, sl] for v in cell["invQ"])
                actQ_i = cell["actQ"][:, sl]

                def body_i(b, slot, carry):
                    act_dyn = actQ_i & (carry[0] < 0.5)
                    mask = tri_cull_mask(b * np.int32(6), oQ_i, invQ_i,
                                         act_dyn, tmax_i)

                    def hit_branch(c):
                        bl_c, cnt_c = c                 # [S, GQ*L]
                        if tri_opaque:
                            blk, _ = tri_load(b, slot, attrs=False)
                            wop = None
                        else:
                            blk, attr_blk = tri_load(b, slot)
                            tr = tri_transp_col(attr_blk)
                            wop = jnp.where(tr > 0.5, 1.0,
                                            np.float32(2.0 * TB))
                        FG = TRI_FGROUP

                        def sg(g):
                            rows = []
                            for ii in range(FG):
                                s = g + ii
                                sums = []
                                for q0 in range(0, GQ, TRI_FEELER_QCH):
                                    q1 = min(q0 + TRI_FEELER_QCH, GQ)
                                    qsl = slice(q0 * LANES, q1 * LANES)
                                    sums.append(tri_pair_sum(
                                        blk, featQ_i[s][:, qsl],
                                        tmax_i[s:s + 1, qsl], wop))
                                rows.append(jnp.concatenate(sums, axis=1))
                            sv = jnp.concatenate(rows, axis=0)
                            if tri_opaque:
                                return sv, jnp.zeros_like(sv)
                            wtb = np.float32(2.0 * TB)
                            return ((sv >= wtb).astype(F32),
                                    sv - wtb * jnp.floor(sv / wtb))

                        bl_rows, cnt_rows = [], []
                        for g in range(0, SUBLANES, FG):
                            bl_g, cn_g = jax.lax.cond(
                                jnp.any(mask[g:g + FG, :]),
                                lambda _, g=g: sg(g),
                                lambda _: (
                                    jnp.zeros((FG, GQ * LANES), F32),
                                    jnp.zeros((FG, GQ * LANES), F32)),
                                0)
                            bl_rows.append(jnp.maximum(
                                bl_c[g:g + FG, :], bl_g))
                            cnt_rows.append(cnt_c[g:g + FG, :] + cn_g)
                        return (jnp.concatenate(bl_rows, axis=0),
                                jnp.concatenate(cnt_rows, axis=0))

                    return jax.lax.cond(jnp.any(mask), hit_branch,
                                        lambda c: c, carry)

                return body_i

            per_light = (use_compact and precull is not None and gate_q
                         and Q == len(precull) * gate_q)

            def run(c):
                build_batch()
                if per_light:
                    GQ = gate_q
                    bl_parts, cnt_parts = [], []
                    for i, (sdx, sdy, sdz, dist, lrad) in \
                            enumerate(precull):
                        sl = slice(i * GQ * LANES, (i + 1) * GQ * LANES)
                        hb = tri_hit_bits((px, py, pz),
                                          tri_inv3((sdx, sdy, sdz)),
                                          live, dist, inflate=lrad)
                        actQ_i = cell["actQ"][:, sl]
                        r = tri_sweep(light_body(i),
                                      (c[0][:, sl], c[1][:, sl]),
                                      cell["oQ"], cell["invQ"], fact,
                                      lambda c2: cell["tmaxQ"],
                                      level0=False,
                                      hitlist=tri_hit_list(hb),
                                      live_of=(lambda c2, a=actQ_i:
                                               jnp.any(a & (c2[0] < 0.5))))
                        bl_parts.append(r[0])
                        cnt_parts.append(r[1])
                    return (jnp.concatenate(bl_parts, axis=1),
                            jnp.concatenate(cnt_parts, axis=1))
                hl = None
                if use_compact and precull is not None:
                    # union capsule hit bits (fallback when queries are
                    # not light-grouped)
                    hits = None
                    for (sdx, sdy, sdz, dist, lrad) in precull:
                        hb = tri_hit_bits((px, py, pz),
                                          tri_inv3((sdx, sdy, sdz)),
                                          live, dist, inflate=lrad)
                        hits = hb if hits is None else (hits | hb)
                    hl = tri_hit_list(hits)
                return tri_sweep(body, c, cell["oQ"], cell["invQ"],
                                 fact, lambda c2: cell["tmaxQ"],
                                 level0=False, hitlist=hl)

            if _TRI_CULL and precull is not None:
                # per-light capsule precull vs the whole-mesh AABB
                sc_off = np.int32((nblk + nsb) * 6)
                hit0 = jnp.zeros((SUBLANES, LANES), jnp.bool_)
                for (sdx, sdy, sdz, dist, lrad) in precull:
                    invL = tri_inv3((sdx, sdy, sdz))
                    hit0 = hit0 | tri_cull_mask(
                        sc_off, (px, py, pz), invL, live, dist,
                        inflate=lrad)
                bl_s, cnt_s = jax.lax.cond(jnp.any(hit0), run,
                                           lambda c: c, init)
            else:
                bl_s, cnt_s = run(init)
            lnt = np.float32(np.log(cfg.transparent_through))
            blocked = [bl_s[:, q * LANES:(q + 1) * LANES] > 0.5
                       for q in range(Q)]
            if tri_opaque:
                opac = [jnp.ones((SUBLANES, LANES), F32)
                        for _ in range(Q)]
            else:
                opac = [jnp.exp(cnt_s[:, q * LANES:(q + 1) * LANES]
                                * lnt) for q in range(Q)]
            return blocked, opac

        def one_step(carry):
            (ox, oy, oz, dx, dy, dz, cx, cy, cz, f, n1, dep, sp, rng,
             done_i, ec, it, rec_cnt, pcode) = carry
            # done carried as i32 (Mosaic while loops cannot yield i1
            # vectors); all mask logic below uses the bool view
            done = done_i != 0
            active = ~done
            overdepth = dep >= D
            do_work = active & ~overdepth

            # --- all primitive tests for the current ray, once ---
            sph = [sphere_t(i, ox, oy, oz, dx, dy, dz) for i in range(ns)]
            pln = [plane_t(i, ox, oy, oz, dx, dy, dz) for i in range(npl)]

            # --- findLightIntersection (primitives.cl:262-318) ---
            lt = jnp.full_like(f, INF)
            lwin = izero
            for i in range(nl):
                h, t = light_t(i, ox, oy, oz, dx, dy, dz)
                tm = jnp.where(h, t, INF)
                better = tm < lt
                lt = jnp.where(better, tm, lt)
                lwin = jnp.where(better, np.int32(i), lwin)
            light_any = jnp.isfinite(lt)
            # occluders: non-transparent spheres / any plane at t' <= t_light
            lblock = jnp.zeros_like(done)
            for i in range(ns):
                h, t = sph[i]
                transp = u("sph_transparent", i) > 0.5
                lblock |= h & (t <= lt) & jnp.logical_not(transp)
            for i in range(npl):
                h, t = pln[i]
                lblock |= h & (t <= lt)
            # (light_hit is finalized after the triangle query below, which
            # also contributes occluders)
            # light color w/ the (1/d*d)==1 quirk (primitives.cl:287)
            lr0 = zero
            lr1 = zero
            lr2 = zero
            for i in range(nl):
                sel = (lwin == i).astype(F32)
                s = u("li_i", i) * inv_pi
                lr0 += sel * u("li_rgb", 3 * i) * s
                lr1 += sel * u("li_rgb", 3 * i + 1) * s
                lr2 += sel * u("li_rgb", 3 * i + 2) * s

            # --- findSolidIntersection (primitives.cl:322-394) ---
            bt = jnp.full_like(f, INF)
            bwin = jnp.full_like(izero, np.int32(-1))
            for i in range(ns):
                h, t = sph[i]
                tm = jnp.where(h, t, INF)
                better = tm < bt
                bt = jnp.where(better, tm, bt)
                bwin = jnp.where(better, np.int32(i), bwin)
            for i in range(npl):
                h, t = pln[i]
                tm = jnp.where(h, t, INF)
                better = tm < bt
                bt = jnp.where(better, tm, bt)
                bwin = jnp.where(better, np.int32(ns + i), bwin)

            # --- triangle closest hit + light occlusion (MXU blocks) ---
            if nblk:
                t_tri, tri_attrs, lb_tri, tri_wid = tri_closest(
                    ox, oy, oz, dx, dy, dz, do_work, lt, bt)
                lblock |= lb_tri
                tri_better = t_tri < bt   # strict: analytics win ties, as
                bt = jnp.where(tri_better, t_tri, bt)  # in trace.py:290-292
            else:
                tri_better = jnp.zeros((SUBLANES, LANES), jnp.bool_)
                tri_wid = izero
            light_hit = light_any & ~lblock
            solid_hit = jnp.isfinite(bt)
            t_safe = jnp.where(solid_hit, bt, 0.0)
            hx = ox + dx * t_safe
            hy = oy + dy * t_safe
            hz = oz + dz * t_safe

            # normal + per-lane material via one-hot over the winner
            nx = zero
            nyv = zero
            nz = zero
            m = {k: zero for k in _MAT_FIELDS}
            for i in range(ns):
                self_ = (bwin == i).astype(F32)
                sx, sy, sz = _normalize(hx - u("sph_o", 3 * i),
                                        hy - u("sph_o", 3 * i + 1),
                                        hz - u("sph_o", 3 * i + 2))
                nx += self_ * sx
                nyv += self_ * sy
                nz += self_ * sz
                for k in _MAT_FIELDS:
                    m[k] += self_ * u("sph_" + k, i)
            for i in range(npl):
                self_ = (bwin == ns + i).astype(F32)
                nx += self_ * u("pl_nrm", 3 * i)
                nyv += self_ * u("pl_nrm", 3 * i + 1)
                nz += self_ * u("pl_nrm", 3 * i + 2)
                for k in _MAT_FIELDS:
                    m[k] += self_ * u("pl_" + k, i)
            if nblk:
                # winning triangle overrides the sphere/plane one-hots;
                # face normal is double-faced (trace.py:306-310)
                tnx, tny, tnz = tri_attrs[0], tri_attrs[1], tri_attrs[2]
                flip = (tnx * dx + tny * dy + tnz * dz) > 0
                tnx = jnp.where(flip, -tnx, tnx)
                tny = jnp.where(flip, -tny, tny)
                tnz = jnp.where(flip, -tnz, tnz)
                nx = jnp.where(tri_better, tnx, nx)
                nyv = jnp.where(tri_better, tny, nyv)
                nz = jnp.where(tri_better, tnz, nz)
                for k, name in enumerate(_MAT_FIELDS):
                    m[name] = jnp.where(tri_better, tri_attrs[3 + k],
                                        m[name])

            if _TRI_DEBUG and nblk:
                # diagnostic modes: dump first-bounce quantities into the
                # color planes and stop.  1 = (tri t, |n|^2, merged t);
                # 2 = raw picked triangle normal (pre-flip, pre-merge)
                if _TRI_DEBUG == 2:
                    return (ox, oy, oz, dx, dy, dz,
                            tri_attrs[0], tri_attrs[1], tri_attrs[2],
                            f, n1, dep, sp, rng, jnp.ones_like(done_i),
                            ec, it, rec_cnt, pcode)
                dbg_t = jnp.where(jnp.isfinite(t_tri), t_tri, -1.0)
                dbg_n = nx * nx + nyv * nyv + nz * nz
                dbg_b = jnp.where(jnp.isfinite(bt), bt, -1.0)
                return (ox, oy, oz, dx, dy, dz, dbg_t, dbg_n, dbg_b,
                        f, n1, dep, sp, rng, jnp.ones_like(done_i), ec, it,
                        rec_cnt, pcode)

            is_light = do_work & light_hit
            is_miss = do_work & ~light_hit & ~solid_hit
            is_solid = do_work & ~light_hit & solid_hit

            # --- event emission: sky on miss / texel on textured hit ---
            # sky flat index (raytracing.cl:61-78 w/ v-flip + clamp)
            uu, vv = _map_to_cube(dx, dy, dz, sky_w // 4)
            syy = jnp.clip(np.int32(sky_h) - vv, 0, np.int32(sky_h - 1))
            sxx = jnp.clip(uu, 0, np.int32(sky_w - 1))
            sky_idx = np.int32(sky_base) + syy * np.int32(sky_w) + sxx

            # plane texture flat index (primitives.cl:217-259)
            is_plane_hit = bwin >= ns
            if nblk:
                is_plane_hit = is_plane_hit & ~tri_better
            tex_id = m["texture_id"]
            # texture_id >= 0 (f32 compare is exact for small ints)
            textured = is_solid & is_plane_hit & (tex_id > -0.5)
            b0x = zero
            b0y = zero
            b0z = zero
            b1x = zero
            b1y = zero
            b1z = zero
            for i in range(npl):
                sel = (bwin == ns + i).astype(F32)
                (p0x, p0y, p0z), (p1x, p1y, p1z) = plane_bases[i]
                b0x += sel * p0x
                b0y += sel * p0y
                b0z += sel * p0z
                b1x += sel * p1x
                b1y += sel * p1y
                b1z += sel * p1z
            ui = _dot(b0x, b0y, b0z, hx, hy, hz) * m["texture_scale"]
            vi = _dot(b1x, b1y, b1z, hx, hy, hz) * m["texture_scale"]
            ui = jnp.where(jnp.isfinite(ui), ui, 0.0)
            vi = jnp.where(jnp.isfinite(vi), vi, 0.0)
            txi = jnp.mod(ui.astype(I32), np.int32(tex_w))
            tyi = jnp.mod(vi.astype(I32), np.int32(tex_h))
            tex_idx = (tex_id.astype(I32) * np.int32(tex_h) + tyi) \
                * np.int32(tex_w) + txi

            emit_sky = is_miss
            emit_tex = textured
            emit = emit_sky | emit_tex
            if not bilinear:
                eidx = jnp.where(emit_sky, sky_idx, tex_idx)
                ew = jnp.where(emit_sky, f, f * m["ambient"])
                can = emit & (ec < K)

                @pl.when(jnp.any(can))
                def _write_events():
                    cond = jnp.tile(can, (K, 1)) \
                        & (jnp.tile(ec, (K, 1)) == levK_row)
                    ev_idx_out[:] = jnp.where(cond, jnp.tile(eidx, (K, 1)),
                                              ev_idx_out[:])
                    ev_w_out[:] = jnp.where(cond, jnp.tile(ew, (K, 1)),
                                            ev_w_out[:])

                ec = ec + can.astype(I32)
                overflow = emit & ~can
            else:
                # bilinear: 4 weighted events per fetch (trace.py's
                # sample_skybox / plane-texture bilinear, emitted in
                # primitives.bilinear_taps order).  Sky taps clamp the
                # continuous v-flipped coords; texture taps wrap (tiled).
                ufs, vfs = _map_to_cube_float(dx, dy, dz, sky_w // 4)
                yfs = jnp.clip(np.float32(sky_h) - vfs, 0.0,
                               np.float32(sky_h - 1))
                xfs = jnp.clip(ufs, 0.0, np.float32(sky_w - 1))

                def _taps(u, v, wi, hi, wrap):
                    u0f = jnp.floor(u)
                    v0f = jnp.floor(v)
                    fu = u - u0f
                    fv = v - v0f
                    u0 = u0f.astype(I32)
                    v0 = v0f.astype(I32)
                    out = []
                    for du, dv, wgt in ((0, 0, (1 - fu) * (1 - fv)),
                                        (1, 0, fu * (1 - fv)),
                                        (0, 1, (1 - fu) * fv),
                                        (1, 1, fu * fv)):
                        x2 = u0 + np.int32(du)
                        y2 = v0 + np.int32(dv)
                        if wrap:
                            x2 = jnp.mod(x2, np.int32(wi))
                            y2 = jnp.mod(y2, np.int32(hi))
                        else:
                            x2 = jnp.clip(x2, 0, np.int32(wi - 1))
                            y2 = jnp.clip(y2, 0, np.int32(hi - 1))
                        out.append((x2, y2, wgt))
                    return out

                sky_taps = _taps(xfs, yfs, sky_w, sky_h, False)
                tex_taps = _taps(ui, vi, tex_w, tex_h, True)
                tid_i = tex_id.astype(I32)
                can = emit & (ec + 3 < K)

                @pl.when(jnp.any(can))
                def _write_events4():
                    for t in range(4):
                        sx_t, sy_t, sw_t = sky_taps[t]
                        tx_t, ty_t, tw_t = tex_taps[t]
                        idx_t = jnp.where(
                            emit_sky,
                            np.int32(sky_base) + sy_t * np.int32(sky_w)
                            + sx_t,
                            (tid_i * np.int32(tex_h) + ty_t)
                            * np.int32(tex_w) + tx_t)
                        w_t = jnp.where(emit_sky, f * sw_t,
                                        f * m["ambient"] * tw_t)
                        cond = jnp.tile(can, (K, 1)) \
                            & (jnp.tile(ec + np.int32(t), (K, 1))
                               == levK_row)
                        ev_idx_out[:] = jnp.where(
                            cond, jnp.tile(idx_t, (K, 1)), ev_idx_out[:])
                        ev_w_out[:] = jnp.where(
                            cond, jnp.tile(w_t, (K, 1)), ev_w_out[:])

                ec = ec + 4 * can.astype(I32)
                # a dropped fetch loses 4 event slots (the overflow
                # counter feeds needed-capacity calculations)
                overflow = emit & ~can

            # --- accumulate in-register color ---
            fl = f
            cx2 = cx + jnp.where(is_light, fl * lr0, 0.0)
            cy2 = cy + jnp.where(is_light, fl * lr1, 0.0)
            cz2 = cz + jnp.where(is_light, fl * lr2, 0.0)
            # untextured ambient in-kernel (textured handled by the event)
            amb = jnp.where(is_solid & ~textured, fl * m["ambient"], 0.0)
            cx2 += amb * m["rgb0"]
            cy2 += amb * m["rgb1"]
            cz2 += amb * m["rgb2"]

            # eps-offset hit point (primitives.cl:350,380)
            phx = hx + nx * eps
            phy = hy + nyv * eps
            phz = hz + nz * eps

            # --- per-light soft-shadow Phong (raytracing.cl:87-136),
            #     skipped wholesale when no lane hit a solid this step ---
            def shade(rng):
                ax = zero
                ay = zero
                az = zero
                ssrs = []
                vx_, vy_, vz_ = _normalize(ox - phx, oy - phy, oz - phz)
                # pass 1: draw EVERY light sample (rng order unchanged)
                # and run the cheap sphere/plane occluders; triangle
                # feelers for all nl * n_samples segments run in ONE
                # batched block sweep (tri_feeler_multi) — the per-sweep
                # cull/cond machinery dominated mesh scenes when each
                # sample swept the blocks on its own
                queries, sp_bl, sp_op, precull = [], [], [], []
                for i in range(nl):
                    lox, loy, loz = u("li_o", 3 * i), \
                        u("li_o", 3 * i + 1), u("li_o", 3 * i + 2)
                    lrad = u("li_r", i)
                    # center direction/distance: reused by the feeler
                    # capsule precull AND the backface gate below
                    cdx, cdy, cdz = lox - phx, loy - phy, loz - phz
                    cdist = jnp.sqrt(cdx * cdx + cdy * cdy + cdz * cdz)
                    sdx_c, sdy_c, sdz_c = _normalize(cdx, cdy, cdz)
                    precull.append((sdx_c, sdy_c, sdz_c, cdist, lrad))
                    # backface gate (r5): pass 2's Phong weights for
                    # light i use the CENTER direction sd — a lane whose
                    # diffuse term (n.l <= 0 or diffuse weight 0) AND
                    # specular term (specular weight 0, or n.h <= 0
                    # with shininess > 0: the 1e-30 pow base
                    # underflows) are both zero cannot see light i
                    # regardless of its shadow ratio.  Pre-marking its
                    # samples blocked (ssr contribution 0 — identical
                    # image either way) drops the lane from every
                    # feeler cull level; on meshes roughly half the hit
                    # points face away from any given light.
                    #
                    # RECORD mode gates on GEOMETRY only: where n.l <= 0
                    # the diffuse grad carries the ndl factor (exactly
                    # 0), but a lane dead only because diffuse == 0 has
                    # a real d(image)/d(diffuse) — forcing its recorded
                    # ssr to 0 zeroed glass-sphere material grads in the
                    # replay (caught by the scan-tracer grad oracle, r5)
                    hx_c, hy_c, hz_c = _normalize(
                        vx_ + sdx_c, vy_ + sdy_c, vz_ + sdz_c)
                    geo_diff_dead = _dot(nx, nyv, nz,
                                         sdx_c, sdy_c, sdz_c) <= 0.0
                    geo_spec_dead = (
                        (_dot(nx, nyv, nz, hx_c, hy_c, hz_c) <= 0.0)
                        & (m["shininess"] > 0.0))
                    if record:
                        dead_l = geo_diff_dead & geo_spec_dead
                    else:
                        dead_l = (geo_diff_dead | (m["diffuse"] <= 0.0)) \
                            & ((m["specular"] <= 0.0) | geo_spec_dead)
                    for _ in range(n_samples):
                        rng, r1 = _xorshift32(rng)
                        theta = two_pi * r1
                        rng, r2 = _xorshift32(rng)
                        phi = pi * r2
                        sphi = jnp.sin(phi)
                        sx = lox + lrad * sphi * jnp.cos(theta)
                        sy = loy + lrad * sphi * jnp.sin(theta)
                        sz = loz + lrad * jnp.cos(phi)
                        # testShadowPath (primitives.cl:396-442)
                        qx, qy, qz = _normalize(sx - phx, sy - phy,
                                                sz - phz)
                        ddx = sx - phx
                        ddy = sy - phy
                        ddz = sz - phz
                        tmax = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                        blocked = dead_l
                        opac = jnp.ones_like(f)
                        for j in range(ns):
                            h, t = sphere_t(j, phx, phy, phz, qx, qy, qz)
                            rel = h & (t < tmax)
                            transp = u("sph_transparent", j) > 0.5
                            blocked |= rel & jnp.logical_not(transp)
                            opac *= jnp.where(rel & transp, through, 1.0)
                        for j in range(npl):
                            h, t = plane_t(j, phx, phy, phz, qx, qy, qz)
                            blocked |= h & (t < tmax)
                        queries.append((qx, qy, qz, tmax))
                        sp_bl.append(blocked)
                        sp_op.append(opac)
                if nblk:
                    t_bls, t_ops = tri_feeler_multi(phx, phy, phz,
                                                    queries, is_solid,
                                                    pre_bl=sp_bl,
                                                    precull=precull,
                                                    gate_q=n_samples)
                    sp_bl = [b | tb for b, tb in zip(sp_bl, t_bls)]
                    sp_op = [o * to for o, to in zip(sp_op, t_ops)]
                # pass 2: per-light soft ratios + Phong
                qi = 0
                for i in range(nl):
                    lox, loy, loz = u("li_o", 3 * i), \
                        u("li_o", 3 * i + 1), u("li_o", 3 * i + 2)
                    sdx, sdy, sdz = _normalize(lox - phx, loy - phy,
                                               loz - phz)
                    soft = zero
                    for _ in range(n_samples):
                        soft += jnp.where(sp_bl[qi], 0.0, sp_op[qi])
                        qi += 1
                    if n_samples:
                        ssr = soft / np.float32(n_samples)
                    else:
                        ssr = soft + 1.0
                    ssrs.append(ssr)
                    ddx = lox - phx
                    ddy = loy - phy
                    ddz = loz - phz
                    dd = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                    dd = jnp.where(dd > 0, dd, 1.0)
                    fall = inv_pi * u("li_i", i) / (dd * dd) * ssr
                    hxv, hyv, hzv = _normalize(vx_ + sdx, vy_ + sdy,
                                               vz_ + sdz)
                    ndh = jnp.maximum(0.0, _dot(nx, nyv, nz, hxv, hyv, hzv))
                    # floor at a denormal-ish base: pow lowers via exp*log
                    # and 0^0 on dead lanes would NaN; 1e-30^s==0 for s>0
                    spec = jnp.power(jnp.maximum(ndh, np.float32(1e-30)),
                                     m["shininess"]) * m["specular"] * fl
                    ndl = jnp.maximum(0.0, _dot(nx, nyv, nz, sdx, sdy, sdz))
                    diff = ndl * m["diffuse"] * fl
                    w_ = jnp.where(is_solid, spec + diff, 0.0) * fall
                    ax += w_ * u("li_rgb", 3 * i)
                    ay += w_ * u("li_rgb", 3 * i + 1)
                    az += w_ * u("li_rgb", 3 * i + 2)
                return (ax, ay, az, rng) + tuple(ssrs)

            any_solid = jnp.any(is_solid)
            shaded = jax.lax.cond(
                any_solid, shade,
                lambda r: (zero, zero, zero, r) + (zero,) * nl, rng)
            ax, ay, az, rng_sh = shaded[:4]
            ssrs = shaded[4:]
            cx2 += ax
            cy2 += ay
            cz2 += az
            rng = jnp.where(is_solid, rng_sh, rng)

            # --- node record emission (saved-path replay VJP) ---
            # One record per DFS node: packed hit code (8 bits: sphere /
            # plane index, 126 for a triangle hit, 64+l for light l, 127
            # for miss) | parent byte << 8 (6-bit parent slot + branch bit
            # 0x40 + valid bit 0x80) | winning triangle id << 16 (15 bits,
            # TRI_MAX_TRIANGLES = 2^15).  The replay tracer
            # (kernels/replay.py) reconstructs rays, throughputs and
            # shading differentiably from these plus the recorded
            # per-light soft-shadow ratios (the only RNG-dependent
            # quantities; piecewise-constant w.r.t. scene params).
            if record:
                node_slot = rec_cnt
                can_rec = do_work & (node_slot < Krec)
                solid_code = jnp.where(tri_better, np.int32(126), bwin)
                codev = jnp.where(
                    is_light, np.int32(64) + lwin,
                    jnp.where(is_miss, np.int32(127), solid_code))
                widv = jnp.where(tri_better, tri_wid, izero)
                packed = codev | (pcode << np.int32(8))
                if not wide_ids:
                    # VMEM-resident scenes: 15-bit winner id rides the
                    # packed word (TRI_MAX_TRIANGLES = 2^15)
                    packed = packed | (widv << np.int32(16))

                @pl.when(jnp.any(can_rec))
                def _write_rec():
                    condr = tile_r(can_rec) & (tile_r(node_slot) == levR_row)
                    rec_out[:] = jnp.where(condr, tile_r(packed), rec_out[:])
                    if wide_ids:
                        wid_out[:] = jnp.where(condr, tile_r(widv),
                                               wid_out[:])
                    for li in range(nl):
                        sl = slice(li * Krec * SUBLANES,
                                   (li + 1) * Krec * SUBLANES)
                        ssr_out[sl, :] = jnp.where(
                            condr, tile_r(ssrs[li]), ssr_out[sl, :])

                # children of an overflowed node get a parentless code (0):
                # the replay drops their subtree (counted via rec_cnt)
                ok_par = node_slot < Krec
                pc_refl = jnp.where(ok_par, np.int32(0x80) | node_slot,
                                    izero)
                pc_refr = jnp.where(ok_par, np.int32(0xC0) | node_slot,
                                    izero)
                rec_cnt = rec_cnt + do_work.astype(I32)
            else:
                pc_refl = pc_refr = izero

            # --- reflect / refract continuation (raytracing.cl:138-179) ---
            n2 = jnp.where(n1 == default_n, m["n"], default_n)
            # schlick (primitives.cl:146-160)
            r0 = (n1 - n2) / (n1 + n2)
            r0 = r0 * r0
            cos_i = -_dot(nx, nyv, nz, dx, dy, dz)
            nr = n1 / n2
            sin_t2 = nr * nr * (1.0 - cos_i * cos_i)
            s_tir = sin_t2 > 1.0
            cos_tr = jnp.sqrt(jnp.clip(1.0 - sin_t2, 0.0, None))
            use_tr = n1 > n2
            cos_x = jnp.where(use_tr, cos_tr, cos_i)
            xs = 1.0 - cos_x
            fr = r0 + (1.0 - r0) * xs * xs * xs * xs * xs
            fr = jnp.where(use_tr & s_tir, 1.0, fr)
            dielectric = m["dielectric"] > 0.5
            refl = m["reflectivity"]
            ra = jnp.where(dielectric, refl + (1.0 - refl) * fr, refl)
            f_cont = f * ra
            # reflect (primitives.cl:127-130)
            rdx = dx + 2.0 * cos_i * nx
            rdy = dy + 2.0 * cos_i * nyv
            rdz = dz + 2.0 * cos_i * nz
            dep1 = dep + 1

            transparent = m["transparent"] > 0.5
            push_try = is_solid & transparent & (sp < D) & (ra < 1.0)
            entering = n1 < n2
            cox = jnp.where(entering, phx - 2.0 * eps * nx, phx)
            coy = jnp.where(entering, phy - 2.0 * eps * nyv, phy)
            coz = jnp.where(entering, phz - 2.0 * eps * nz, phz)
            rnx = jnp.where(entering, nx, -nx)
            rny = jnp.where(entering, nyv, -nyv)
            rnz = jnp.where(entering, nz, -nz)
            # refract (primitives.cl:132-144) against rn
            cos_i2 = -_dot(rnx, rny, rnz, dx, dy, dz)
            sin2 = nr * nr * (1.0 - cos_i2 * cos_i2)
            tir = sin2 > 1.0
            cos_t = jnp.sqrt(jnp.clip(1.0 - sin2, 0.0, None))
            tdx = nr * dx + (nr * cos_i2 - cos_t) * rnx
            tdy = nr * dy + (nr * cos_i2 - cos_t) * rny
            tdz = nr * dz + (nr * cos_i2 - cos_t) * rnz
            push = push_try & ~tir

            pop = active & (overdepth | is_light | is_miss)
            finish = pop & (sp == 1)
            popm = pop & (sp > 1)
            cont = is_solid & ~push

            # --- stack write (VMEM scratch; skipped when no lane pushes) ---
            lvl_push = sp - 1
            lvl_pop = sp - 2

            @pl.when(jnp.any(push))
            def _push_stack():
                wcond = tile_d(push) & (tile_d(lvl_push) == lev_row)
                vals = (phx, phy, phz, rdx, rdy, rdz, cx2, cy2, cz2,
                        f_cont, n1)
                for j, v in enumerate(vals):
                    sl = slice(j * D * SUBLANES, (j + 1) * D * SUBLANES)
                    stk_f[sl, :] = jnp.where(wcond, tile_d(v), stk_f[sl, :])
                stk_i[:] = jnp.where(wcond, tile_d(dep1), stk_i[:])
                if record:
                    # the stacked child is the REFLECTED ray
                    stk_p[:] = jnp.where(wcond, tile_d(pc_refl), stk_p[:])

            # --- stack read (skipped when no lane pops) ---
            def read_stack(_):
                sel = tile_d(lvl_pop) == lev_row
                outs = []
                for j in range(NF):
                    sl = slice(j * D * SUBLANES, (j + 1) * D * SUBLANES)
                    picked = jnp.where(sel, stk_f[sl, :], 0.0)
                    outs.append(picked.reshape(
                        D, SUBLANES, LANES).sum(axis=0))
                di = jnp.where(sel, stk_i[:], 0)
                outs.append(di.reshape(D, SUBLANES, LANES).sum(axis=0))
                if record:
                    dp = jnp.where(sel, stk_p[:], 0)
                    outs.append(dp.reshape(D, SUBLANES, LANES).sum(axis=0))
                return tuple(outs)

            def no_stack(_):
                return tuple([zero] * NF + [izero] * (2 if record else 1))

            rs = jax.lax.cond(jnp.any(popm), read_stack, no_stack, 0)
            (r_ox, r_oy, r_oz, r_dx, r_dy, r_dz, r_cx, r_cy, r_cz,
             r_f, r_n, r_dep) = rs[:NF + 1]
            r_pc = rs[NF + 1] if record else izero

            def pick4(push_v, pop_v, cont_v, keep):
                return jnp.where(push, push_v,
                                 jnp.where(popm, pop_v,
                                           jnp.where(cont, cont_v, keep)))

            child_f = f * (1.0 - ra)
            n_ox = pick4(cox, r_ox, phx, ox)
            n_oy = pick4(coy, r_oy, phy, oy)
            n_oz = pick4(coz, r_oz, phz, oz)
            n_dx = pick4(tdx, r_dx, rdx, dx)
            n_dy = pick4(tdy, r_dy, rdy, dy)
            n_dz = pick4(tdz, r_dz, rdz, dz)
            n_cx = jnp.where(push, 0.0,
                             jnp.where(popm, r_cx + cx2,
                                       jnp.where(cont | finish, cx2, cx)))
            n_cy = jnp.where(push, 0.0,
                             jnp.where(popm, r_cy + cy2,
                                       jnp.where(cont | finish, cy2, cy)))
            n_cz = jnp.where(push, 0.0,
                             jnp.where(popm, r_cz + cz2,
                                       jnp.where(cont | finish, cz2, cz)))
            n_dep = jnp.where(push | cont, dep1, jnp.where(popm, r_dep, dep))
            n_f = jnp.where(push, child_f,
                            jnp.where(popm, r_f,
                                      jnp.where(cont, f_cont, f)))
            n_n1 = jnp.where(push, n2, jnp.where(popm, r_n, n1))
            n_sp = sp + push.astype(I32) - popm.astype(I32)
            n_done = done_i | finish.astype(I32)
            if record:
                n_pc = jnp.where(push, pc_refr,
                                 jnp.where(popm, r_pc,
                                           jnp.where(cont, pc_refl, pcode)))
            else:
                n_pc = pcode

            return (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz, n_cx, n_cy, n_cz,
                    n_f, n_n1, n_dep, n_sp, rng, n_done, ec,
                    it + (4 if bilinear else 1) * overflow.astype(I32),
                    rec_cnt, n_pc)

        init = (ox, oy, oz, dx, dy, dz, zero, zero, zero,
                zero + 1.0, zero + default_n, izero, izero + 1,
                pid, (~in_image).astype(I32),  # rng + done as i32 bits
                izero, izero, izero, izero)

        def cond(carry):
            return jnp.any(carry[14] == 0)

        final = jax.lax.while_loop(cond, one_step, init)
        cxf, cyf, czf = final[6], final[7], final[8]
        over = final[16]
        ec_final = final[15]

        c_out[0 * SUBLANES:1 * SUBLANES, :] = cxf
        c_out[1 * SUBLANES:2 * SUBLANES, :] = cyf
        c_out[2 * SUBLANES:3 * SUBLANES, :] = czf
        # rows [0,S): per-lane overflow count; rows [S,2S): the tile's max
        # used event-slot count (so the host can size the resolve)
        over_out[0 * SUBLANES:1 * SUBLANES, :] = over
        over_out[1 * SUBLANES:2 * SUBLANES, :] = jnp.broadcast_to(
            jnp.max(ec_final), (SUBLANES, LANES))
        if record:
            # row block 2: the tile's max node count (> Krec => the replay
            # lost some subtree contributions; raise cfg.record_slots)
            over_out[2 * SUBLANES:3 * SUBLANES, :] = jnp.broadcast_to(
                jnp.max(final[17]), (SUBLANES, LANES))

    return kernel


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _pallas_forward(scene: Scene, assets: SceneAssets,
                    basis: PerspectiveBasis, cfg: RenderConfig,
                    interpret: bool, row0, record: bool = False):
    """Shared pallas_call wiring for render_pallas / render_pallas_stats /
    render_pallas_record.

    Returns (c_blk, ev_idx, ev_w, over, atlas, gx, gy, K) and, with
    ``record=True``, additionally (rec, ssr) node-record buffers."""
    width, height = cfg.width, cfg.height
    lay = uniform_layout(scene.num_spheres, scene.num_planes,
                         scene.num_lights)
    atlas = build_atlas(assets)
    uni = pack_uniforms(scene, basis, lay, row0)
    # beyond the VMEM-resident table budget, triangle blocks live in HBM
    # and stream through a double-buffered VMEM scratch inside the kernel
    stream = scene.num_triangles > TRI_MAX_TRIANGLES
    tb = TRI_STREAM_TB if stream else TRI_TB
    tri = build_tri_blocks(scene, tb=tb)
    if stream and tri.nblk > TRI_STREAM_MAX_BLOCKS:
        raise ValueError(
            f"{scene.num_triangles} triangles exceed the streamed-path "
            f"cap ({TRI_STREAM_MAX_TRIANGLES}); use the XLA tracer")

    gx = -(-width // LANES)
    gy = -(-height // SUBLANES)
    K = cfg.resolved_event_slots()
    Krec = cfg.resolved_record_slots()
    nl = lay.n_lights
    nover = 3 if record else 2

    kernel = _make_kernel(
        lay, (atlas.tex_h, atlas.tex_w, atlas.n_textures, atlas.sky_base,
              atlas.sky_h, atlas.sky_w), cfg, width, height, gx,
        nblk=tri.nblk if tri else 0, record=record, stream=stream, tb=tb,
        tri_opaque=not tri.has_transp if tri else False)

    if tri:
        # SMEM AABB table: per-block entries then the superblock unions
        # (tri_cull_mask indexes superblock s at nblk*6 + s*6)
        xp = np if isinstance(tri.aabb, np.ndarray) else jnp
        aabb_smem = xp.concatenate([tri.aabb, tri.sb_aabb, tri.sc_aabb])
        # the same per-block bounds as a [NBP, 8] VMEM table (blocks on
        # the sublane dim, cols lo.xyz ++ hi.xyz ++ 2 pad) for the
        # vectorized all-blocks cull behind the compacted hit list.
        # Padded blocks carry lo = hi = +INF: every axis interval is
        # then a single (+/-INF, +/-INF) point whose slab test fails for
        # either direction sign.  (lo=+INF/hi=-INF does NOT work: a
        # negative-direction axis flips it into (-INF, +INF) and pad
        # blocks "hit" every tile — caught on hardware as out-of-range
        # block ids sweeping garbage triangles.)
        nbp = -(-tri.nblk // 8) * 8
        pad = nbp - tri.nblk
        a8 = xp.concatenate(
            [tri.aabb.reshape(tri.nblk, 6),
             xp.zeros((tri.nblk, 2), np.float32)], axis=1)
        padrow = xp.concatenate(
            [xp.full((pad, 6), np.float32(np.inf), np.float32),
             xp.zeros((pad, 2), np.float32)], axis=1)
        aabb_v = xp.concatenate([a8, padrow], axis=0)
    if tri and stream:
        # contiguous per-block layout so each DMA is one dense copy
        nb = tri.nblk
        b3 = tri.b_lhs.reshape(10, nb, 4 * tb).transpose(1, 0, 2)
        # pad the 10 feature rows to 16: DMA slice shapes must be
        # 8-sublane-aligned on TPU
        b3 = np.concatenate(
            [b3, np.zeros((nb, 6, 4 * tb), np.float32)], axis=1)             if isinstance(b3, np.ndarray) else jnp.concatenate(
                [b3, jnp.zeros((nb, 6, 4 * tb), F32)], axis=1)
        a3 = tri.attr.reshape(TRI_ATTR_ROWS, nb, tb).transpose(1, 0, 2)
        inputs = (uni, aabb_smem, aabb_v, b3, a3)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY)]
    elif tri:
        inputs = (uni, aabb_smem, aabb_v, tri.b_lhs, tri.attr)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        inputs = (uni,)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]

    def blk(rows, dtype):
        return (pl.BlockSpec((None, None, rows, LANES),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                jax.ShapeDtypeStruct((gy, gx, rows, LANES), dtype))

    specs = [blk(3 * SUBLANES, jnp.float32),
             blk(K * SUBLANES, jnp.int32),
             blk(K * SUBLANES, jnp.float32),
             blk(nover * SUBLANES, jnp.int32)]
    if record:
        specs.append(blk(Krec * SUBLANES, jnp.int32))
        specs.append(blk(nl * Krec * SUBLANES, jnp.float32))
        if stream:
            # streamed scenes: full-width winner-id plane (ids exceed
            # the packed record's 15 bits)
            specs.append(blk(Krec * SUBLANES, jnp.int32))

    scratch = [
        # per-lane ray stacks (11 f32 planes + depth i32), VMEM-resident
        # across the whole tile traversal instead of while-carried
        pltpu.VMEM((11 * cfg.max_depth * SUBLANES, LANES), jnp.float32),
        pltpu.VMEM((cfg.max_depth * SUBLANES, LANES), jnp.int32),
    ]
    if record:
        # parent codes of stacked (reflected) children
        scratch.append(pltpu.VMEM((cfg.max_depth * SUBLANES, LANES),
                                  jnp.int32))
    if tri and stream:
        # double-buffered triangle-block slots + per-(slot, table) DMA
        # semaphores (kernel-side tri_wait / tri_load)
        scratch.append(pltpu.VMEM((2 * 16, 4 * tb), jnp.float32))
        scratch.append(pltpu.VMEM((2 * TRI_ATTR_ROWS, tb), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((2, 2)))

    outs = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=in_specs,
        out_specs=tuple(s for s, _ in specs),
        out_shape=tuple(s for _, s in specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    c_blk, ev_idx, ev_w, over = outs[:4]
    if record:
        wid = outs[6] if stream else None
        return (c_blk, ev_idx, ev_w, over, atlas, gx, gy, K, outs[4],
                outs[5], wid)
    return c_blk, ev_idx, ev_w, over, atlas, gx, gy, K


def render_pallas(scene: Scene, assets: SceneAssets,
                  basis: PerspectiveBasis, cfg: RenderConfig,
                  interpret: bool = False, row0=0.0) -> jnp.ndarray:
    """Forward render via the Pallas megakernel.

    Returns float32 linear rgb [H, W, 3] (same semantics as the XLA
    tracer, including the triangle extension — meshes run as MXU matmul
    blocks inside the kernel).  ``row0``: global image row of the first
    rendered row (row-sharded rendering).
    """
    c_blk, ev_idx, ev_w, over, atlas, gx, gy, K = _pallas_forward(
        scene, assets, basis, cfg, interpret, row0)
    return _resolve_events(c_blk, ev_idx, ev_w, over, atlas, gx, gy, K,
                           cfg.width, cfg.height)


def _resolve_events(c_blk, ev_idx, ev_w, over, atlas, gx, gy, K,
                    width, height) -> jnp.ndarray:
    # --- resolve deferred texel events -------------------------------------
    # The event buffer has K worst-case slots but real traces populate only
    # the first few: measured on render.map the mean is ~1.5 events/pixel
    # at every config while the max is 6 (1080p d4) to 24 (d15); slot 0 is
    # used by ~every tile, slot 1 by ~half, slots 2+ by ~10%.  Three levers:
    #
    # 1. CHEAPER ISSUES.  texel fetches go through the fused one-hot
    #    row-gather (jnp.take of 64-texel atlas rows + in-register lane
    #    select) — XLA:TPU lowers it to a DMA fast path at ~2.2-2.9
    #    ns/event (vs ~7 ns for a plain element gather), PROVIDED the
    #    gather is >= GATHER_FAST_ELEMS elements (see the constant above).
    #
    # 2. FEWER ELEMENTS.  (tile, slot)-pair compaction: slots are filled
    #    per-lane in order, so tile t populates exactly slots
    #    [0, tile_used[t]).  Slot 0 is gathered densely (every tile needs
    #    it) and slots >= 1 are compacted to the active pairs via one
    #    top_k over the [K-1, T] pair-activity mask, sized by a static
    #    capacity ladder (lax.switch on the real pair count).  This issues
    #    the measured-optimal element count: sum_t tile_used[t] * 2048
    #    (3.58M at 1080p d4 vs 5.22M for the old dense slots-0..1 +
    #    compacted-tail schedule).
    #
    # 3. ONE CALL.  Slot-0 planes, compacted pairs, and fast-path padding
    #    are concatenated into a SINGLE gather so the call stays above the
    #    fast-path cliff; pair results scatter-add into the tile planes.
    # The kernel reports each tile's max used slot count in over rows
    # [S, 2S); tiny reduces over it drive the switch.
    T = gy * gx
    tile_used = over[:, :, SUBLANES, 0].reshape(T)
    u_max = jnp.clip(jnp.max(tile_used), 0, K)

    evi = ev_idx.reshape(T, K, SUBLANES, LANES)
    evw = ev_w.reshape(T, K, SUBLANES, LANES)
    base = (c_blk[:, :, 0 * SUBLANES:1 * SUBLANES, :].reshape(
                T, SUBLANES, LANES),
            c_blk[:, :, 1 * SUBLANES:2 * SUBLANES, :].reshape(
                T, SUBLANES, LANES),
            c_blk[:, :, 2 * SUBLANES:3 * SUBLANES, :].reshape(
                T, SUBLANES, LANES))

    # 64-texel row view of the atlas for the fast row-gather path
    # (precomputed at asset-load time; see textures.pack_atlas_rows)
    arows = atlas.rows
    lane64 = jnp.arange(64, dtype=jnp.int32)

    def _texel_rgb_direct(idx, w):
        """Elementwise weighted texel rgb (same shape as ``idx``).

        Row-gather: fetch the 64-wide atlas row holding each texel and
        one-hot-select the lane in registers.  Bit-identical to an
        element gather (tested vs the XLA tracer and the golden image).
        """
        ic = jnp.clip(idx, 0, None)
        if int(np.prod(idx.shape)) < ELEM_GATHER_MAX:
            # small resolve: flat element gather (~7 ns/element) — the
            # row fast path needs >= GATHER_FAST_ELEMS to pay off
            texel = jnp.take(arows.reshape(-1), ic)
        else:
            rows = jnp.take(arows, ic >> 6, axis=0)      # [..., 64]
            texel = jnp.where(lane64 == (ic & 63)[..., None], rows, 0) \
                .sum(axis=-1)
        scale = jnp.where(idx >= 0, w, 0.0) / F32(255.0)
        # NOTE: keep the consumers of ``texel`` plain same-shape
        # elementwise ops — broadcasting a stacked [3, ...] channel axis
        # here knocks the gather off the DMA fast path (measured: 95.5 ->
        # 37.8 Mrays/s at 1080p d4, i.e. back to ~11 ns/element).
        return ((scale * ((texel >> 16) & 0xFF).astype(F32)),
                (scale * ((texel >> 8) & 0xFF).astype(F32)),
                (scale * (texel & 0xFF).astype(F32)))

    def texel_rgb(idx, w):
        """_texel_rgb_direct, chunked along axis 0 above CHUNK_EV."""
        n = idx.shape[0]
        per_row = int(np.prod(idx.shape[1:]))
        chunk = max(1, CHUNK_EV // max(per_row, 1))
        if n <= chunk:
            return _texel_rgb_direct(idx, w)
        nc = -(-n // chunk)
        pad = nc * chunk - n

        def pad_r(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=-1).reshape(
                               (nc, chunk) + x.shape[1:])

        r, g, b = jax.lax.map(lambda ab: _texel_rgb_direct(*ab),
                              (pad_r(idx), pad_r(w)))
        return (r.reshape((nc * chunk,) + r.shape[2:])[:n],
                g.reshape((nc * chunk,) + g.shape[2:])[:n],
                b.reshape((nc * chunk,) + b.shape[2:])[:n])

    def add3(c, r, g, b):
        return c[0] + r, c[1] + g, c[2] + b

    # ---- pair compaction over slots >= 1 ----------------------------------
    Kp = K - 1
    evi_flat = evi.reshape(T * K, SUBLANES, LANES)
    evw_flat = evw.reshape(T * K, SUBLANES, LANES)
    slot0_pf = jnp.arange(T, dtype=jnp.int32) * K

    if Kp > 0:
        n_pairs = jnp.sum(jnp.maximum(tile_used - 1, 0))
        # s-major activity mask: act[s-1, t] = tile t populates slot s.
        # s-major order makes the compacted plane gather ascend in s then
        # t (deterministic; coherent plane slices).
        act = (tile_used[None, :]
               > jnp.arange(1, K, dtype=tile_used.dtype)[:, None])

        def _eff_planes(P):
            """True gathered plane count of a capacity-P branch (incl.
            fast-path padding) — what the branch actually costs."""
            n_el = (T + P) * TILE
            if GATHER_PAD_MIN < n_el < GATHER_FAST_ELEMS:
                return GATHER_FAST_ELEMS // TILE
            return T + P

        # capacity ladder: fine T/8 steps up to 2T (the operating range —
        # mean events/pixel is ~1.5 so n_pairs ~ 0.5T typically), then
        # doubling to the exact worst case.  Rungs whose padded gather is
        # the same size as a larger rung's are dominated — keep only the
        # largest of each equal-cost class (below the fast-path cliff all
        # rungs pad to GATHER_FAST_ELEMS, so they collapse into one).
        cand, c = [], max(1, T // 8)
        while c < min(2 * T, Kp * T):
            cand.append(c)
            c += max(1, T // 8)
        c = max(2 * T, 1)
        while c < Kp * T:
            cand.append(c)
            c *= 2
        cand.append(Kp * T)
        caps = [p for i, p in enumerate(cand)
                if i + 1 == len(cand)
                or _eff_planes(p) < _eff_planes(cand[i + 1])]
        _, pair_idx = jax.lax.top_k(act.reshape(Kp * T).astype(jnp.int32),
                                    caps[-1])
    else:
        n_pairs = jnp.int32(0)
        caps = []

    def combined(P):
        """Branch: ONE gather of [slot-0 planes | P compacted pairs | pad],
        elementwise add for slot 0, scatter-add for the pairs.  Inactive
        filler pairs hold EV_NONE lanes and contribute zero."""
        n_planes = T + P
        n_el = n_planes * TILE
        pad = 0
        if GATHER_PAD_MIN < n_el < GATHER_FAST_ELEMS:
            pad = -(-(GATHER_FAST_ELEMS - n_el) // TILE)

        def branch(_):
            if P:
                pidx = pair_idx[:P]
                t_of = pidx % T
                s_of = pidx // T + 1
                pf = jnp.concatenate([slot0_pf, t_of * K + s_of])
            else:
                pf = slot0_pf
            if pad:
                pf = jnp.concatenate(
                    [pf, jnp.zeros((pad,), jnp.int32)])
            ii = evi_flat[pf]
            ww = evw_flat[pf]
            if pad:  # padding planes: force EV_NONE (weight-0 row-0 fetch)
                inrange = (jnp.arange(pf.shape[0], dtype=jnp.int32)
                           < n_planes)[:, None, None]
                ii = jnp.where(inrange, ii, EV_NONE)
            r, g, b = texel_rgb(ii, ww)
            c = add3(base, r[:T], g[:T], b[:T])
            if P:
                c = (c[0].at[t_of].add(r[T:T + P]),
                     c[1].at[t_of].add(g[T:T + P]),
                     c[2].at[t_of].add(b[T:T + P]))
            return c
        return branch

    branches = [lambda _: base, combined(0)] + [combined(P) for P in caps]
    if Kp > 0:
        cap_arr = jnp.asarray(caps, jnp.int32)
        bidx = jnp.sum((n_pairs > cap_arr).astype(jnp.int32))
        sel = jnp.where(u_max == 0, 0,
                        jnp.where(n_pairs == 0, 1, 2 + bidx))
    else:
        sel = jnp.where(u_max == 0, 0, 1)
    cx, cy, cz = jax.lax.switch(sel, branches, 0)

    # [T, S, L] -> [gy, gx, S, L] -> [gy*S, gx*L] -> crop -> [H, W, 3]
    def unblock(ch):
        return ch.reshape(gy, gx, SUBLANES, LANES).transpose(
            0, 2, 1, 3).reshape(gy * SUBLANES, gx * LANES)

    img = jnp.stack([unblock(cx), unblock(cy), unblock(cz)], axis=-1)
    return img[:height, :width, :]


def render_pallas_record(scene: Scene, assets: SceneAssets,
                         basis: PerspectiveBasis, cfg: RenderConfig,
                         interpret: bool = False, row0=0.0):
    """Forward render + per-pixel node records for the replay VJP.

    Returns (img [H, W, 3] f32, records) where records is a dict:
      * ``rec``  [Krec, n_pix] i32 — packed hit code | parent byte << 8
        (see _make_kernel's record block); -1 = unused slot;
      * ``ssr``  [Krec, nl, n_pix] f32 — per-node per-light soft-shadow
        ratios (the recorded RNG-dependent quantities);
      * ``ev_idx`` [K, n_pix] i32 — the kernel's deferred texel-event
        indices, in emission order (the replay re-uses these exact
        discrete texel picks so nearest-fetch boundary pixels match the
        kernel bit-for-bit; weights stay recomputed/differentiable);
      * ``max_nodes`` scalar i32 — image max node count (> Krec means the
        replay lost subtree contributions; raise cfg.record_slots).
    """
    width, height = cfg.width, cfg.height
    (c_blk, ev_idx, ev_w, over, atlas, gx, gy, K, rec, ssr,
     wid) = _pallas_forward(scene, assets, basis, cfg, interpret, row0,
                            record=True)
    img = _resolve_events(c_blk, ev_idx, ev_w, over, atlas, gx, gy, K,
                          width, height)
    Krec = cfg.resolved_record_slots()
    nl = scene.num_lights

    def unblock_planes(buf, planes):
        # (gy, gx, planes*S, L) -> [planes, H, W] -> [planes, n_pix]
        x = buf.reshape(gy, gx, planes, SUBLANES, LANES)
        x = x.transpose(2, 0, 3, 1, 4).reshape(
            planes, gy * SUBLANES, gx * LANES)
        return x[:, :height, :width].reshape(planes, height * width)

    rec_flat = unblock_planes(rec, Krec)
    ssr_flat = unblock_planes(ssr, nl * Krec).reshape(
        nl, Krec, height * width).transpose(1, 0, 2)
    max_nodes = jnp.max(over[:, :, 2 * SUBLANES, 0])
    records = {"rec": rec_flat, "ssr": ssr_flat,
               "ev_idx": unblock_planes(ev_idx, K),
               "max_nodes": max_nodes}
    if wid is not None:
        # streamed scenes: full-width winner ids in their own plane
        records["wid"] = unblock_planes(wid, Krec)
    return img, records


def render_pallas_checked(scene: Scene, assets: SceneAssets,
                          basis: PerspectiveBasis, cfg: RenderConfig,
                          interpret: bool = False, row0=0.0):
    """Forward render + event-overflow telemetry in the same launch.

    Returns (img, dropped_events, needed_slots): ``dropped_events`` is the
    total count of texel events the kernel could not store (their terminal
    contributions are missing from ``img``); ``needed_slots`` is the
    event capacity that would have stored everything (current K + the
    worst lane's drop count) — re-render with
    ``cfg.replace(event_slots=needed_slots)`` for a lossless image (see
    render.render_from_basis_checked's feedback loop).
    """
    c_blk, ev_idx, ev_w, over, atlas, gx, gy, K = _pallas_forward(
        scene, assets, basis, cfg, interpret, row0)
    img = _resolve_events(c_blk, ev_idx, ev_w, over, atlas, gx, gy, K,
                          cfg.width, cfg.height)
    per_lane_dropped = over[:, :, :SUBLANES, :]
    dropped = per_lane_dropped.sum()
    needed = K + jnp.max(per_lane_dropped)
    return img, dropped, needed


def render_pallas_stats(scene: Scene, assets: SceneAssets,
                        basis: PerspectiveBasis, cfg: RenderConfig) -> dict:
    """Diagnostic render: returns {'dropped_events', 'max_slots_used'}.

    ``dropped_events`` > 0 means some pixel exceeded the event-slot
    capacity and terminal texel contributions were lost — raise
    cfg.event_slots if the golden comparison shows it matters."""
    _, _, _, over, _, _, _, _ = _pallas_forward(
        scene, assets, basis, cfg, False, 0.0)
    import numpy as _np
    over = _np.asarray(over)
    return {"dropped_events": int(over[:, :, :SUBLANES, :].sum()),
            "max_slots_used": int(over[:, :, SUBLANES, 0].max())}


def pallas_supported(scene: Scene, cfg: RenderConfig) -> bool:
    """The Pallas engine covers the full feature set — spheres, planes,
    lights, textures, skybox (nearest AND bilinear filtering) and
    triangle meshes (in-kernel MXU blocks; VMEM-resident tables up to
    TRI_MAX_TRIANGLES, HBM-streamed double-buffered blocks beyond) — up
    to TRI_STREAM_MAX_TRIANGLES; beyond that the XLA tracer takes
    over.  Record mode (the replay VJP) works on both: VMEM-resident
    scenes pack 15-bit winner ids into the node records; streamed
    scenes record full-width ids in their own plane."""
    return scene.num_triangles <= TRI_STREAM_MAX_TRIANGLES


# ---------------------------------------------------------------------------
# standalone triangle-query kernels: the megakernel's MXU block sweep
# exposed as per-call primitives for the XLA tracer / scene parallelism
# ---------------------------------------------------------------------------

def _make_query_kernel(nblk: int, nsb: int, tb: int, mode: str,
                       inclusive: bool = False):
    """Tile kernel for one ray-array triangle query (no DFS, no shading).

    ``mode``: 'closest' -> (t [S,L] f32 (INF miss), wid [S,L] i32);
    'blocker' -> (blocked [S,L] f32 0/1, transparent-crossing count
    [S,L] f32) within per-ray tmax.  Same three-level AABB cull, MXU
    Moller-Trumbore bilinear forms and bf16x3 precision discipline as
    the megakernel's in-DFS sweeps (tri_closest / tri_feeler_multi),
    minus the per-step machinery — this is the unit the XLA tracer's
    scene-parallel path shards across devices (each device sweeps its
    own blocks; t/id/blocked/count combine with pmin/pmax/psum OUTSIDE,
    kernels/trace.py::_tri_closest/_tri_any_blocker)."""
    TB = tb
    G = TRI_CGROUP
    INF = np.float32(np.inf)
    NBP = -(-nblk // 8) * 8 if nblk else 0

    def kernel(aabb, aabb_v, tri_b, tri_attr, rays, *outs):
        def comp(i):
            return rays[pl.ds(i * SUBLANES, SUBLANES), :]

        ox, oy, oz = comp(0), comp(1), comp(2)
        dx, dy, dz = comp(3), comp(4), comp(5)
        if mode == "blocker":
            tmax = comp(6)
            act = tmax > 0
            bound0 = tmax
        else:
            act = jnp.ones((SUBLANES, LANES), jnp.bool_)
            bound0 = jnp.full((SUBLANES, LANES), INF)

        inv3 = tuple(
            1.0 / jnp.where(jnp.abs(v) < np.float32(1e-12),
                            np.float32(1e-12), v)
            for v in (dx, dy, dz))
        o3 = (ox, oy, oz)

        def cull_mask(off, a, bound):
            tmn = jnp.zeros_like(bound)
            tmx = bound
            for k in range(3):
                lo = aabb[off + k]
                hi = aabb[off + 3 + k]
                t0 = (lo - o3[k]) * inv3[k]
                t1 = (hi - o3[k]) * inv3[k]
                tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
            return (tmx >= tmn) & (tmx >= 0) & a

        def features(s):
            o1, o2, o3_ = ox[s:s + 1, :], oy[s:s + 1, :], oz[s:s + 1, :]
            d1, d2, d3 = dx[s:s + 1, :], dy[s:s + 1, :], dz[s:s + 1, :]
            c1 = o2 * d3 - o3_ * d2
            c2 = o3_ * d1 - o1 * d3
            c3 = o1 * d2 - o2 * d1
            return jnp.concatenate(
                [o1, o2, o3_, d1, d2, d3, c1, c2, c3,
                 jnp.ones((1, LANES), F32)], axis=0)

        def pair_M(blk, feat):
            dims = (((0,), (0,)), ((), ()))
            if _TRI_DOT_PRECISION == "bf16x3":
                def hi_lo(x):
                    h = x.astype(jnp.bfloat16).astype(F32)
                    return h, x - h
                bh, bl_ = hi_lo(blk)
                fh, fl_ = hi_lo(feat)
                return (jax.lax.dot_general(
                            bh, fh, dims, preferred_element_type=F32)
                        + jax.lax.dot_general(
                            bh, fl_, dims, preferred_element_type=F32)
                        + jax.lax.dot_general(
                            bl_, fh, dims, preferred_element_type=F32))
            return jax.lax.dot_general(
                blk, feat, dims, preferred_element_type=F32,
                precision=(jax.lax.Precision.HIGHEST
                           if _TRI_DOT_PRECISION == "bf16x3"
                           else _TRI_DOT_PRECISION))

        featg_cell = []

        if mode == "closest":
            def bound_of(carry):
                return jnp.minimum(bound0, carry[0])

            def body(b, slot, carry):
                del slot
                tb_c, wid_c = carry

                def hit_branch(c):
                    tb_c2, wid_c2 = c
                    blk = tri_b[:, pl.ds(b * 4 * TB, 4 * TB)]
                    t_rows, w_rows = [], []
                    for gi, g in enumerate(range(0, SUBLANES, G)):
                        gw = min(G, SUBLANES - g)
                        M = pair_M(blk, featg_cell[gi])
                        det = M[0 * TB:1 * TB, :]
                        tn = M[1 * TB:2 * TB, :]
                        un = M[2 * TB:3 * TB, :]
                        vn = M[3 * TB:4 * TB, :]
                        m3 = jnp.minimum(jnp.minimum(un * det, vn * det),
                                         (det - un - vn) * det)
                        okv = (m3 >= 0) & (tn * det > 0) \
                            & (jnp.abs(det) > np.float32(1e-7))
                        tv = jnp.where(
                            okv, tn / jnp.where(det == 0, 1.0, det), INF)
                        tmin_g = jnp.min(tv, axis=0, keepdims=True)
                        ridx = jax.lax.broadcasted_iota(
                            I32, (TB, gw * LANES), 0)
                        first_g = jnp.min(
                            jnp.where(tv == tmin_g, ridx, np.int32(TB)),
                            axis=0, keepdims=True)
                        for i in range(gw):
                            s = g + i
                            sl = slice(i * LANES, (i + 1) * LANES)
                            tmin = tmin_g[:, sl]
                            better = tmin < tb_c2[s:s + 1, :]
                            t_rows.append(jnp.where(
                                better, tmin, tb_c2[s:s + 1, :]))
                            w_rows.append(jnp.where(
                                better, b * np.int32(TB) + first_g[:, sl],
                                wid_c2[s:s + 1, :]))
                    return (jnp.concatenate(t_rows, axis=0),
                            jnp.concatenate(w_rows, axis=0))

                if _TRI_CULL:
                    return jax.lax.cond(
                        jnp.any(cull_mask(b * np.int32(6), act,
                                          bound_of(carry))),
                        hit_branch, lambda c: c, carry)
                return hit_branch(carry)

            init = (jnp.full((SUBLANES, LANES), INF),
                    jnp.zeros((SUBLANES, LANES), I32))
        else:
            def bound_of(carry):
                return bound0

            def fact(carry):
                return act & (carry[0] < 0.5)

            def body(b, slot, carry):
                del slot
                mask = cull_mask(b * np.int32(6), fact(carry), bound0)

                def hit_branch(c):
                    bl_c, cnt_c = c
                    blk = tri_b[:, pl.ds(b * 4 * TB, 4 * TB)]
                    tr = jnp.transpose(
                        tri_attr[TRI_TRANSP_ROW:TRI_TRANSP_ROW + 1,
                                 pl.ds(b * TB, TB)])
                    wop = jnp.where(tr > 0.5, 1.0, np.float32(2.0 * TB))
                    bl_rows, cnt_rows = [], []
                    for g in range(0, SUBLANES, G):
                        gw = min(G, SUBLANES - g)
                        M = pair_M(blk, featg_cell[g // G])
                        det = M[0 * TB:1 * TB, :]
                        tn = M[1 * TB:2 * TB, :]
                        un = M[2 * TB:3 * TB, :]
                        vn = M[3 * TB:4 * TB, :]
                        m3 = jnp.minimum(jnp.minimum(un * det, vn * det),
                                         (det - un - vn) * det)
                        okv = (m3 >= 0) & (tn * det > 0) \
                            & (jnp.abs(det) > np.float32(1e-7))
                        tv = jnp.where(
                            okv, tn / jnp.where(det == 0, 1.0, det), INF)
                        for i in range(gw):
                            s = g + i
                            sl = slice(i * LANES, (i + 1) * LANES)
                            tvs = tv[:, sl]
                            tm = tmax[s:s + 1, :]
                            within = tvs <= tm if inclusive else tvs < tm
                            rel = (tvs < INF) & within & (tvs > 0)
                            sv = jnp.sum(jnp.where(rel, wop, 0.0),
                                         axis=0, keepdims=True)
                            wtb = np.float32(2.0 * TB)
                            bl_rows.append(jnp.maximum(
                                bl_c[s:s + 1, :], (sv >= wtb).astype(F32)))
                            cnt_rows.append(
                                cnt_c[s:s + 1, :]
                                + (sv - wtb * jnp.floor(sv / wtb)))
                    return (jnp.concatenate(bl_rows, axis=0),
                            jnp.concatenate(cnt_rows, axis=0))

                if _TRI_CULL:
                    return jax.lax.cond(jnp.any(mask), hit_branch,
                                        lambda c: c, carry)
                return hit_branch(carry)

            init = (jnp.zeros((SUBLANES, LANES), F32),
                    jnp.zeros((SUBLANES, LANES), F32))

        def seg_loop(b0, b1, c):
            return jax.lax.fori_loop(
                b0, b1, lambda b, c2: body(b, b, c2), c)

        use_sb = _TRI_CULL and nblk > TRI_SB
        use_compact = _TRI_COMPACT and _TRI_CULL and nblk

        def hit_list():
            """Compacted hit-block list (same construction as the
            megakernel's tri_hit_bits/tri_hit_list): one vectorized
            all-blocks slab pass, then positions via a triangular-ones
            matmul.  body's own cull cond still rechecks against the
            running carry."""
            hits = jnp.zeros((NBP, 1), jnp.bool_)
            los = [aabb_v[:, k:k + 1] for k in range(3)]
            his = [aabb_v[:, k + 3:k + 4] for k in range(3)]
            for s in range(SUBLANES):
                tmn = jnp.zeros((NBP, LANES), F32)
                tmx = jnp.broadcast_to(bound0[s:s + 1, :], (NBP, LANES))
                for k in range(3):
                    t0 = (los[k] - o3[k][s:s + 1, :]) \
                        * inv3[k][s:s + 1, :]
                    t1 = (his[k] - o3[k][s:s + 1, :]) \
                        * inv3[k][s:s + 1, :]
                    tmn = jnp.maximum(tmn, jnp.minimum(t0, t1))
                    tmx = jnp.minimum(tmx, jnp.maximum(t0, t1))
                hit = (tmx >= tmn) & (tmx >= 0) & act[s:s + 1, :]
                hits = hits | jnp.any(hit, axis=1, keepdims=True)
            # explicit pad-block mask (see tri_hit_bits: zero-padded
            # rays coincide on all axes and "hit" the +INF pad rows)
            hits = hits & (jax.lax.broadcasted_iota(I32, (NBP, 1), 0)
                           < nblk)
            hf = hits.astype(F32)
            ir = jax.lax.broadcasted_iota(I32, (NBP, NBP), 0)
            ic2 = jax.lax.broadcasted_iota(I32, (NBP, NBP), 1)
            pos = jax.lax.dot_general(
                (ic2 <= ir).astype(F32), hf, (((1,), (0,)), ((), ())),
                preferred_element_type=F32)
            return (jnp.sum(hits.astype(I32)),
                    jnp.where(hits, pos.astype(I32), 0))

        def run_all(c):
            if use_compact:
                count, pos = hit_list()
                biota = jax.lax.broadcasted_iota(I32, (NBP, 1), 0)

                def cloop(j, c2):
                    b = jnp.sum(jnp.where(pos == j + 1, biota, 0))
                    return body(b, b, c2)

                return jax.lax.fori_loop(0, count, cloop, c)
            if not use_sb:
                return seg_loop(np.int32(0), np.int32(nblk), c)

            def sb_body(sb, carry):
                hit = jnp.any(cull_mask(
                    np.int32(nblk * 6) + sb * np.int32(6),
                    act if mode == "closest" else fact(carry),
                    bound_of(carry)))
                b0 = sb * np.int32(TRI_SB)
                return jax.lax.cond(
                    hit,
                    lambda c2: seg_loop(
                        b0, jnp.minimum(b0 + np.int32(TRI_SB),
                                        np.int32(nblk)), c2),
                    lambda c2: c2, carry)

            return jax.lax.fori_loop(0, nsb, sb_body, c)

        def run(c):
            feats = [features(s) for s in range(SUBLANES)]
            featg_cell[:] = [jnp.concatenate(feats[g:g + G], axis=1)
                             for g in range(0, SUBLANES, G)]
            return run_all(c)

        if _TRI_CULL:
            hit0 = jnp.any(cull_mask(np.int32((nblk + nsb) * 6), act,
                                     bound0))
            res = jax.lax.cond(hit0, run, lambda c: c, init)
        else:
            res = run(init)
        outs[0][:] = res[0]
        outs[1][:] = res[1]

    return kernel


def _query_rays(tri: TriBlocks, o, d, tmax=None, inclusive=False,
                interpret=False):
    """Run one triangle query over a ray array.

    ``o, d`` [P, 3]; returns (t [P], wid [P]) without ``tmax``
    (closest mode) or (blocked [P] bool, count [P] i32) with it.
    Rays are padded to whole 16x128 tiles; pad lanes carry a zero
    direction (slab intervals collapse -> culled) and, in blocker
    mode, tmax = 0 (inactive)."""
    mode = "blocker" if tmax is not None else "closest"
    p = o.shape[0]
    rows = 7 if mode == "blocker" else 6
    n_t = max(1, -(-p // TILE))
    pad = n_t * TILE - p

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    if mode == "blocker":
        comps.append(tmax)
    packed = jnp.stack([jnp.pad(c.astype(F32), (0, pad)) for c in comps])
    rays = packed.reshape(rows, n_t, SUBLANES, LANES).transpose(1, 0, 2, 3) \
        .reshape(n_t, rows * SUBLANES, LANES)

    xp = np if isinstance(tri.aabb, np.ndarray) else jnp
    aabb_smem = xp.concatenate([tri.aabb, tri.sb_aabb, tri.sc_aabb])
    # [NBP, 8] VMEM AABB table for the compacted hit list (same
    # construction + lo=hi=+INF padding as _pallas_forward)
    nbp = -(-tri.nblk // 8) * 8
    pad = nbp - tri.nblk
    aabb_v = xp.concatenate(
        [xp.concatenate(
            [tri.aabb.reshape(tri.nblk, 6),
             xp.zeros((tri.nblk, 2), np.float32)], axis=1),
         xp.concatenate(
             [xp.full((pad, 6), np.float32(np.inf), np.float32),
              xp.zeros((pad, 2), np.float32)], axis=1)], axis=0)

    kernel = _make_query_kernel(tri.nblk, tri.nsb, TRI_TB, mode,
                                inclusive)
    out_dtypes = ((F32, I32) if mode == "closest" else (F32, F32))
    outs = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, rows * SUBLANES, LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((None, SUBLANES, LANES),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_t, SUBLANES, LANES), dt)
                   for dt in out_dtypes],
        interpret=interpret,
    )(aabb_smem, aabb_v, tri.b_lhs, tri.attr, rays)
    a = outs[0].reshape(-1)[:p]
    b = outs[1].reshape(-1)[:p]
    if mode == "closest":
        return a, b
    return a > 0.5, b.astype(I32)


def tri_query_closest(scene_or_blocks, o, d, interpret=False):
    """(t_best [P] (INF miss), winner id [P]) — the Pallas counterpart
    of trace.py::_tri_closest_arrays.  Accepts a Scene or a prebuilt
    TriBlocks (per-device shards under scene parallelism build blocks
    from their triangle slice)."""
    tri = (scene_or_blocks if isinstance(scene_or_blocks, TriBlocks)
           else build_tri_blocks(scene_or_blocks))
    return _query_rays(tri, o, d, interpret=interpret)


def tri_query_blocker(scene_or_blocks, o, d, tmax, inclusive=False,
                      interpret=False):
    """(blocked [P] bool, transparent-crossing count [P] i32) — the
    Pallas counterpart of trace.py::_tri_blocker_arrays."""
    tri = (scene_or_blocks if isinstance(scene_or_blocks, TriBlocks)
           else build_tri_blocks(scene_or_blocks))
    return _query_rays(tri, o, d, tmax=tmax, inclusive=inclusive,
                       interpret=interpret)


def build_query_blocks(v0, v1, v2, transp, tb: int = None) -> TriBlocks:
    """TriBlocks for the standalone query kernels from RAW triangle
    arrays ([T, 3] vertices + [T] transparent flags) — the shard-local
    builder for scene parallelism (each device passes its own slice;
    zero-padded rows are degenerate and never hit).  Same b_lhs/AABB
    construction as build_tri_blocks; the attr table is minimal (only
    the transparent row is populated — the query kernels never pick
    materials).  Works on traced arrays (inside jit/shard_map)."""
    tb = TRI_TB if tb is None else tb
    t_count = v0.shape[0]
    concrete = not any(isinstance(a, jax.core.Tracer)
                       for a in (v0, v1, v2, transp))
    xp = np if concrete else jnp
    nblk = max(1, -(-t_count // tb))
    tp = nblk * tb
    pad = tp - t_count

    def as_f32(a):
        return np.asarray(a, np.float32) if concrete else a.astype(F32)

    v0f, v1f, v2f = as_f32(v0), as_f32(v1), as_f32(v2)
    z3 = xp.zeros((pad, 3), F32)
    v0z, v1z, v2z = (xp.concatenate([v, z3]) for v in (v0f, v1f, v2f))
    e1 = v1z - v0z
    e2 = v2z - v0z
    n = xp.cross(e1, e2)
    inv_n = 1.0 / xp.maximum(
        xp.sqrt(xp.sum(n * n, axis=1, keepdims=True)), np.float32(1e-30))
    nrm = n * inv_n
    e1n = e1 * inv_n
    e2n = e2 * inv_n
    m1 = xp.cross(v0z, e2n)
    m2 = xp.cross(v0z, e1n)
    c0 = xp.sum(v0z * nrm, axis=1)
    zc = xp.zeros((tp, 3), F32)
    z1 = xp.zeros((tp, 1), F32)
    det_r = xp.concatenate([zc, -nrm, zc, z1], axis=1)
    tn_r = xp.concatenate([nrm, zc, zc, -c0[:, None]], axis=1)
    un_r = xp.concatenate([zc, m1, e2n, z1], axis=1)
    vn_r = xp.concatenate([zc, -m2, -e1n, z1], axis=1)
    full = xp.stack([det_r, tn_r, un_r, vn_r])               # [4, Tp, 10]
    b_lhs = full.reshape(4, nblk, tb, 10).transpose(3, 1, 0, 2) \
        .reshape(10, nblk * 4 * tb)

    attr = xp.zeros((TRI_ATTR_ROWS, tp), F32)
    trp = xp.concatenate([as_f32(transp), xp.zeros((pad,), F32)])
    if concrete:
        attr[TRI_TRANSP_ROW] = trp
    else:
        attr = attr.at[TRI_TRANSP_ROW].set(trp)

    # zero-pad AABBs would anchor empty pad blocks at the origin and
    # defeat the cull; repeat the last real triangle like build_tri_blocks
    rep = lambda v: xp.concatenate(                          # noqa: E731
        [v, xp.repeat(v[-1:], pad, axis=0)]) if t_count else v0z
    v0e, v1e, v2e = rep(v0f), rep(v1f), rep(v2f)
    lo = xp.minimum(xp.minimum(v0e, v1e), v2e) \
        .reshape(nblk, tb, 3).min(axis=1)
    hi = xp.maximum(xp.maximum(v0e, v1e), v2e) \
        .reshape(nblk, tb, 3).max(axis=1)
    aabb = xp.concatenate([lo, hi], axis=1).reshape(-1)
    nsb = -(-nblk // TRI_SB)
    sb_pad = nsb * TRI_SB - nblk
    lo_p = xp.concatenate([lo, xp.full((sb_pad, 3), np.float32(np.inf))])
    hi_p = xp.concatenate([hi, xp.full((sb_pad, 3), np.float32(-np.inf))])
    sb_lo = lo_p.reshape(nsb, TRI_SB, 3).min(axis=1)
    sb_hi = hi_p.reshape(nsb, TRI_SB, 3).max(axis=1)
    sb_aabb = xp.concatenate([sb_lo, sb_hi], axis=1).reshape(-1)
    sc_aabb = xp.concatenate([lo.min(axis=0), hi.max(axis=0)])
    if concrete:
        b_lhs = b_lhs.astype(np.float32)
        attr = attr.astype(np.float32)
        aabb = aabb.astype(np.float32)
        sb_aabb = sb_aabb.astype(np.float32)
        sc_aabb = sc_aabb.astype(np.float32)
    has_transp = True
    if concrete:
        has_transp = bool(np.any(np.asarray(transp) > 0.5))
    return TriBlocks(b_lhs=b_lhs, attr=attr, aabb=aabb, nblk=nblk,
                     sb_aabb=sb_aabb, nsb=nsb, sc_aabb=sc_aabb,
                     has_transp=has_transp)
