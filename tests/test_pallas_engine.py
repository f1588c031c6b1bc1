"""Pallas megakernel engine tests.

The Mosaic kernel only runs on real TPU hardware (interpret mode exists but
is orders of magnitude too slow for a full traversal), so the consistency
test against the XLA tracer is TPU-gated; the pure-host pieces (uniform
packing, atlas packing, layout) run everywhere.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuray.camera import Camera, generate_rays, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_FOCAL, GOLDEN_CAMERA_FOV,
                           GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray.kernels.pallas_trace import (build_atlas, pack_uniforms,
                                         uniform_layout)
from tpuray.scene import canonical_scene_spec
from tpuray.sceneio import load_scene
from tpuray.textures import load_default_assets, solid_assets

RENDER_MAP = "/root/reference/scenes/render.map"

tpu_only = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Mosaic megakernel needs TPU hardware")


class TestUniformPacking:
    def test_layout_matches_packed_sizes_and_values(self):
        scene = load_scene(RENDER_MAP).to_scene()
        cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
                     GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
        basis = perspective_basis(cam, 64, 48)
        lay = uniform_layout(scene.num_spheres, scene.num_planes,
                             scene.num_lights)
        uni = np.asarray(pack_uniforms(scene, basis, lay))
        assert uni.shape == (lay.size,)
        o = lay.off
        # geometry keys must not collide with the material IoR field "n"
        assert o["pl_nrm"] != o["pl_n"]
        np.testing.assert_allclose(
            uni[o["pl_nrm"]:o["pl_nrm"] + 6],
            np.asarray(scene.plane_normal).reshape(-1))
        np.testing.assert_allclose(
            uni[o["pl_pt"]:o["pl_pt"] + 6],
            np.asarray(scene.plane_point).reshape(-1))
        np.testing.assert_allclose(
            uni[o["sph_o"]:o["sph_o"] + 12],
            np.asarray(scene.sphere_origin).reshape(-1))
        np.testing.assert_allclose(uni[o["sph_n"]:o["sph_n"] + 4],
                                   np.asarray(scene.sphere_mat.n))
        np.testing.assert_allclose(uni[o["li_i"]:o["li_i"] + 3],
                                   np.asarray(scene.light_intensity))

    def test_atlas_packing_roundtrip(self):
        assets = load_default_assets()
        atlas = build_atlas(assets)
        tex = np.asarray(assets.textures)
        packed = np.asarray(atlas.flat())
        # the precomputed row view (textures.pack_atlas_rows) must equal
        # the traced fallback packing
        fallback = build_atlas(assets._replace(atlas_rows=None))
        np.testing.assert_array_equal(packed, np.asarray(fallback.flat()))
        # texel (tid, y, x) -> flat index; check a few samples
        rng = np.random.default_rng(3)
        for _ in range(16):
            tid = rng.integers(0, tex.shape[0])
            y = rng.integers(0, tex.shape[1])
            x = rng.integers(0, tex.shape[2])
            flat = (tid * atlas.tex_h + y) * atlas.tex_w + x
            v = packed[flat]
            assert ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF) == \
                tuple(tex[tid, y, x])
        sky = np.asarray(assets.skybox)
        y, x = 100, 200
        v = packed[atlas.sky_base + y * atlas.sky_w + x]
        assert ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF) == \
            tuple(sky[y, x])


@tpu_only
class TestGoldenFullImage:
    """Full 800x600 depth-15 golden comparison on the Pallas engine —
    the reference's own raypng configuration (raypng.c:8-21) against its
    committed render (out/scene.png)."""

    def test_full_golden_image(self):
        from tpuray.io import GOLDEN_PNG, image_diff_stats, read_png
        from tpuray.kernels.pallas_trace import (render_pallas,
                                                 render_pallas_stats)
        scene = load_scene(RENDER_MAP).to_scene()
        assets = load_default_assets()
        cfg = RenderConfig(chunk_size=0)
        cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
                     GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
        basis = perspective_basis(cam, cfg.width, cfg.height)
        img = np.asarray(jax.jit(render_pallas, static_argnames="cfg")(
            scene, assets, basis, cfg))
        q = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        stats = image_diff_stats(q, read_png(GOLDEN_PNG))
        assert stats.mean_abs < 0.5, str(stats)
        assert stats.frac_within_8 > 0.995, str(stats)
        assert stats.psnr > 44.0, str(stats)

        ev = render_pallas_stats(scene, assets, basis, cfg)
        assert ev["max_slots_used"] <= cfg.resolved_event_slots()
        # dropped events exist at depth 15 (capacity capped at 24) but the
        # golden diff above proves they are below the noise floor
        assert ev["dropped_events"] < cfg.num_pixels * 0.05


class TestGoldenSlabInterpret:
    """Megakernel-vs-golden WITHOUT TPU hardware: render a full-width
    row slab of the reference image in Pallas interpret mode via the
    row0 uniform (the row-sharded rendering contract) and compare the
    slab against the committed out/scene.png rows.  This keeps a direct
    megakernel->reference link in the CPU-only suite; the full 800x600
    image runs under @tpu_only above."""

    @pytest.mark.parametrize("row0", [288,   # mid-image: ground + spheres
                                      8])    # top: skybox + mirror wall
    def test_golden_rows_interpret(self, row0):
        from tpuray.io import GOLDEN_PNG, read_png
        from tpuray.kernels.pallas_trace import render_pallas
        scene = load_scene(RENDER_MAP).to_scene()
        assets = load_default_assets()
        full = RenderConfig(chunk_size=0)     # 800x600 depth 15
        ROWS = 16
        cfg = full.replace(height=ROWS)
        cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
                     GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
        basis = perspective_basis(cam, full.width, full.height)
        img = np.asarray(render_pallas(scene, assets, basis, cfg,
                                       interpret=True, row0=float(row0)))
        q = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        gold = read_png(GOLDEN_PNG)[row0:row0 + ROWS]
        d = np.abs(q.astype(np.int32) - gold.astype(np.int32))
        assert d.mean() < 1.0, f"mean|d|={d.mean()}"
        assert (d <= 8).mean() > 0.99, f"within-8 {(d <= 8).mean()}"


@tpu_only
class TestPallasVsXla:
    def test_matches_xla_tracer(self):
        from tpuray.kernels.pallas_trace import render_pallas
        from tpuray.kernels.trace import trace_rays
        scene = load_scene(RENDER_MAP).to_scene()
        assets = load_default_assets()
        W, H = 256, 32
        cfg = RenderConfig(width=W, height=H, max_depth=3, chunk_size=0)
        cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)
        basis = perspective_basis(cam, W, H)
        a = np.asarray(jax.jit(render_pallas, static_argnames="cfg")(
            scene, assets, basis, cfg))
        o, d = generate_rays(basis, W, H)
        ids = jnp.arange(W * H, dtype=jnp.uint32)
        b = np.asarray(trace_rays(scene, assets, o, d, ids,
                                  cfg)).reshape(H, W, 3)
        dd = np.abs(a - b).max(-1)
        assert not np.isnan(a).any()
        # identical math modulo fused-arithmetic rounding; soft-shadow RNG
        # float path differs at the last ulp -> tiny tolerance
        assert (dd < 1e-2).mean() > 0.999, f"mismatch frac {(dd >= 1e-2).mean()}"

    def test_chunked_resolve_matches_direct(self, monkeypatch):
        """The event resolve chunks its row-gather when a tier exceeds
        CHUNK_EV events (bounds XLA's materialized [E, 64] temp); forcing
        a tiny chunk must not change the image."""
        from tpuray.kernels import pallas_trace as pt
        scene = load_scene(RENDER_MAP).to_scene()
        assets = load_default_assets()
        W, H = 128, 32
        cfg = RenderConfig(width=W, height=H, max_depth=3, chunk_size=0)
        cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR, 90.0, 1.0)
        basis = perspective_basis(cam, W, H)
        direct = np.asarray(pt.render_pallas(scene, assets, basis, cfg,
                                             interpret=True))
        monkeypatch.setattr(pt, "CHUNK_EV", 1024)
        chunked = np.asarray(pt.render_pallas(scene, assets, basis, cfg,
                                              interpret=True))
        np.testing.assert_array_equal(direct, chunked)


class TestKernelMathParity:
    """The megakernel's helper math is plain jnp on (S,128) registers, so
    it runs host-side: check it against the XLA tracer's primitives."""

    def test_map_to_cube_matches_primitives(self):
        from tpuray.kernels import primitives as pr
        from tpuray.kernels.pallas_trace import _map_to_cube
        rng = np.random.default_rng(11)
        d = rng.normal(size=(16, 128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        face = 1024
        u_ref, v_ref = pr.map_to_cube(jnp.asarray(d.reshape(-1, 3)), face)
        u_k, v_k = _map_to_cube(jnp.asarray(d[..., 0]),
                                jnp.asarray(d[..., 1]),
                                jnp.asarray(d[..., 2]), face)
        np.testing.assert_array_equal(np.asarray(u_k).reshape(-1),
                                      np.asarray(u_ref))
        np.testing.assert_array_equal(np.asarray(v_k).reshape(-1),
                                      np.asarray(v_ref))

    def test_xorshift_i32_matches_u32(self):
        """The kernel's i32 xorshift (logical shifts + unsigned-value
        rebuild) must reproduce the u32 implementation bit-for-bit in
        state and to 1 ulp in the float sample."""
        from tpuray.kernels.primitives import xorshift32 as xs_u32
        from tpuray.kernels.pallas_trace import _xorshift32 as xs_i32
        state_u = jnp.asarray(
            np.random.default_rng(5).integers(1, 2**32, 2048,
                                              dtype=np.uint64)
            .astype(np.uint32))
        state_i = state_u.astype(jnp.int32)  # same bits
        for _ in range(8):
            state_u, samp_u = xs_u32(state_u)
            state_i, samp_i = xs_i32(state_i)
            np.testing.assert_array_equal(
                np.asarray(state_u), np.asarray(state_i).astype(np.uint32))
            np.testing.assert_allclose(np.asarray(samp_u),
                                       np.asarray(samp_i), rtol=1e-6)

    def test_plane_basis_matches_primitives(self):
        from tpuray.kernels import primitives as pr
        from tpuray.kernels.pallas_trace import _plane_basis
        for n in [(0.0, 1.0, 0.0), (0.0, 0.0, -1.0), (1.0, 0.0, 0.0),
                  (0.6, 0.8, 0.0)]:
            b0_ref, b1_ref = pr.plane_texture_basis(
                jnp.asarray([n], jnp.float32))
            (b0x, b0y, b0z), (b1x, b1y, b1z) = _plane_basis(
                jnp.float32(n[0]), jnp.float32(n[1]), jnp.float32(n[2]))
            np.testing.assert_allclose(
                [float(b0x), float(b0y), float(b0z)],
                np.asarray(b0_ref)[0], atol=1e-7)
            np.testing.assert_allclose(
                [float(b1x), float(b1y), float(b1z)],
                np.asarray(b1_ref)[0], atol=1e-7)


class TestTriBlocks:
    """Host-side Moller-Trumbore matmul constants (build_tri_blocks): the
    [o, d, o x d, 1] . b_lhs[t] pair quantities must reproduce the XLA
    intersect_triangle decisions and t values."""

    def test_pair_quantities_match_intersect_triangle(self):
        from tpuray.kernels import primitives as pr
        from tpuray.kernels.pallas_trace import (TRI_TB, TRI_TRANSP_ROW,
                                                 build_tri_blocks)
        from tpuray.meshes import icosphere, mesh_triangles
        from tpuray.scene import PLASTIC, SceneSpec, build_scene

        v, f = icosphere(1)   # 80 triangles
        spec = SceneSpec(triangles=mesh_triangles(
            v, f, PLASTIC.replace(transparent=True), 0.8, (0.1, 0.2, 3.0)))
        scene = build_scene(spec)
        tri = build_tri_blocks(scene)
        assert tri.nblk == 1 and tri.b_lhs.shape == (10, 4 * TRI_TB)
        assert float(tri.attr[TRI_TRANSP_ROW].max()) == 1.0

        rng = np.random.default_rng(1)
        r = 256
        o = (np.array([0.0, 0.3, -3.0], np.float32)
             + 0.2 * rng.normal(size=(r, 3)).astype(np.float32))
        # aim at the mesh with jitter so a healthy fraction of rays hit
        aim = np.array([0.1, 0.2, 3.0], np.float32) - o
        d = (aim + 0.8 * rng.normal(size=(r, 3)).astype(np.float32))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        feats = np.concatenate(
            [o, d, np.cross(o, d), np.ones((r, 1), np.float32)], axis=1)
        m = (feats @ np.asarray(tri.b_lhs)).reshape(r, tri.nblk, 4, TRI_TB)
        det = m[:, :, 0].reshape(r, -1)
        tn = m[:, :, 1].reshape(r, -1)
        un = m[:, :, 2].reshape(r, -1)
        vn = m[:, :, 3].reshape(r, -1)
        ok = ((np.abs(det) > 1e-7) & (un * det >= 0) & (vn * det >= 0)
              & ((un + vn - det) * det <= 0) & (tn * det > 0))
        t = np.where(ok, tn / np.where(det == 0, 1, det),
                     np.inf)[:, :scene.num_triangles]

        hit, ts = pr.intersect_triangle(
            jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
            scene.tri_v0[None], scene.tri_v1[None], scene.tri_v2[None])
        t_ref = np.where(np.asarray(hit), np.asarray(ts), np.inf)
        agree = (np.isfinite(t) == np.isfinite(t_ref)).mean()
        assert agree > 0.9995, f"pair agreement {agree}"
        both = np.isfinite(t) & np.isfinite(t_ref)
        assert both.sum() > 50   # the sample must actually exercise hits
        np.testing.assert_allclose(t[both], t_ref[both], atol=1e-4)

    def test_block_aabbs_cover_mesh(self):
        from tpuray.kernels.pallas_trace import build_tri_blocks
        from tpuray.meshes import mesh_benchmark_scene
        scene = mesh_benchmark_scene(order=2).to_scene()
        tri = build_tri_blocks(scene)
        aabb = np.asarray(tri.aabb).reshape(tri.nblk, 6)
        verts = np.concatenate([np.asarray(scene.tri_v0),
                                np.asarray(scene.tri_v1),
                                np.asarray(scene.tri_v2)])
        assert (aabb[:, :3].min(0) <= verts.min(0) + 1e-6).all()
        assert (aabb[:, 3:].max(0) >= verts.max(0) - 1e-6).all()
        # per-block bounds must be tight enough to be useful: every block
        # lo <= hi and no block spans the whole scene on every axis
        assert (aabb[:, :3] <= aabb[:, 3:] + 1e-6).all()

    def test_superblock_aabbs_cover_blocks(self):
        from tpuray.kernels.pallas_trace import TRI_SB, build_tri_blocks
        from tpuray.meshes import mesh_benchmark_scene
        scene = mesh_benchmark_scene(order=3).to_scene()
        tri = build_tri_blocks(scene)
        assert tri.nsb == -(-tri.nblk // TRI_SB)
        aabb = np.asarray(tri.aabb).reshape(tri.nblk, 6)
        sb = np.asarray(tri.sb_aabb).reshape(tri.nsb, 6)
        assert np.isfinite(sb).all()   # tail pad must not leak +/-inf
        for s in range(tri.nsb):
            grp = aabb[s * TRI_SB:(s + 1) * TRI_SB]
            assert (sb[s, :3] <= grp[:, :3].min(0) + 1e-6).all()
            assert (sb[s, 3:] >= grp[:, 3:].max(0) - 1e-6).all()


@tpu_only
class TestTriangleEngine:
    """Megakernel-vs-XLA-tracer consistency on a triangle-mesh scene
    (VERDICT round-1 item 1: triangles on the fast engine)."""

    def test_mesh_scene_matches_xla_tracer(self):
        from tpuray.kernels.pallas_trace import render_pallas
        from tpuray.meshes import mesh_benchmark_scene
        from tpuray.render import render_from_basis_xla
        from tpuray.io import image_diff_stats

        scene = mesh_benchmark_scene(order=1).to_scene()
        assets = load_default_assets()
        cfg = RenderConfig(width=256, height=128, max_depth=3, chunk_size=0)
        cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
                     GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
        basis = perspective_basis(cam, cfg.width, cfg.height)

        img_p = np.asarray(jax.jit(
            lambda: render_pallas(scene, assets, basis, cfg))())
        img_x = np.asarray(render_from_basis_xla(scene, assets, basis, cfg))
        q = lambda im: np.clip(im, 0, 1) * 255.0  # noqa: E731
        stats = image_diff_stats(q(img_p).astype(np.uint8),
                                 q(img_x).astype(np.uint8))
        # matmul det/t rounding can flip edge pixels; the bulk must agree
        assert stats.frac_within_1 > 0.98, stats
        assert stats.mean_abs < 1.0, stats
