"""End-to-end render tests: golden parity, sharding, and gradients.

The golden test validates against the reference's only correctness artifact,
the committed 800x600 render ``/root/reference/out/scene.png``
(raypng.c:100), on a subsampled pixel grid (full-image parity is checked by
apps/raypng.py on TPU; CPU CI uses every Nth pixel to stay fast).  The
soft-shadow RNG is seeded by absolute pixel id (raytracing.cl:32-34), so a
traced subset reproduces those exact pixels.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuray.camera import Camera, generate_rays, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_FOCAL, GOLDEN_CAMERA_FOV,
                           GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray import diff
from tpuray.io import GOLDEN_PNG, read_png
from tpuray.kernels.trace import trace_rays
from tpuray.scene import (GLASS, PLASTIC, LightSpec, PlaneSpec, SceneSpec,
                          SphereSpec, canonical_scene_spec)
from tpuray.sceneio import load_scene
from tpuray.textures import load_default_assets, solid_assets

RENDER_MAP = "/root/reference/scenes/render.map"


def _golden_camera():
    return Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
                  GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)


def _tiny_scene() -> SceneSpec:
    return SceneSpec(
        spheres=[
            SphereSpec((0.0, 1.0, 3.0), 1.0,
                       PLASTIC.replace(rgb=(1.0, 0.2, 0.2))),
            SphereSpec((1.5, 0.7, 2.0), 0.7, GLASS),
        ],
        planes=[PlaneSpec((0.0, 1.0, 0.0), (0.0, 0.0, 0.0),
                          PLASTIC.replace(rgb=(0.4, 0.4, 0.4)))],
        lights=[LightSpec((2.0, 4.0, 0.0), 0.1, 30.0, (1.0, 1.0, 1.0))],
    )


class TestRowOffsetRays:
    def test_row0_generates_the_global_row_block(self):
        """generate_rays(row0=r) must equal rows [r, r+h) of the full-image
        rays — the contract row-sharded rendering and the sharded replay
        VJP rely on (parallel/shard.py, kernels/replay.py)."""
        basis = perspective_basis(_golden_camera(), 64, 48)
        o_full, d_full = generate_rays(basis, 64, 48)
        o_shard, d_shard = generate_rays(basis, 64, 16, row0=24.0)
        np.testing.assert_array_equal(
            np.asarray(d_shard),
            np.asarray(d_full).reshape(48, 64, 3)[24:40].reshape(-1, 3))
        np.testing.assert_array_equal(np.asarray(o_shard),
                                      np.asarray(o_full)[:16 * 64])


class TestBilinearMegakernel:
    def test_megakernel_bilinear_matches_tracer(self):
        """cfg.filter='bilinear' on the Pallas engine (4 weighted events
        per fetch, primitives.bilinear_taps order) must reproduce the XLA
        tracer's bilinear render on the real textured/skyboxed scene."""
        from tpuray.kernels.pallas_trace import render_pallas
        from tpuray.render import render_from_basis_xla
        scene = load_scene(RENDER_MAP).to_scene()
        assets = load_default_assets()
        W, H = 128, 32
        cfg = RenderConfig(width=W, height=H, max_depth=3, chunk_size=0,
                           filter="bilinear")
        basis = perspective_basis(_golden_camera(), W, H)
        a = np.asarray(render_pallas(scene, assets, basis, cfg,
                                     interpret=True))
        b = np.asarray(render_from_basis_xla(scene, assets, basis, cfg))
        d = np.abs(a - b).max(-1)
        assert not np.isnan(a).any()
        assert (d < 1e-2).mean() > 0.995, f"mismatch {(d >= 1e-2).mean()}"
        # bilinear must actually differ from nearest somewhere (the sky
        # gradient bands / texture edges), or the mode silently no-ops
        nearest = np.asarray(render_pallas(
            scene, assets, basis, cfg.replace(filter="nearest"),
            interpret=True))
        assert np.abs(a - nearest).max() > 1e-3


class TestCheckedRenderFallback:
    def test_xla_engine_returns_zero_drop_info(self):
        """render_from_basis_checked on a scene the megakernel does not
        take (force engine='xla') reports the XLA engine with no drops."""
        from tpuray.render import render_from_basis_checked
        scene = _tiny_scene().to_scene()
        assets = solid_assets()
        cfg = RenderConfig(width=32, height=16, max_depth=2, chunk_size=0,
                           engine="xla")
        basis = perspective_basis(_golden_camera(), 32, 16)
        img, info = render_from_basis_checked(scene, assets, basis, cfg)
        assert img.shape == (16, 32, 3)
        assert info["engine"] == "xla" and info["dropped"] == 0


class TestGoldenParity:
    STRIDE = 331  # prime: samples all over the image

    def test_subsampled_pixels_match_reference_render(self):
        scene = load_scene(RENDER_MAP).to_scene()
        assets = load_default_assets()
        cfg = RenderConfig(chunk_size=0)
        basis = perspective_basis(_golden_camera(), cfg.width, cfg.height)
        o, d = generate_rays(basis, cfg.width, cfg.height)
        ids = np.arange(cfg.num_pixels, dtype=np.uint32)[::self.STRIDE]
        rgb = trace_rays(scene, assets, jnp.asarray(o)[ids],
                         jnp.asarray(d)[ids], jnp.asarray(ids), cfg)
        ours = np.asarray(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8)

        gold = read_png(GOLDEN_PNG).reshape(-1, 3)[ids]
        d8 = np.abs(ours.astype(np.int32) - gold.astype(np.int32))
        # float32-rounding tolerance: the vast majority of subpixels must be
        # within +-1 of the OpenCL render; a tiny fraction may fall on
        # soft-shadow / silhouette boundaries
        assert (d8 <= 1).mean() > 0.93, f"within-1 frac {(d8 <= 1).mean()}"
        assert (d8 <= 8).mean() > 0.99, f"within-8 frac {(d8 <= 8).mean()}"
        assert d8.mean() < 2.0, f"mean |diff| {d8.mean()}"


class TestShardedRender:
    """Sharding runs in a scrubbed-env subprocess on 8 virtual CPU devices.

    In-process the axon TPU plugin (registered from sitecustomize before
    conftest runs) pins a 1-device backend, so an in-process "sharding"
    test would not shard — see tests/sharding_subproc.py."""

    _result = None

    @classmethod
    def _run(cls):
        if cls._result is None:
            import subprocess
            import sys
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)   # disables axon plugin
            env["JAX_PLATFORMS"] = "cpu"
            flags = env.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                env["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count=8"
                ).strip()
            script = os.path.join(os.path.dirname(__file__),
                                  "sharding_subproc.py")
            proc = subprocess.run(
                [sys.executable, script], env=env, capture_output=True,
                text=True, timeout=1200)
            cls._result = proc
        return cls._result

    def _assert_ok(self, name):
        proc = self._run()
        assert f"ok {name}" in proc.stdout, (
            f"check {name!r} did not pass:\n--- stdout\n{proc.stdout}"
            f"\n--- stderr\n{proc.stderr[-3000:]}")

    def test_mesh_has_8_devices(self):
        self._assert_ok("mesh8")

    def test_sharded_matches_single_device(self):
        self._assert_ok("forward")

    def test_sharded_grad_runs_and_is_finite(self):
        self._assert_ok("grad")

    def test_megakernel_under_shard_map(self):
        self._assert_ok("pallas")

    def test_scene_parallel_matches_single_device(self):
        self._assert_ok("scene_parallel")

    def test_2d_mesh_pixels_x_triangles(self):
        self._assert_ok("mesh2d")

    def test_scene_parallel_on_pallas_query_kernels(self):
        """VERDICT r4 item 4: triangles sharded across the mesh with
        each device's queries running the megakernel's MXU block-sweep
        kernels (tri_query='pallas_interpret')."""
        self._assert_ok("pallas_scene_parallel")

    def test_2d_mesh_on_pallas_query_kernels(self):
        self._assert_ok("pallas_mesh2d")

    def test_streamed_tri_blocks_under_shard_map(self):
        self._assert_ok("pallas_stream")

    def test_sharded_replay_vjp_matches_single_device(self):
        self._assert_ok("pallas_grad")

    def test_distributed_bootstrap_single_process(self):
        self._assert_ok("distributed")

    def test_subprocess_completed(self):
        proc = self._run()
        assert proc.returncode == 0 and "SHARDING_OK" in proc.stdout, (
            f"--- stdout\n{proc.stdout}\n--- stderr\n{proc.stderr[-3000:]}")


def _get(tree, path):
    cur = tree
    for part in path.split("."):
        cur = getattr(cur, part)
    return cur


def _perturbed(scene, field, idx, delta):
    arr = np.asarray(_get(scene, field)).copy()
    arr[idx] += delta
    parts = field.split(".")
    if len(parts) == 1:
        return scene._replace(**{field: jnp.asarray(arr)})
    mat = _get(scene, parts[0])._replace(**{parts[1]: jnp.asarray(arr)})
    return scene._replace(**{parts[0]: mat})


class TestGradients:
    """Analytic grads vs central finite differences (north-star gate).

    Hit/miss boundaries are step functions, so analytic (select-based)
    gradients are compared to FD *away from silhouettes*: geometry-parameter
    tests weight the loss by an interior-pixel mask (rays whose sphere-hit
    discriminant is comfortably positive), exactly the regime in which the
    north star requires parity.
    """

    CFG = RenderConfig(width=32, height=24, max_depth=2, chunk_size=0,
                       loop="scan", scan_iters=8,
                       shadow_samples=0)  # smooth direct lighting

    @classmethod
    def _build(cls, spec):
        """One jitted weighted loss + its full scene-grad; FD re-evals reuse
        the same executable (weights are an argument, not a constant)."""
        scene = spec.to_scene()
        assets = solid_assets()
        cfg = cls.CFG
        basis = perspective_basis(_golden_camera(), cfg.width, cfg.height)
        o, d = generate_rays(basis, cfg.width, cfg.height)
        ids = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)

        @jax.jit
        def loss(s, w):
            rgb = trace_rays(s, assets, o, d, ids, cfg)
            return jnp.sum(w * rgb * jnp.array([[0.3, 0.5, 0.2]]))

        grad_fn = jax.jit(
            lambda s, w: diff.value_and_scene_grad(loss, s, w)[1])
        return scene, np.asarray(o), np.asarray(d), loss, grad_fn

    @classmethod
    def appearance(cls):
        if not hasattr(cls, "_appearance"):
            cls._appearance = cls._build(_tiny_scene())
        return cls._appearance

    @classmethod
    def geometry(cls):
        if not hasattr(cls, "_geometry"):
            spec = SceneSpec(
                spheres=[SphereSpec((0.0, 1.0, 3.0), 1.0,
                                    PLASTIC.replace(rgb=(1.0, 0.2, 0.2)))],
                planes=[PlaneSpec((0.0, 1.0, 0.0), (0.0, 0.0, 0.0),
                                  PLASTIC.replace(rgb=(0.4, 0.4, 0.4)))],
                lights=[LightSpec((2.0, 4.0, 0.0), 0.1, 30.0,
                                  (1.0, 1.0, 1.0))],
            )
            cls._geometry = cls._build(spec)
        return cls._geometry

    @staticmethod
    def _sphere_disc(scene, i, o, d):
        v = o - np.asarray(scene.sphere_origin[i])
        b = 2.0 * (v * d).sum(-1)
        return (b * b - 4.0 * (d * d).sum(-1)
                * ((v * v).sum(-1) - float(scene.sphere_radius[i]) ** 2))

    def _check(self, built, w, field, idx, eps, rel=2e-2):
        scene, _, _, loss, grad_fn = built
        w = jnp.asarray(w, jnp.float32)
        grads = grad_fn(scene, w)
        g = float(np.asarray(_get(grads, field))[idx])
        lp = float(loss(_perturbed(scene, field, idx, +eps), w))
        lm = float(loss(_perturbed(scene, field, idx, -eps), w))
        fd = (lp - lm) / (2 * eps)
        assert np.isfinite(g)
        tol = max(rel * max(abs(fd), abs(g)), 1e-3)
        assert abs(g - fd) <= tol, f"{field}{idx}: analytic {g} vs fd {fd}"

    # eps sized so the loss delta clears float32 cancellation noise
    @pytest.mark.parametrize("field,idx,eps", [
        ("light_intensity", (0,), 1e-1),
        ("light_origin", (0, 1), 1e-2),
        ("sphere_mat.rgb", (0, 0), 1e-1),
        ("sphere_mat.reflectivity", (0,), 2e-2),
        ("sphere_mat.ambient", (0,), 5e-2),
    ])
    def test_appearance_grad_matches_fd(self, field, idx, eps):
        """Light/material params: smooth everywhere -> full-image loss."""
        built = self.appearance()
        w = np.ones((self.CFG.num_pixels, 1), np.float32)
        self._check(built, w, field, idx, eps)

    @pytest.mark.parametrize("field,idx,eps", [
        ("sphere_origin", (0, 2), 1e-3),
        ("sphere_origin", (0, 0), 1e-3),
        ("sphere_radius", (0,), 1e-3),
    ])
    def test_geometry_grad_matches_fd_interior(self, field, idx, eps):
        """Geometry params: FD vs analytic on silhouette-free pixels
        (interior mask = sphere-hit discriminant comfortably positive)."""
        built = self.geometry()
        scene, o, d = built[0], built[1], built[2]
        disc = self._sphere_disc(scene, 0, o, d)
        w = (disc > 0.3).astype(np.float32)[:, None]
        assert w.sum() >= 3, "interior mask too small for this setup"
        self._check(built, w, field, idx, eps)

    def test_plane_point_grad_matches_fd(self):
        """Plane offset: loss over plane-hit pixels that miss the sphere."""
        built = self.geometry()
        scene, o, d = built[0], built[1], built[2]
        miss = self._sphere_disc(scene, 0, o, d) < -0.3
        ground = d[:, 1] < -0.05
        w = (miss & ground).astype(np.float32)[:, None]
        assert w.sum() >= 10
        self._check(built, w, "plane_point", (0, 1), 1e-3)


class TestBilinearFilter:
    """cfg.filter='bilinear' (no reference analog; the reference fetch is a
    nearest integer read, primitives.cl:250-256).  Bilinear weights give the
    texture lookup a spatial derivative, so hit-point motion produces
    texture gradients that match finite differences."""

    def _setup(self):
        tex = np.zeros((1, 8, 8, 3), np.uint8)
        tex[0, :, :, 0] = (np.arange(8)[None, :] * 20).astype(np.uint8)
        tex[0, :, :, 1] = (np.arange(8)[:, None] * 20).astype(np.uint8)
        tex[0, :, :, 2] = 90
        assets = __import__("tpuray.textures", fromlist=["SceneAssets"]) \
            .SceneAssets(textures=jnp.asarray(tex),
                         skybox=jnp.zeros((12, 16, 3), jnp.uint8))
        spec = SceneSpec(
            planes=[PlaneSpec((0.0, 1.0, 0.0), (0.0, 0.0, 0.0),
                              PLASTIC.replace(texture_id=0,
                                              texture_scale=1.0))],
            lights=[LightSpec((2.0, 3.0, 2.0), 0.1, 25.0, (1.0, 1.0, 1.0))],
        )
        cfg = RenderConfig(width=16, height=12, max_depth=1, chunk_size=0,
                           loop="scan", scan_iters=4, shadow_samples=0,
                           filter="bilinear")
        # steep look-down over hit points ~ (2.5, 0, 2.5): texel coords stay
        # inside (1, 4), away from the u=0 / u=8 wrap seams of the ramp
        cam = Camera((2.5, 1.5, 2.5), (0.02, -0.99, 0.02), 40.0, 1.0)
        basis = perspective_basis(cam, cfg.width, cfg.height)
        o, d = generate_rays(basis, cfg.width, cfg.height)
        ids = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
        scene = spec.to_scene()

        @jax.jit
        def loss(s):
            rgb = trace_rays(s, assets, o, d, ids, cfg)
            return jnp.sum(rgb * jnp.array([[0.3, 0.5, 0.2]]))

        return scene, loss

    def test_textured_plane_spatial_gradient_matches_fd(self):
        scene, loss = self._setup()
        grads = jax.jit(
            lambda s: diff.value_and_scene_grad(loss, s)[1])(scene)
        # moving the ground plane along y shifts every hit point, hence the
        # (u, v) texel coords; with bilinear weights that spatial texture
        # term is part of the analytic gradient
        idx, eps = (0, 1), 3e-4
        g = float(np.asarray(grads.plane_point)[idx])
        lp = float(loss(_perturbed(scene, "plane_point", idx, +eps)))
        lm = float(loss(_perturbed(scene, "plane_point", idx, -eps)))
        fd = (lp - lm) / (2 * eps)
        assert np.isfinite(g) and abs(fd) > 1e-3, (g, fd)
        assert abs(g - fd) <= max(5e-2 * abs(fd), 2e-2), (g, fd)

    def test_bilinear_reduces_to_nearest_on_flat_texture(self):
        from tpuray.kernels.trace import sample_skybox
        sky = jnp.full((12, 16, 3), 77, jnp.uint8)
        d = jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)),
                        jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        near = sample_skybox(sky, d, "nearest")
        bil = sample_skybox(sky, d, "bilinear")
        np.testing.assert_allclose(np.asarray(bil), np.asarray(near),
                                   atol=1e-6)
