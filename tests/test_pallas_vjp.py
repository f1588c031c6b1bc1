"""Saved-path replay VJP tests (megakernel gradients).

The megakernel's record-mode forward runs in Pallas interpret mode on the
CPU backend, so these tests exercise the full custom-VJP pipeline —
record emission, replay reconstruction, and gradient equivalence against
the differentiable XLA scan tracer — without TPU hardware.  North-star
requirement: gradients "via custom VJPs" (BASELINE.json); the scan tracer
is the correctness oracle (its grads match finite differences,
tests/test_render.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpuray import diff
from tpuray.camera import Camera, perspective_basis
from tpuray.config import (GOLDEN_CAMERA_FOCAL, GOLDEN_CAMERA_FOV,
                           GOLDEN_CAMERA_LOOKDIR, GOLDEN_CAMERA_ORIGIN,
                           RenderConfig)
from tpuray.kernels.pallas_trace import (render_pallas,
                                         render_pallas_checked,
                                         render_pallas_record)
from tpuray.kernels.replay import replay_render
from tpuray.render import render_from_basis_xla
from tpuray.sceneio import load_scene
from tpuray.textures import load_default_assets

RENDER_MAP = "/root/reference/scenes/render.map"


def _tri_setup(width=48, height=32, depth=2):
    """Small mixed scene: 2 triangles + ground plane + sphere + light."""
    from tpuray.scene import (GLASS, PLASTIC, LightSpec, PlaneSpec,
                              SceneSpec, SphereSpec, TriangleSpec)
    spec = SceneSpec(
        spheres=[SphereSpec((1.5, 0.7, 2.5), 0.7, GLASS)],
        planes=[PlaneSpec((0.0, 1.0, 0.0), (0.0, 0.0, 0.0),
                          PLASTIC.replace(rgb=(0.4, 0.4, 0.4)))],
        triangles=[
            TriangleSpec((-1.2, 0.1, 3.0), (0.2, 0.2, 3.2),
                         (-0.5, 1.6, 2.8),
                         PLASTIC.replace(rgb=(0.9, 0.3, 0.2))),
            TriangleSpec((0.0, 0.1, 2.0), (1.0, 0.1, 2.4),
                         (0.6, 1.2, 2.2),
                         PLASTIC.replace(rgb=(0.2, 0.8, 0.3),
                                         reflectivity=0.3)),
        ],
        lights=[LightSpec((0.5, 4.0, 0.0), 0.1, 40.0, (1.0, 1.0, 1.0))])
    scene = spec.to_scene()
    assets = load_default_assets()
    cfg = RenderConfig(width=width, height=height, max_depth=depth,
                       engine="pallas", chunk_size=0, loop="scan")
    cam = Camera((0.0, 1.0, -3.0), (0.0, 0.0, 1.0), 90.0, 1.0)
    basis = perspective_basis(cam, width, height)
    return scene, assets, cfg, basis


def _setup(width=64, height=48, depth=3):
    scene = load_scene(RENDER_MAP).to_scene()
    assets = load_default_assets()
    cfg = RenderConfig(width=width, height=height, max_depth=depth,
                       engine="pallas", chunk_size=0, loop="scan")
    cam = Camera(GOLDEN_CAMERA_ORIGIN, GOLDEN_CAMERA_LOOKDIR,
                 GOLDEN_CAMERA_FOV, GOLDEN_CAMERA_FOCAL)
    basis = perspective_basis(cam, cfg.width, cfg.height)
    return scene, assets, cfg, basis


class TestReplayForward:
    def test_replay_reproduces_megakernel_render(self):
        """The dense replay of the recorded paths must equal the kernel's
        own image — this validates both the records and the replay math."""
        scene, assets, cfg, basis = _setup()
        img, records = render_pallas_record(scene, assets, basis, cfg,
                                            interpret=True)
        assert int(records["max_nodes"]) <= cfg.resolved_record_slots()
        rep = replay_render(scene, assets, basis, records, cfg)
        d = np.abs(np.asarray(img) - np.asarray(rep))
        # discrete decisions (hit ids, texel picks) are exact by
        # construction; the residual is f32 op-order noise amplified by
        # the ^shininess specular powers
        assert d.mean() < 1e-3, f"replay mismatch: mean|d|={d.mean()}"
        assert d.max() < 5e-2, f"replay mismatch: max|d|={d.max()}"

    def test_replay_reproduces_megakernel_render_triangles(self):
        """Triangle scenes record the winning triangle id (rec bits
        16-30, code 126) and the replay recomputes the Moller-Trumbore
        hit from it — replay image must match the kernel's."""
        scene, assets, cfg, basis = _tri_setup()
        img, records = render_pallas_record(scene, assets, basis, cfg,
                                            interpret=True)
        rep = replay_render(scene, assets, basis, records, cfg)
        d = np.abs(np.asarray(img) - np.asarray(rep))
        # the kernel's pair t is an MXU matmul; the replay recomputes it
        # elementwise — slightly looser than the analytic-solid bound
        assert d.mean() < 2e-3, f"replay mismatch: mean|d|={d.mean()}"
        assert d.max() < 1e-1, f"replay mismatch: max|d|={d.max()}"

    def test_replay_streamed_scene_wide_ids(self, monkeypatch):
        """Scenes above TRI_MAX_TRIANGLES record full-width winner ids
        in their own plane (records['wid']) instead of the packed
        15-bit field; the replay must reproduce the streamed kernel's
        image from them.  Forcing the cap down exercises the path on a
        small mesh in interpret mode."""
        import tpuray.kernels.pallas_trace as pt
        from tpuray.meshes import add_mesh, icosphere
        from tpuray.scene import PLASTIC, LightSpec, PlaneSpec, SceneSpec

        monkeypatch.setattr(pt, "TRI_MAX_TRIANGLES", 64)
        monkeypatch.setattr(pt, "TRI_STREAM_TB", 128)

        spec = SceneSpec(
            planes=[PlaneSpec((0.0, 1.0, 0.0), (0.0, 0.0, 0.0),
                              PLASTIC.replace(rgb=(0.4, 0.4, 0.4)))],
            lights=[LightSpec((0.5, 4.0, 0.0), 0.1, 40.0,
                              (1.0, 1.0, 1.0))])
        v, f = icosphere(1)   # 80 tris > the patched 64-tri cap
        add_mesh(spec, v, f, PLASTIC.replace(rgb=(0.9, 0.3, 0.2)),
                 scale=0.9, offset=(0.3, 1.0, 2.5))
        scene = spec.to_scene()
        assets = load_default_assets()
        cfg = RenderConfig(width=32, height=16, max_depth=2,
                           engine="pallas", chunk_size=0, loop="scan")
        basis = perspective_basis(
            Camera((0.0, 1.0, -3.0), (0.0, 0.0, 1.0), 90.0, 1.0), 32, 16)

        img, records = render_pallas_record(scene, assets, basis, cfg,
                                            interpret=True)
        assert "wid" in records
        rep = replay_render(scene, assets, basis, records, cfg)
        d = np.abs(np.asarray(img) - np.asarray(rep))
        assert d.mean() < 2e-3, f"replay mismatch: mean|d|={d.mean()}"
        assert d.max() < 1e-1, f"replay mismatch: max|d|={d.max()}"


class TestReplayBilinear:
    def test_bilinear_replay_reproduces_megakernel_render(self):
        """Record mode with cfg.filter='bilinear': the kernel emits 4
        weighted events per fetch; the replay re-reads the 4 recorded
        taps with recomputed (differentiable) fractional weights and must
        reproduce the kernel's image."""
        scene, assets, cfg, basis = _setup(width=48, height=32, depth=2)
        cfg = cfg.replace(filter="bilinear")
        img, records = render_pallas_record(scene, assets, basis, cfg,
                                            interpret=True)
        rep = replay_render(scene, assets, basis, records, cfg)
        d = np.abs(np.asarray(img) - np.asarray(rep))
        assert d.mean() < 1e-3, f"replay mismatch: mean|d|={d.mean()}"
        assert d.max() < 5e-2, f"replay mismatch: max|d|={d.max()}"

    def test_bilinear_replay_gives_spatial_texture_gradients(self):
        """The whole point of bilinear on the fast path: the recomputed
        tap weights give texture lookups a spatial derivative, so
        plane-geometry params (which move the hit point across texels)
        get nonzero gradients through the replay."""
        scene, assets, cfg, basis = _setup(width=32, height=24, depth=2)
        cfg = cfg.replace(filter="bilinear")
        _, records = render_pallas_record(scene, assets, basis, cfg,
                                          interpret=True)
        d_scene, rest = diff.partition(scene)

        def loss(dd):
            img = replay_render(diff.combine(dd, rest), assets, basis,
                                records, cfg)
            return jnp.sum(img)

        g = jax.grad(loss)(d_scene)
        assert float(np.abs(np.asarray(g.plane_point)).sum()) > 0
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))


class TestReplayOverflowConsistency:
    def test_record_overflow_is_reported(self):
        """A starved record buffer must still report the TRUE node count
        so callers can re-record with capacity (the invrender preflight,
        apps/invrender.py)."""
        scene, assets, cfg, basis = _setup(width=32, height=24, depth=3)
        _, rec_full = render_pallas_record(scene, assets, basis, cfg,
                                           interpret=True)
        need = int(rec_full["max_nodes"])
        assert need > 4
        cfg4 = cfg.replace(record_slots=4)
        _, rec4 = render_pallas_record(scene, assets, basis, cfg4,
                                       interpret=True)
        assert int(rec4["max_nodes"]) == need

    def test_replay_matches_degraded_kernel_image_under_overflow(self):
        """When the event buffer overflows, the kernel image silently
        drops the overflowed texel contributions — the replay must drop
        exactly the same ones so the custom VJP differentiates the image
        the loss actually saw (code-review finding, round 2).

        The invariant is asserted on numerically STABLE pixels: a pixel
        whose kernel/replay forwards disagree even with NO drops sits on
        a measure-zero chaotic path (grazing sphere hit with a
        near-cancelling discriminant feeding a near-TIR Schlick chain)
        where ulp-level rounding differences between the two compiled
        programs amplify ~10x — on the axon TPU backend one such pixel
        diverges by 0.1 at 48x32 d4 while the records provably match the
        kernel image when replayed with CPU rounding (round-5 analysis,
        PARITY.md).  Drop accounting is what this test guards, and it
        must hold wherever the recomputation is stable."""
        scene, assets, cfg, basis = _setup(width=48, height=32, depth=4)
        # chaos mask from the no-drop comparison (full event capacity)
        img_f, rec_f = render_pallas_record(scene, assets, basis, cfg,
                                            interpret=True)
        rep_f = replay_render(scene, assets, basis, rec_f, cfg)
        d_full = np.abs(np.asarray(img_f) - np.asarray(rep_f)).max(-1)
        stable = d_full < 5e-2
        assert stable.mean() > 0.995, \
            f"too many chaotic pixels: {(~stable).sum()}"

        cfg1 = cfg.replace(event_slots=1)   # force drops
        img, records = render_pallas_record(scene, assets, basis, cfg1,
                                            interpret=True)
        # the degraded image must actually differ (drops happened) …
        assert np.abs(np.asarray(img) - np.asarray(img_f)).max() > 1e-2
        rep = replay_render(scene, assets, basis, records, cfg1)
        d = np.abs(np.asarray(img) - np.asarray(rep)).max(-1)[stable]
        # … and the replay must track the degraded kernel image exactly
        # where recomputation is stable
        assert d.mean() < 1e-3, f"replay/kernel divergence: {d.mean()}"
        assert d.max() < 5e-2, f"replay/kernel divergence: {d.max()}"


class TestOverflowFeedback:
    def test_checked_render_reports_and_capacity_fix_is_lossless(self):
        """Event-overflow telemetry: a starved event buffer must report
        dropped events and a needed capacity that, when applied, renders
        losslessly (the raypng feedback loop, VERDICT r1 weak item 2)."""
        scene, assets, cfg, basis = _setup(width=48, height=32, depth=4)
        cfg1 = cfg.replace(event_slots=1)
        img1, dropped1, needed1 = render_pallas_checked(
            scene, assets, basis, cfg1, interpret=True)
        assert int(dropped1) > 0
        assert int(needed1) > 1

        cfg2 = cfg1.replace(event_slots=min(int(needed1), 64))
        img2, dropped2, _ = render_pallas_checked(
            scene, assets, basis, cfg2, interpret=True)
        assert int(dropped2) == 0
        full = render_pallas(scene, assets, basis,
                             cfg.replace(event_slots=0), interpret=True)
        np.testing.assert_allclose(np.asarray(img2), np.asarray(full),
                                   atol=1e-5)


class TestReplayGradients:
    def test_custom_vjp_matches_scan_tracer_grads(self):
        """jax.grad through the megakernel custom VJP vs the scan tracer
        on render.map — the VERDICT round-2 'done' criterion (at reduced
        resolution for CPU CI; the scan tracer is the FD-validated
        oracle)."""
        scene, assets, cfg, basis = _setup(width=48, height=32, depth=2)

        # build records once (concrete), then grad the replay directly —
        # identical to render_pallas_diff's bwd wiring, minus the
        # TPU-only non-interpret forward
        img_p, records = render_pallas_record(scene, assets, basis, cfg,
                                              interpret=True)
        records = jax.device_get(records)

        # gradients are only comparable where both engines took the SAME
        # discrete path (hit ids, texel picks): mask out pixels whose
        # forwards differ beyond float noise, weight the rest distinctly
        # so every surviving path carries a unique cotangent
        img_x = render_from_basis_xla(scene, assets, basis, cfg)
        agree = np.abs(np.asarray(img_p) - np.asarray(img_x)).max(-1) < 1e-4
        assert agree.sum() > 0.25 * agree.size
        key = jax.random.PRNGKey(0)
        wimg = jax.random.uniform(key, (cfg.height, cfg.width, 3)) \
            * jnp.asarray(agree)[..., None]

        def loss_replay(d_scene):
            s = diff.combine(d_scene, rest)
            img = replay_render(s, assets, basis, records, cfg)
            return jnp.sum(img * wimg)

        def loss_scan(d_scene):
            s = diff.combine(d_scene, rest)
            img = render_from_basis_xla(s, assets, basis, cfg)
            return jnp.sum(img * wimg)

        d_scene, rest = diff.partition(scene)
        g_rep = jax.grad(loss_replay)(d_scene)
        g_scan = jax.grad(loss_scan)(d_scene)

        leaves_r = jax.tree.leaves(g_rep)
        leaves_s = jax.tree.leaves(g_scan)
        assert len(leaves_r) == len(leaves_s)
        for lr, ls in zip(leaves_r, leaves_s):
            lr = np.asarray(lr)
            ls = np.asarray(ls)
            if lr.size == 0:
                continue   # triangle leaves are empty on render.map
            # 2e-2: sphere_radius grads amplify f32 forward noise through
            # d t/d r ~ 1/sqrt(disc) at grazing hits; every other leaf
            # agrees to <3e-3 (measured) and a real defect (e.g. the NaN
            # cotangents this test caught in development) blows far past
            # this bound
            scale = max(np.abs(ls).max(), 1e-3)
            np.testing.assert_allclose(lr, ls, rtol=0, atol=2e-2 * scale)

    def test_triangle_grads_match_scan_tracer(self):
        """Replay grads through recorded triangle hits vs the scan tracer
        — including the triangle vertex and material leaves (ROADMAP
        round-2 item 3)."""
        scene, assets, cfg, basis = _tri_setup()
        img_p, records = render_pallas_record(scene, assets, basis, cfg,
                                              interpret=True)
        records = jax.device_get(records)
        img_x = render_from_basis_xla(scene, assets, basis, cfg)
        agree = np.abs(np.asarray(img_p) - np.asarray(img_x)).max(-1) < 1e-4
        assert agree.sum() > 0.25 * agree.size
        key = jax.random.PRNGKey(1)
        wimg = jax.random.uniform(key, (cfg.height, cfg.width, 3)) \
            * jnp.asarray(agree)[..., None]

        d_scene, rest = diff.partition(scene)

        def loss_replay(d):
            img = replay_render(diff.combine(d, rest), assets, basis,
                                records, cfg)
            return jnp.sum(img * wimg)

        def loss_scan(d):
            img = render_from_basis_xla(diff.combine(d, rest), assets,
                                        basis, cfg)
            return jnp.sum(img * wimg)

        g_rep = jax.grad(loss_replay)(d_scene)
        g_scan = jax.grad(loss_scan)(d_scene)
        assert float(np.abs(np.asarray(g_rep.tri_v0)).sum()) > 0
        assert float(np.abs(np.asarray(g_rep.tri_mat.diffuse)).sum()) > 0
        for lr, ls in zip(jax.tree.leaves(g_rep), jax.tree.leaves(g_scan)):
            lr, ls = np.asarray(lr), np.asarray(ls)
            if lr.size == 0:
                continue
            scale = max(np.abs(ls).max(), 1e-3)
            np.testing.assert_allclose(lr, ls, rtol=0, atol=2e-2 * scale)

    def test_grad_nonzero_for_material_and_light_params(self):
        scene, assets, cfg, basis = _setup(width=32, height=24, depth=2)
        _, records = render_pallas_record(scene, assets, basis, cfg,
                                          interpret=True)
        d_scene, rest = diff.partition(scene)

        def loss(d):
            img = replay_render(diff.combine(d, rest), assets, basis,
                                records, cfg)
            return jnp.sum(img)

        g = jax.grad(loss)(d_scene)
        assert float(np.abs(np.asarray(g.sphere_mat.ambient)).sum()) > 0
        assert float(np.abs(np.asarray(g.light_origin)).sum()) > 0
        assert float(np.abs(np.asarray(g.light_intensity)).sum()) > 0
        assert float(np.abs(np.asarray(g.sphere_origin)).sum()) > 0
