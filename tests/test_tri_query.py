"""Standalone triangle-query kernels (the scene-parallel unit).

Covers the r5 pad-robustness regression: a zero-padded ray lane (o=0,
d=0) has identical slab points on every axis, so +INF pad-block AABB
rows pass the interval test (INF >= INF) — the compacted hit list then
fed out-of-range block ids to the sweep, which returned winner ids past
the triangle count from garbage reads.  Caught on hardware; reproduces
in interpret mode with a ray count that is not a tile multiple and a
block count that is not a multiple of 8 (pad blocks exist).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuray.kernels.pallas_trace import (build_tri_blocks,
                                         tri_query_blocker,
                                         tri_query_closest)
from tpuray.meshes import mesh_benchmark_scene


@pytest.fixture(scope="module")
def mesh_scene():
    scene = mesh_benchmark_scene(1).to_scene()   # 2,384 tris -> 19 blocks
    tri = build_tri_blocks(scene)
    assert tri.nblk % 8 != 0   # pad blocks exist (the regression trigger)
    return scene


def _rays(p=300):
    # p chosen so the last 16x128 tile is mostly zero-padded lanes
    rng = np.random.default_rng(7)
    o = rng.uniform(-3.0, 3.0, (p, 3)).astype(np.float32)
    d = rng.normal(size=(p, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _mt_closest_numpy(scene, o, d):
    """Brute-force Moller-Trumbore oracle (f64 for a stable reference)."""
    v0 = np.asarray(scene.tri_v0, np.float64)
    e1 = np.asarray(scene.tri_v1, np.float64) - v0
    e2 = np.asarray(scene.tri_v2, np.float64) - v0
    o = np.asarray(o, np.float64)[:, None, :]
    d = np.asarray(d, np.float64)[:, None, :]
    p = np.cross(d, e2[None])
    det = (p * e1[None]).sum(-1)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    tv = o - v0[None]
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1[None])
    v = (d * q).sum(-1) * inv
    t = (e2[None] * q).sum(-1) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
    t = np.where(hit, t, np.inf)
    return t.min(axis=1)


def test_closest_matches_bruteforce_oracle(mesh_scene):
    o, d = _rays()
    t, wid = tri_query_closest(mesh_scene, o, d, interpret=True)
    t = np.asarray(t)
    wid = np.asarray(wid)
    # every winner id in range — the pad-block regression returned ids
    # past the triangle count
    hits = np.isfinite(t)
    assert wid[hits].max(initial=0) < mesh_scene.num_triangles
    t_ref = _mt_closest_numpy(mesh_scene, o, d)
    # identical hit set and close t (kernel is f32 / bf16x3)
    assert np.array_equal(hits, np.isfinite(t_ref))
    np.testing.assert_allclose(t[hits], t_ref[hits], rtol=2e-3, atol=2e-3)


def test_blocker_consistent_with_closest(mesh_scene):
    o, d = _rays()
    t, _ = tri_query_closest(mesh_scene, o, d, interpret=True)
    t = np.asarray(t)
    tmax = jnp.full((o.shape[0],), 4.0)
    blocked, _ = tri_query_blocker(mesh_scene, o, d, tmax, interpret=True)
    blocked = np.asarray(blocked)
    # blocked (strict t < tmax) must match the closest query's verdict
    # away from the tmax boundary (f32 vs oracle noise)
    clear = np.abs(t - 4.0) > 1e-3
    np.testing.assert_array_equal(blocked[clear], (t < 4.0)[clear])
