"""Unit tests for the vectorized geometry/shading primitives, one per
function of the reference's primitives.cl (SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpuray.kernels import primitives as pr


def v(*xs):
    return jnp.asarray([list(xs)], jnp.float32)


class TestXorshift32:
    def test_sequence_matches_c_semantics(self):
        """Check against an independent pure-Python uint32 implementation of
        xorshift32 (Marsaglia 2003), as in primitives.cl:116-125."""
        def py_xorshift(x):
            x ^= (x << 13) & 0xFFFFFFFF
            x ^= x >> 17
            x ^= (x << 5) & 0xFFFFFFFF
            return x

        state = jnp.asarray([12345, 1, 0xDEADBEEF, 0], jnp.uint32)
        expect = [12345, 1, 0xDEADBEEF, 0]
        for _ in range(8):
            state, sample = pr.xorshift32(state)
            expect = [py_xorshift(x) for x in expect]
            assert [int(s) for s in state] == expect
            np.testing.assert_allclose(
                np.asarray(sample),
                np.float32(np.asarray(expect, np.float32)
                           / 2147483648.0 * 2.0))

    def test_zero_seed_is_stuck(self):
        # pixel id 0 seeds state 0, which xorshift maps to 0 forever —
        # a reference quirk we must reproduce (raytracing.cl:32-34)
        state = jnp.asarray([0], jnp.uint32)
        state, s = pr.xorshift32(state)
        assert int(state[0]) == 0 and float(s[0]) == 0.0

    def test_range_is_0_4(self):
        # primitives.cl:124 maps the full u32 range onto [0, 4)
        state = jnp.asarray([0xFFFFFFFF], jnp.uint32)
        _, s = pr.xorshift32(state)
        assert 0.0 <= float(s[0]) < 4.0


class TestIntersectSphere:
    def test_basic_hit(self):
        hit, t = pr.intersect_sphere(v(0, 0, 0), v(0, 0, 1), v(0, 0, 5), 1.0)
        assert bool(hit[0]) and np.isclose(float(t[0]), 4.0)

    def test_miss(self):
        hit, _ = pr.intersect_sphere(v(0, 0, 0), v(0, 1, 0), v(0, 0, 5), 1.0)
        assert not bool(hit[0])

    def test_far_root_from_inside(self):
        """The far-root fallback (primitives.cl:189) when the origin is
        inside the sphere — this is what lets refracted rays exit."""
        hit, t = pr.intersect_sphere(v(0, 0, 4.5), v(0, 0, 1), v(0, 0, 5),
                                     1.0)
        assert bool(hit[0]) and np.isclose(float(t[0]), 1.5)

    def test_sphere_fully_behind(self):
        hit, _ = pr.intersect_sphere(v(0, 0, 10), v(0, 0, 1), v(0, 0, 5),
                                     1.0)
        assert not bool(hit[0])

    def test_tangent(self):
        hit, t = pr.intersect_sphere(v(1, 0, 0), v(0, 0, 1), v(0, 0, 5), 1.0)
        assert bool(hit[0]) and np.isclose(float(t[0]), 5.0, atol=1e-3)


class TestIntersectPlane:
    def test_hit(self):
        hit, t = pr.intersect_plane(v(0, 2, 0), v(0, -1, 0), v(0, 1, 0),
                                    v(0, 0, 0))
        assert bool(hit[0]) and np.isclose(float(t[0]), 2.0)

    def test_parallel(self):
        hit, _ = pr.intersect_plane(v(0, 2, 0), v(1, 0, 0), v(0, 1, 0),
                                    v(0, 0, 0))
        assert not bool(hit[0])

    def test_behind(self):
        hit, _ = pr.intersect_plane(v(0, 2, 0), v(0, 1, 0), v(0, 1, 0),
                                    v(0, 0, 0))
        assert not bool(hit[0])


class TestIntersectTriangle:
    def test_hit_and_t(self):
        hit, t = pr.intersect_triangle(v(0.2, 0.2, -1), v(0, 0, 1),
                                       v(0, 0, 0), v(1, 0, 0), v(0, 1, 0))
        assert bool(hit[0]) and np.isclose(float(t[0]), 1.0)

    def test_outside_edge(self):
        hit, _ = pr.intersect_triangle(v(0.9, 0.9, -1), v(0, 0, 1),
                                       v(0, 0, 0), v(1, 0, 0), v(0, 1, 0))
        assert not bool(hit[0])

    def test_double_faced(self):
        hit, _ = pr.intersect_triangle(v(0.2, 0.2, 1), v(0, 0, -1),
                                       v(0, 0, 0), v(1, 0, 0), v(0, 1, 0))
        assert bool(hit[0])

    def test_behind_origin(self):
        hit, _ = pr.intersect_triangle(v(0.2, 0.2, 1), v(0, 0, 1),
                                       v(0, 0, 0), v(1, 0, 0), v(0, 1, 0))
        assert not bool(hit[0])


class TestReflectRefract:
    def test_reflect_mirror(self):
        d = pr.normalize3(v(1, -1, 0))
        out = pr.reflect(d, v(0, 1, 0))
        np.testing.assert_allclose(np.asarray(out)[0],
                                   np.asarray(pr.normalize3(v(1, 1, 0)))[0],
                                   atol=1e-6)

    def test_refract_straight_through(self):
        d = v(0, 0, 1)
        out, tir = pr.refract(jnp.float32(1.0), jnp.float32(1.5), d,
                              v(0, 0, -1))
        assert not bool(tir[0])
        np.testing.assert_allclose(np.asarray(out)[0], [0, 0, 1], atol=1e-6)

    def test_refract_snell(self):
        # 45 deg into n=1.5: sin t = sin45/1.5
        d = pr.normalize3(v(1, -1, 0))
        out, tir = pr.refract(jnp.float32(1.0), jnp.float32(1.5), d,
                              v(0, 1, 0))
        assert not bool(tir[0])
        sin_t = float(out[0, 0])
        np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-5)

    def test_total_internal_reflection(self):
        # from glass to air beyond the critical angle
        d = pr.normalize3(v(1, -0.2, 0))
        _, tir = pr.refract(jnp.float32(1.5), jnp.float32(1.0), d,
                            v(0, 1, 0))
        assert bool(tir[0])

    def test_schlick_normal_incidence(self):
        # r0 = ((1-1.5)/(2.5))^2 = 0.04
        fr = pr.schlick(jnp.float32(1.0), jnp.float32(1.5), v(0, 0, 1),
                        v(0, 0, -1))
        np.testing.assert_allclose(float(fr[0]), 0.04, atol=1e-6)

    def test_schlick_grazing_is_one(self):
        d = pr.normalize3(v(1, -0.01, 0))
        fr = pr.schlick(jnp.float32(1.0), jnp.float32(1.5), d, v(0, 1, 0))
        assert float(fr[0]) > 0.9

    def test_schlick_tir_returns_one(self):
        d = pr.normalize3(v(1, -0.2, 0))
        fr = pr.schlick(jnp.float32(1.5), jnp.float32(1.0), d, v(0, 1, 0))
        assert float(fr[0]) == 1.0


class TestMapToCube:
    """Face selection per primitives.cl:33-99 with a 4x3 cross of face size
    fs: +x face at (2fs, fs), -x at (0, fs), +y at (fs, 2fs), -y at (fs, 0),
    +z at (fs, fs), -z at (3fs, fs)."""
    FS = 64

    def uv(self, *d):
        u, vv = pr.map_to_cube(v(*d), self.FS)
        return int(u[0]), int(vv[0])

    def test_faces(self):
        fs = self.FS
        hf = fs // 2
        assert self.uv(1, 0, 0) == (2 * fs + hf, fs + hf)
        assert self.uv(-1, 0, 0) == (hf, fs + hf)
        assert self.uv(0, 1, 0) == (fs + hf, 2 * fs + hf)
        assert self.uv(0, -1, 0) == (fs + hf, hf)
        assert self.uv(0, 0, 1) == (fs + hf, fs + hf)
        assert self.uv(0, 0, -1) == (3 * fs + hf, fs + hf)

    def test_within_face_gradient(self):
        # looking +z, increasing x moves u right across the +z face
        u1, _ = self.uv(0.2, 0, 1)
        u2, _ = self.uv(0.4, 0, 1)
        assert u2 > u1

    def test_tie_later_branch_wins(self):
        # |x| == |z|, both positive: the reference's non-exclusive ifs make
        # the LATER (+z) block win (primitives.cl:33-88)
        fs = self.FS
        u, vv = self.uv(1, 0, 1)
        assert fs <= u <= 2 * fs and fs <= vv <= 2 * fs


class TestPlaneTextureBasis:
    def test_ground_plane_basis(self):
        # n=(0,1,0): cross(e0, n) = (0,0,-1)*-1... compute: e0 x n =
        # (0*0-0*1, 0*0-1*0, 1*1-0*0) = (0, 0, 1); sum != 0 so b0=(0,0,1),
        # b1 = n x b0 = (1, 0, 0)  — matches primitives.cl:226-235
        n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        b0, b1 = pr.plane_texture_basis(n)
        np.testing.assert_allclose(np.asarray(b0)[0], [0, 0, 1])
        np.testing.assert_allclose(np.asarray(b1)[0], [1, 0, 0])

    def test_texel_coords_truncate_and_wrap(self):
        b0 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        b1 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        # point z=2.605, x=-0.5, scale 100 -> ui=260.5 trunc 260 mod 256 = 4
        # vi=-50 -> euclidean mod 256 = 206
        p = jnp.asarray([[-0.5, 0.0, 2.605]], jnp.float32)
        xi, yi = pr.texture_texel_coords(b0, b1, p, jnp.float32(100.0),
                                         256, 256)
        assert int(xi[0]) == 4 and int(yi[0]) == 206

    def test_negative_truncation_toward_zero(self):
        # C (int)(-0.7) == 0 then mod 256 == 0 (NOT floor to -1 -> 255)
        b0 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        b1 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        p = jnp.asarray([[0.0, 0.0, -0.007]], jnp.float32)
        xi, _ = pr.texture_texel_coords(b0, b1, p, jnp.float32(100.0),
                                        256, 256)
        assert int(xi[0]) == 0
