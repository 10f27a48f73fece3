"""Unit tests for core math: transforms, SH, cameras.

Mirrors the reference's unit pyramid (tests/cameras/, tests/utils/test_math.py)
but targets our jnp primitives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiangrasper_tpu.core import sh
from gaussiangrasper_tpu.core.cameras import Camera, projection_matrix, view_matrix
from gaussiangrasper_tpu.core.transforms import (
    normalize,
    quat_mul,
    quat_to_rotmat,
    random_quats,
    rotmat_to_quat,
)


class TestQuats:
    def test_identity(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quat_to_rotmat(q), jnp.eye(3), atol=1e-6)

    def test_orthonormal(self):
        qs = random_quats(jax.random.key(0), 64)
        R = quat_to_rotmat(qs)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(64), atol=1e-5)

    def test_roundtrip(self):
        qs = random_quats(jax.random.key(1), 128)
        # canonicalize sign for comparison
        qs = qs * jnp.where(qs[:, :1] < 0, -1.0, 1.0)
        back = rotmat_to_quat(quat_to_rotmat(qs))
        np.testing.assert_allclose(back, qs, atol=1e-5)

    def test_unnormalized_input_ok(self):
        q = jnp.array([2.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quat_to_rotmat(q), jnp.eye(3), atol=1e-6)

    def test_mul_matches_rotmat_product(self):
        qa = random_quats(jax.random.key(2), 16)
        qb = random_quats(jax.random.key(3), 16)
        Rab = quat_to_rotmat(quat_mul(qa, qb))
        np.testing.assert_allclose(
            Rab, quat_to_rotmat(qa) @ quat_to_rotmat(qb), atol=1e-5
        )

    def test_random_quats_unit(self):
        qs = random_quats(jax.random.key(4), 1000)
        np.testing.assert_allclose(jnp.linalg.norm(qs, axis=-1), 1.0, atol=1e-6)
        # mean should be near zero for a uniform distribution on S^3
        assert float(jnp.abs(qs.mean(0)).max()) < 0.08


class TestSH:
    def test_degree0_constant(self):
        dirs = normalize(jax.random.normal(jax.random.key(0), (32, 3)))
        coeffs = jnp.zeros((32, 25, 3)).at[:, 0, :].set(1.0)
        out = sh.eval_sh(0, dirs, coeffs)
        np.testing.assert_allclose(out, 0.28209479177387814, rtol=1e-6)

    def test_degree_masking(self):
        dirs = normalize(jax.random.normal(jax.random.key(1), (32, 3)))
        coeffs = jax.random.normal(jax.random.key(2), (32, 25, 3))
        full = sh.eval_sh(4, dirs, coeffs)
        # zeroing bands >1 == evaluating with active_degree=1
        coeffs_trunc = coeffs.at[:, 4:, :].set(0.0)
        np.testing.assert_allclose(
            sh.eval_sh(1, dirs, coeffs), sh.eval_sh(4, dirs, coeffs_trunc), atol=1e-6
        )
        assert not np.allclose(full, sh.eval_sh(1, dirs, coeffs))

    def test_orthonormality(self):
        # Monte-Carlo check: int Y_i Y_j over the sphere ~ delta_ij / (4 pi)
        key = jax.random.key(5)
        dirs = normalize(jax.random.normal(key, (200_000, 3)))
        basis = sh.sh_basis(dirs)  # (M, 25)
        gram = 4 * jnp.pi * (basis.T @ basis) / dirs.shape[0]
        np.testing.assert_allclose(gram, jnp.eye(25), atol=0.15)

    def test_num_bases(self):
        assert sh.num_sh_bases(0) == 1
        assert sh.num_sh_bases(4) == 25

    def test_traced_degree_no_recompile(self):
        dirs = normalize(jax.random.normal(jax.random.key(0), (8, 3)))
        coeffs = jax.random.normal(jax.random.key(1), (8, 25, 3))
        f = jax.jit(sh.eval_sh)
        a = f(jnp.int32(0), dirs, coeffs)
        b = f(jnp.int32(4), dirs, coeffs)
        assert a.shape == b.shape == (8, 3)


class TestCameras:
    def _camera(self):
        # camera at (0, 0, 5) looking down -z (OpenGL) toward the origin
        c2w = jnp.array(
            [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 5.0]]
        )
        return Camera.create(100.0, 100.0, 64.0, 64.0, c2w, 128, 128)

    def test_view_matrix_maps_target_to_forward(self):
        cam = self._camera()
        vm = view_matrix(cam.camera_to_world)
        p = vm @ jnp.array([0.0, 0.0, 0.0, 1.0])
        # origin is 5 in front of the camera: +z in rasterizer frame
        np.testing.assert_allclose(p[:3], jnp.array([0.0, 0.0, 5.0]), atol=1e-6)

    def test_view_matrix_is_rigid(self):
        key = jax.random.key(7)
        q = random_quats(key, 1)[0]
        R = quat_to_rotmat(q)
        c2w = jnp.concatenate([R, jnp.array([[1.0], [2.0], [3.0]])], axis=1)
        vm = view_matrix(c2w)
        RR = vm[:3, :3]
        np.testing.assert_allclose(RR @ RR.T, jnp.eye(3), atol=1e-5)
        # camera origin maps to zero
        p = vm @ jnp.array([1.0, 2.0, 3.0, 1.0])
        np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)

    def test_rescale(self):
        cam = self._camera().rescale(0.5)
        assert cam.width == 64 and cam.height == 64
        np.testing.assert_allclose(cam.fx, 50.0)
        np.testing.assert_allclose(cam.cx, 32.0)

    def test_projection_matrix_shape(self):
        P = projection_matrix(0.001, 1000.0, 1.0, 1.0)
        assert P.shape == (4, 4)
        np.testing.assert_allclose(P[3, 2], 1.0)

    def test_camera_is_pytree(self):
        cam = self._camera()
        leaves = jax.tree_util.tree_leaves(cam)
        assert len(leaves) == 5  # fx fy cx cy c2w; width/height static
        out = jax.jit(lambda c: c.fx * 2)(cam)
        np.testing.assert_allclose(out, 200.0)


class TestSceneBox:
    def test_aabb_within(self):
        from gaussiangrasper_tpu.core.scene_box import SceneBox, aabb_of

        box = SceneBox(jnp.array([[0.0, 0, 0], [1.0, 1, 1]]))
        pts = jnp.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]])
        m = box.within(pts)
        assert bool(m[0]) and not bool(m[1])
        assert aabb_of(pts).aabb[1, 0] == 1.5

    def test_oriented_box_rotated(self):
        from gaussiangrasper_tpu.core.scene_box import OrientedBox

        # unit cube rotated 45 deg about z, centered at origin
        ang = jnp.pi / 4
        quat = jnp.array([jnp.cos(ang / 2), 0.0, 0.0, jnp.sin(ang / 2)])
        box = OrientedBox(quat, jnp.zeros(3), jnp.array([2.0, 1.0, 1.0]))
        # a point along the rotated long axis (45 deg in xy) is inside...
        inside = jnp.array([[0.6, 0.6, 0.0]])
        # ...but along world x at the same distance it's outside (short axis)
        outside = jnp.array([[0.9, 0.0, 0.0]])
        assert bool(box.within(inside)[0])
        assert not bool(box.within(outside)[0])
