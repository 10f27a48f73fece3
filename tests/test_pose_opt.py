"""Camera pose optimizer: exp maps and pose-delta application."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.core.pose_opt import (
    apply_pose_delta,
    exp_map_se3,
    exp_map_so3,
    init_pose_deltas,
)


def test_exp_so3_identity_and_known_rotation():
    np.testing.assert_allclose(exp_map_so3(jnp.zeros(3)), jnp.eye(3), atol=1e-5)
    # pi/2 about z: x -> y
    r = exp_map_so3(jnp.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(r @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_exp_se3_pure_translation():
    t = exp_map_se3(jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(t[:3, :3], jnp.eye(3), atol=1e-4)
    np.testing.assert_allclose(t[:3, 3], [0.1, -0.2, 0.3], atol=1e-5)


def test_se3_matches_so3xr3_at_small_angles():
    tangent = jnp.array([0.01, 0.02, -0.01, 0.001, -0.002, 0.0015])
    se3 = exp_map_se3(tangent)
    np.testing.assert_allclose(se3[:3, :3], exp_map_so3(tangent[3:]), atol=1e-6)
    # V-matrix coupling shifts translation by ~0.5*|omega x rho|
    np.testing.assert_allclose(se3[:3, 3], tangent[:3], atol=1e-4)


def test_apply_delta_modes():
    pose = jnp.eye(4)[:3]
    deltas = init_pose_deltas(4)
    np.testing.assert_allclose(
        apply_pose_delta(pose, deltas[0], "SO3xR3"), pose, atol=1e-5
    )
    assert apply_pose_delta(pose, deltas[0], "off") is pose
    moved = apply_pose_delta(pose, jnp.array([0.5, 0, 0, 0, 0, 0]), "SO3xR3")
    np.testing.assert_allclose(moved[:, 3], [0.5, 0, 0], atol=1e-6)


def test_differentiable_through_render_pipeline():
    """Pose deltas must carry gradients (the joint-optimization contract)."""
    pose = jnp.eye(4)[:3].astype(jnp.float32)

    def loss(delta):
        p = apply_pose_delta(pose, delta, "SO3xR3")
        return jnp.sum(p[:, 3] ** 2) + jnp.sum((p[:, :3] - jnp.eye(3)) ** 2)

    g = jax.grad(loss)(jnp.full((6,), 0.05))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
