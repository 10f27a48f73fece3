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


def _small_scene(feature_dim=4, width=48, height=32):
    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.models.gaussian_field import init_random

    field, alive = init_random(
        jax.random.PRNGKey(0), 150, extent=1.5, feature_dim=feature_dim,
        init_scale=0.08,
    )
    field = field._replace(means=field.means + jnp.array([0.0, 0.0, -3.0]))
    cam = Camera.create(
        fx=60.0, fy=60.0, cx=width / 2, cy=height / 2,
        camera_to_world=jnp.eye(4)[:3], width=width, height=height,
    )
    return field, alive, cam


def test_perturbed_camera_recovers_through_render():
    """End-to-end recovery: render a target at the true pose, start the
    camera at a perturbed pose, optimize ONLY the pose delta through the
    full fused render — the image loss must drive the delta to compensate
    (ref wires CameraOptimizer.apply_to_camera into every forward,
    gaussian_splatting.py:640)."""
    import optax

    from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render

    field, alive, cam = _small_scene()
    cfg = GaussianSplatConfig(feature_dim=4, pose_opt_mode="SO3xR3")
    target = render(field, alive, cam, 0, cfg)["rgb"]

    # perturb the camera; the delta must learn to undo it
    perturbed = cam.replace(
        camera_to_world=apply_pose_delta(
            cam.camera_to_world, jnp.array([0.06, -0.04, 0.0, 0.0, 0.0, 0.02]),
            "SO3xR3",
        )
    )

    opt = optax.adam(1e-2)

    @jax.jit
    def step(delta, ostate):
        def loss(d):
            out = render(field, alive, perturbed, 0, cfg, pose_delta=d)
            return jnp.mean((out["rgb"] - target) ** 2)

        l, g = jax.value_and_grad(loss)(delta)
        upd, ostate = opt.update(g, ostate)
        return optax.apply_updates(delta, upd), ostate, l

    delta = jnp.zeros((6,))
    ostate = opt.init(delta)
    losses = []
    for _ in range(60):
        delta, ostate, l = step(delta, ostate)
        losses.append(float(l))
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])
    # the recovered delta actually moves the camera (nonzero translation)
    assert np.abs(np.asarray(delta[:3])).max() > 1e-3


def test_camera_opt_group_wired_into_train_step():
    """The "camera_opt" optimizer group exists when pose deltas are
    enabled, receives gradients, and updates on its accumulation boundary
    (accum=100 per ref method_configs.py:612)."""
    from gaussiangrasper_tpu.engine.train_state import init_train_state, train_step
    from gaussiangrasper_tpu.models.efd import init_mlp
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig
    from gaussiangrasper_tpu.core.pose_opt import init_pose_deltas

    field, alive, cam = _small_scene()
    fea_up = init_mlp(jax.random.PRNGKey(1), 4, 512, (16,))
    pose = init_pose_deltas(3)
    state = init_train_state(jax.random.PRNGKey(2), field, alive, fea_up,
                             pose=pose)
    assert "camera_opt" in state.opt

    cfg = GaussianSplatConfig(feature_dim=4, pose_opt_mode="SO3xR3")
    h, w = cam.height, cam.width
    g, p, s = 2, 4, 8
    key = jax.random.PRNGKey(3)
    batch = {
        "image": jax.random.uniform(key, (h, w, 3)),
        "depth": jnp.full((h, w), 2.0),
        "normal": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (h, w, 1)),
        "valid_mask": jnp.ones((h, w), bool),
        "pair_a": jnp.zeros((g, p, 2), jnp.int32),
        "pair_b": jnp.zeros((g, p, 2), jnp.int32),
        "pair_valid": jnp.ones((g, p), bool),
        "group_valid": jnp.ones((g,), bool),
        "points": jnp.zeros((s, 2), jnp.int32),
        "point_valid": jnp.ones((s,), bool),
        "gt_clip": jax.random.uniform(key, (s, 512)),
        "cam_idx": jnp.asarray(1, jnp.int32),
    }
    pose0 = np.asarray(pose)  # train_step donates its input state
    state1, metrics = train_step(state, cam, batch, cfg)
    assert float(metrics["grad_norm/camera_opt"]) > 0.0
    # not an accumulation boundary yet -> deltas unchanged, grads banked
    np.testing.assert_allclose(state1.pose, pose0)
    assert float(jnp.abs(state1.opt["camera_opt"].accum).max()) > 0.0
    # jump to the accumulation boundary (step % 100 == 99) -> pose moves
    state99 = state1._replace(step=jnp.asarray(99, jnp.int32))
    state100, _ = train_step(state99, cam, batch, cfg)
    assert float(jnp.abs(state100.pose - pose0).max()) > 0.0
