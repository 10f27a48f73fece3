"""Engine tests: optimizer groups, refinement, and an end-to-end smoke
training loop on a tiny synthetic scene (the analog of the reference's
2-iteration CPU train smoke, /root/reference/tests/test_train.py:32-63)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.engine import optimizers as optim
from gaussiangrasper_tpu.engine.refinement import DensifyStats, refine
from gaussiangrasper_tpu.engine.train_state import init_train_state, refine_step, train_step
from gaussiangrasper_tpu.models.efd import init_mlp
from gaussiangrasper_tpu.models.gaussian_field import GaussianParams, init_random
from gaussiangrasper_tpu.models.model import GaussianSplatConfig
from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

F = 8  # small latent dim for tests
W, H = 32, 24


def tiny_setup(key, n=64, cap=128):
    field, alive = init_random(
        key, n, extent=2.0, feature_dim=F, capacity=cap, init_scale=0.1
    )
    # push the cloud in front of the camera
    field = field._replace(means=field.means * 0.3 + jnp.array([0.0, 0.0, -2.0]))
    cam = Camera.create(
        fx=30.0, fy=30.0, cx=W / 2, cy=H / 2,
        camera_to_world=jnp.eye(4)[:3],  # at origin looking down -z (OpenGL)
        width=W, height=H,
    )
    return field, alive, cam


def tiny_batch(rng):
    g, p, s = 4, 8, 16
    return {
        "image": jnp.asarray(rng.random((H, W, 3)), jnp.float32),
        "depth": jnp.full((H, W), 2.0, jnp.float32),
        "normal": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (H, W, 1)),
        "valid_mask": jnp.ones((H, W), bool),
        "pair_a": jnp.asarray(rng.integers(0, min(H, W), (g, p, 2)), jnp.int32),
        "pair_b": jnp.asarray(rng.integers(0, min(H, W), (g, p, 2)), jnp.int32),
        "pair_valid": jnp.ones((g, p), bool),
        "group_valid": jnp.ones((g,), bool),
        "points": jnp.asarray(rng.integers(0, min(H, W), (s, 2)), jnp.int32),
        "point_valid": jnp.ones((s,), bool),
        "gt_clip": jnp.asarray(rng.random((s, 512)), jnp.float32),
    }


def small_cfg():
    return GaussianSplatConfig(
        feature_dim=F,
        warmup_length=0,
        raster=RasterizeConfig(tile_size=8, max_gaussians_per_tile=128, tile_chunk=4),
    )


def test_lr_schedule_matches_reference_interpolation():
    cfg = optim.GroupConfig(1.6e-4, 1.6e-6, max_steps=30000)
    assert np.isclose(float(optim.lr_at(cfg, 0)), 1.6e-4)
    assert np.isclose(float(optim.lr_at(cfg, 30000)), 1.6e-6, rtol=1e-5)
    # geometric midpoint at t=0.5
    assert np.isclose(float(optim.lr_at(cfg, 15000)), np.sqrt(1.6e-4 * 1.6e-6), rtol=1e-5)


def test_accumulation_only_applies_on_due_steps():
    key = jax.random.PRNGKey(0)
    field, alive, _ = tiny_setup(key)
    state = {"field": field, "fea_up": init_mlp(key, F, 16, (8,))}
    opt = optim.init_opt_state(state)
    g = jax.tree.map(jnp.ones_like, state)
    # xyz group accumulates over 10 steps: params must not move on step 0
    s1, opt1 = optim.apply_updates_grouped(state, g, opt, 0)
    assert np.allclose(np.asarray(s1["field"].means), np.asarray(field.means))
    # opacity group (accum=1) moves immediately
    assert not np.allclose(
        np.asarray(s1["field"].opacity_logits), np.asarray(field.opacity_logits)
    )
    # due step for xyz is step 9
    s_due, _ = optim.apply_updates_grouped(s1, g, opt1, 9)
    assert not np.allclose(np.asarray(s_due["field"].means), np.asarray(field.means))


def test_refine_splits_into_dead_slots():
    key = jax.random.PRNGKey(1)
    n, cap = 16, 64
    field, alive = init_random(key, n, extent=1.0, feature_dim=F, capacity=cap,
                               init_scale=0.005)
    # make gaussian 0 big (split candidate) and give it huge accumulated grads
    field = field._replace(
        log_scales=field.log_scales.at[0].set(jnp.log(0.5)),
        opacity_logits=jnp.full((cap,), 3.0),  # opacity ~0.95, no cull
    )
    stats = DensifyStats.zeros(cap)
    stats = stats._replace(
        grad_norm_sum=stats.grad_norm_sum.at[:n].set(1.0),
        vis_counts=stats.vis_counts.at[:n].set(1.0),
    )
    model_state = {"field": field, "fea_up": init_mlp(key, F, 16, (8,))}
    opt = optim.init_opt_state(model_state)
    adam = {k: v.adam for k, v in opt.items()}
    # step inside the densify window: past warmup, cooled down
    new_field, new_alive, new_adam, new_stats = refine(
        field, alive, adam, stats, jnp.asarray(700), jax.random.PRNGKey(2),
        width=W, height=H, num_train_data=4, warmup_length=500,
        cull_scale_thresh=10.0,
    )
    n_before = int(alive.sum())
    n_after = int(new_alive.sum())
    # gaussian 0 split into 2 children; the other 15 are small + high-grad
    # dup candidates -> 15 dups. Total new = 17.
    assert n_after == n_before + 2 + (n - 1)
    # split original shrunk by 1.6
    assert np.allclose(
        float(new_field.log_scales[0, 0]), np.log(0.5 / 1.6), atol=1e-5
    )
    assert float(new_stats.vis_counts.sum()) == 0.0


def test_refine_culls_transparent():
    key = jax.random.PRNGKey(3)
    n, cap = 16, 32
    field, alive = init_random(key, n, extent=1.0, feature_dim=F, capacity=cap,
                               init_scale=0.05)
    field = field._replace(
        opacity_logits=field.opacity_logits.at[:8].set(-5.0)  # ~0.007 opacity
    )
    model_state = {"field": field, "fea_up": init_mlp(key, F, 16, (8,))}
    opt = optim.init_opt_state(model_state)
    adam = {k: v.adam for k, v in opt.items()}
    stats = DensifyStats.zeros(cap)
    _, new_alive, _, _ = refine(
        field, alive, adam, stats, jnp.asarray(20700), jax.random.PRNGKey(4),
        width=W, height=H, num_train_data=4,
    )
    assert int(new_alive.sum()) == n - 8


def test_train_smoke_loss_decreases():
    key = jax.random.PRNGKey(5)
    rng = np.random.default_rng(0)
    field, alive, cam = tiny_setup(key)
    cfg = small_cfg()
    fea_up = init_mlp(key, F, 512, (32,))
    state = init_train_state(jax.random.PRNGKey(6), field, alive, fea_up)
    batch = tiny_batch(rng)

    losses = []
    for _ in range(6):
        state, metrics = train_step(state, cam, batch, cfg)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert int(state.step) == 6

    # refinement pass executes and preserves shapes
    state = refine_step(state, cfg, W, H, num_train_data=1)
    assert state.field.capacity == field.capacity
    assert bool(jnp.all(jnp.isfinite(state.field.means)))


def test_grow_capacity_resumes_training():
    """grow_capacity pads every capacity-length buffer (field rows, alive,
    per-group Adam state, densify stats) and training continues with the
    SAME trajectory for the live rows — the variable-N reload analog of
    the reference's count-reallocating load_state_dict (ref
    gaussian_splatting.py:301-313)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussiangrasper_tpu.engine.train_state import (
        grow_capacity, init_train_state, train_step,
    )
    from gaussiangrasper_tpu.models.efd import init_mlp

    rng = np.random.default_rng(3)
    cfg = small_cfg()
    key = jax.random.PRNGKey(0)
    field, alive, cam = tiny_setup(key, n=48, cap=64)
    state = init_train_state(jax.random.PRNGKey(1), field, alive,
                             init_mlp(key, F, 512, (32,)))
    batch = tiny_batch(rng)
    state, _ = train_step(state, cam, batch, cfg)

    grown = grow_capacity(state, 128)
    assert grown.field.capacity == 128
    assert int(grown.num_alive) == int(state.num_alive)
    # live-slot params and Adam moments preserved exactly
    np.testing.assert_array_equal(np.asarray(grown.field.means[:64]),
                                  np.asarray(state.field.means[:64]))
    mu_old = jax.tree.leaves(state.opt["xyz"].adam.mu)[0]
    mu_new = jax.tree.leaves(grown.opt["xyz"].adam.mu)[0]
    np.testing.assert_array_equal(np.asarray(mu_new[:64]),
                                  np.asarray(mu_old))
    assert not np.any(np.asarray(grown.alive[64:]))
    # training continues: next step is finite and identical to continuing
    # at the old capacity for the live rows (dead rows contribute nothing)
    state_copy = jax.tree.map(jnp.array, state)  # train_step donates
    cont_small, m_small = train_step(state_copy, cam, batch, cfg)
    cont_big, m_big = train_step(grown, cam, batch, cfg)
    assert np.isfinite(float(m_big["loss"]))
    np.testing.assert_allclose(float(m_big["loss"]), float(m_small["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cont_big.field.means[:64]),
        np.asarray(cont_small.field.means[:64]), atol=1e-6)


def test_sky_alpha_reg_suppresses_masked_out_alpha():
    """Opt-in floater suppression: with sky_alpha_reg on, rendered alpha
    on masked-OUT pixels falls relative to the reference loss set (which
    leaves them unsupervised); masked-in supervision still applies, and
    reg=0 keeps the loss dict at exact reference parity."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussiangrasper_tpu.engine.train_state import init_train_state, train_step
    from gaussiangrasper_tpu.models.efd import init_mlp
    from gaussiangrasper_tpu.models.model import render

    rng = np.random.default_rng(5)
    cfg0 = small_cfg()
    cfg1 = dataclasses.replace(cfg0, sky_alpha_reg=5.0)
    key = jax.random.PRNGKey(0)
    batch = tiny_batch(rng)
    # mask OUT the left half of the image
    h, w = batch["image"].shape[:2]
    valid = np.ones((h, w), bool)
    valid[:, : w // 2] = False
    batch["valid_mask"] = jnp.asarray(valid)

    def train(cfg, steps=80):
        field, alive, cam = tiny_setup(key, n=48, cap=64)
        st = init_train_state(jax.random.PRNGKey(1), field, alive,
                              init_mlp(key, F, 512, (32,)))
        for _ in range(steps):
            st, m = train_step(st, cam, batch, cfg)
        out = render(st.field, st.alive, cam, st.step, cfg)
        return np.asarray(out["alpha"]), m

    alpha0, m0 = train(cfg0)
    alpha1, m1 = train(cfg1)
    sky0 = alpha0[~valid].mean()
    sky1 = alpha1[~valid].mean()
    assert sky1 < sky0 * 0.8, (sky0, sky1)
    assert "sky_alpha_reg" in m1 and "sky_alpha_reg" not in m0
