"""Multi-scene vmapped training (BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_engine as T
from gaussiangrasper_tpu.engine.multi_scene import (
    multi_scene_train_step,
    stack_states,
    unstack_states,
)
from gaussiangrasper_tpu.engine.train_state import init_train_state
from gaussiangrasper_tpu.models.efd import init_mlp


def build_scene(seed):
    key = jax.random.PRNGKey(seed)
    field, alive, cam = T.tiny_setup(key, n=48, cap=64)
    fea_up = init_mlp(jax.random.PRNGKey(100), T.F, 512, (32,))  # same init
    return init_train_state(jax.random.PRNGKey(seed + 1), field, alive, fea_up), cam


@pytest.mark.slow
def test_two_scenes_advance_together():
    cfg = T.small_cfg()
    rng = np.random.default_rng(0)
    (s0, cam), (s1, _) = build_scene(0), build_scene(7)
    states = stack_states([s0, s1])
    cams = jax.tree.map(lambda *ls: jnp.stack(ls), cam, cam)
    batches = jax.tree.map(
        lambda *ls: jnp.stack(ls), T.tiny_batch(rng), T.tiny_batch(rng)
    )

    for _ in range(3):
        states, metrics = multi_scene_train_step(states, cams, batches, cfg)
        assert np.isfinite(float(metrics["loss"]))

    out = unstack_states(states, 2)
    assert int(out[0].step) == 3 and int(out[1].step) == 3
    # scenes' fields diverge (different data), shared up_net stays identical
    assert not np.allclose(
        np.asarray(out[0].field.means), np.asarray(out[1].field.means)
    )
    w0 = np.asarray(out[0].fea_up["w0"])
    w1 = np.asarray(out[1].fea_up["w0"])
    np.testing.assert_allclose(w0, w1)


def test_unshared_up_net_diverges():
    cfg = T.small_cfg()
    rng = np.random.default_rng(1)
    (s0, cam), (s1, _) = build_scene(0), build_scene(7)
    states = stack_states([s0, s1])
    cams = jax.tree.map(lambda *ls: jnp.stack(ls), cam, cam)
    batches = jax.tree.map(
        lambda *ls: jnp.stack(ls), T.tiny_batch(rng), T.tiny_batch(rng)
    )
    for _ in range(2):
        states, _ = multi_scene_train_step(
            states, cams, batches, cfg, share_up_net=False
        )
    out = unstack_states(states, 2)
    assert not np.allclose(
        np.asarray(out[0].fea_up["w0"]), np.asarray(out[1].fea_up["w0"])
    )
