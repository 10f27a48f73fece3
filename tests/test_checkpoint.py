"""Orbax checkpoint round-trip of the full TrainState."""

import jax
import jax.numpy as jnp
import numpy as np

import tests.test_engine as T
from gaussiangrasper_tpu.engine import checkpoint as ckpt
from gaussiangrasper_tpu.engine.train_state import init_train_state, train_step
from gaussiangrasper_tpu.models.efd import init_mlp


def test_round_trip_preserves_everything(tmp_path):
    key = jax.random.PRNGKey(0)
    field, alive, cam = T.tiny_setup(key)
    state = init_train_state(
        jax.random.PRNGKey(1), field, alive, init_mlp(key, T.F, 512, (32,))
    )
    # advance a couple of steps so optimizer state is non-trivial
    rng = np.random.default_rng(0)
    batch = T.tiny_batch(rng)
    cfg = T.small_cfg()
    for _ in range(2):
        state, _ = train_step(state, cam, batch, cfg)

    path = ckpt.save_checkpoint(tmp_path / "ckpts", state)
    assert path.name == "step_000000002"
    assert ckpt.latest_checkpoint(tmp_path / "ckpts") == path

    template = init_train_state(
        jax.random.PRNGKey(9), field, alive, init_mlp(key, T.F, 512, (32,))
    )
    restored = ckpt.load_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keep_only_latest(tmp_path):
    key = jax.random.PRNGKey(0)
    field, alive, _ = T.tiny_setup(key)
    state = init_train_state(
        jax.random.PRNGKey(1), field, alive, init_mlp(key, T.F, 512, (32,))
    )
    ckpt.save_checkpoint(tmp_path / "c", state, step=100)
    ckpt.save_checkpoint(tmp_path / "c", state, step=200, keep_only_latest=True)
    names = sorted(p.name for p in (tmp_path / "c").iterdir())
    assert names == ["step_000000200"]
