"""Sharded training over a virtual 8-device CPU mesh.

The conftest forces --xla_force_host_platform_device_count=8, so these run
the REAL pjit path (capacity-sharded field, dp-sharded cameras, XLA-
inserted collectives) without TPU hardware — the strategy SURVEY.md §4
prescribes for multi-device testing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_engine as T
from gaussiangrasper_tpu.engine.train_state import init_train_state
from gaussiangrasper_tpu.models.efd import init_mlp
from gaussiangrasper_tpu.models.model import train_loss
from gaussiangrasper_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_train_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def build(cap=128):
    key = jax.random.PRNGKey(0)
    field, alive, cam = T.tiny_setup(key, n=64, cap=cap)
    fea_up = init_mlp(key, T.F, 512, (32,))
    state = init_train_state(jax.random.PRNGKey(1), field, alive, fea_up)
    return state, cam


def batch_of(rng, b):
    batches = [T.tiny_batch(rng) for _ in range(b)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *batches)


def test_mesh_shapes():
    mesh = make_mesh(dp=2)
    assert mesh.shape == {"dp": 2, "gauss": 4}
    mesh = make_mesh(gauss=8)
    assert mesh.shape == {"dp": 1, "gauss": 8}
    with pytest.raises(ValueError):
        make_mesh(dp=3)


def test_sharded_step_matches_per_camera_mean():
    cfg = T.small_cfg()
    rng = np.random.default_rng(0)
    state, cam = build()
    mesh = make_mesh(dp=2)
    sharded = shard_train_state(state, mesh)

    b = 2
    cams = jax.tree.map(lambda l: jnp.broadcast_to(l, (b,) + l.shape), cam)
    batches = batch_of(rng, b)

    # reference first: step_fn donates its state, which may alias these
    # buffers (device_put can be zero-copy)
    model_state = {"field": state.field, "fea_up": state.fea_up}
    singles = [
        float(
            train_loss(
                model_state, state.alive, cam,
                jax.tree.map(lambda l: l[i], batches), 0, cfg,
            )[0]
        )
        for i in range(b)
    ]
    opac_before = np.asarray(state.field.opacity_logits).copy()

    step_fn = make_sharded_train_step(mesh, cfg, state.field.capacity)
    new_state, metrics = step_fn(sharded, cams, batches)
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(singles), rtol=1e-4)
    assert int(new_state.step) == 1
    # parameters moved (opacity group applies every step)
    assert not np.allclose(np.asarray(new_state.field.opacity_logits), opac_before)
    # stats accumulated from both cameras' visibility
    assert float(jnp.sum(new_state.stats.vis_counts)) > 0


def test_sharded_state_layout():
    state, _ = build(cap=128)
    mesh = make_mesh(dp=2)
    sharded = shard_train_state(state, mesh)
    shard_sizes = {
        s.data.shape for s in sharded.field.means.addressable_shards
    }
    # capacity axis split over gauss=4
    assert shard_sizes == {(32, 3)}
    # fea_up replicated
    w0 = next(iter(sharded.fea_up.values()))
    assert len({s.data.shape for s in w0.addressable_shards}) == 1


def test_sharded_host_loop_cli(tmp_path):
    """--mesh CLI path: sharded training loop end-to-end on the virtual
    mesh, with refinement and checkpointing."""
    import json

    from PIL import Image

    data = tmp_path / "scene"
    (data / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        name = f"f{i}.png"
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)).save(
            data / "images" / name
        )
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        frames.append({"file_path": f"images/{name}",
                       "transform_matrix": pose.tolist()})
    (data / "transforms.json").write_text(json.dumps(
        {"fl_x": 25.0, "fl_y": 25.0, "cx": 16, "cy": 12, "w": 32, "h": 24,
         "frames": frames}))

    from gaussiangrasper_tpu.scripts import train

    out = tmp_path / "out"
    train.main([
        "--data", str(data), "--output-dir", str(out),
        "--experiment-name", "sharded", "--mesh", "2,4",
        "--max-iterations", "4", "--steps-per-save", "4",
        "--feature-dim", "8", "--sh-degree", "1",
        "--warmup-length", "2", "--refine-every", "3",
    ])
    ckpts = list((out / "sharded" / "checkpoints").iterdir())
    assert len(ckpts) == 1
