"""Multi-scene batch training (BASELINE.md config 4).

The reference trains one scene per process; the TPU-native design stacks S
scenes' TrainStates along a leading axis and vmaps the fused train step,
so every scene advances in ONE compiled program per step — the MXU sees
an S-times-larger batch, and scenes with identical capacity share one
compilation. The EFD lift MLP ("up_net") can optionally be shared across
scenes (averaged gradients), giving one CLIP-aligned latent space for
open-vocabulary querying over the whole scene collection.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.engine.train_state import TrainState, train_step
from gaussiangrasper_tpu.models.model import GaussianSplatConfig


def stack_states(states: List[TrainState]) -> TrainState:
    """Stack per-scene TrainStates along a new leading axis. All scenes
    must share capacity and feature dims (pad capacities beforehand)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *states)


def unstack_states(stacked: TrainState, n: int) -> List[TrainState]:
    return [jax.tree.map(lambda l: l[i], stacked) for i in range(n)]


def train_multi(config, data_dirs, share_up_net: bool = True,
                dp: int | None = None) -> List[TrainState]:
    """Host loop for multi-scene training: one datamanager per scene, a
    common capacity (max over scenes), vmapped stepping, per-scene
    checkpoints under <output>/<experiment>/scene_<i>/.

    dp: shard the stacked scene axis over a `dp`-device mesh (BASELINE
    config 4 on a slice: scene-parallelism IS data-parallelism here —
    each device advances its scene subset, and the shared up_net mean
    becomes an XLA cross-device reduce). Requires S % dp == 0. None = all
    scenes on the default device."""
    import dataclasses

    import numpy as np

    from gaussiangrasper_tpu.engine import checkpoint as ckpt
    from gaussiangrasper_tpu.engine.trainer import make_trainer

    trainers = []
    for d in data_dirs:
        c = dataclasses.replace(config, data=d)
        t = make_trainer(c)
        trainers.append(t)
    # uniform capacity so the vmapped step compiles once
    caps = []
    for t in trainers:
        sp = t.dm.seed_points
        n = len(sp[0]) if sp is not None else t.config.random_init_points
        caps.append(t.config.capacity or int(n * t.config.capacity_multiplier))
    cap = max(caps)
    states = []
    for t in trainers:
        t.config.capacity = cap
        states.append(t.setup())
    stacked = stack_states(states)

    from gaussiangrasper_tpu.engine.trainer import _downscale_factor, downscale_batch

    n_scenes = len(trainers)
    scene_sharding = None
    if dp is not None and dp > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if n_scenes % dp:
            raise ValueError(f"{n_scenes} scenes not divisible by dp={dp}")
        mesh = Mesh(jax.devices()[:dp], ("dp",))
        scene_sharding = NamedSharding(mesh, P("dp"))
        stacked = jax.device_put(stacked, scene_sharding)
    for step in range(int(states[0].step), config.max_iterations):
        d = _downscale_factor(config.model, step)
        cams, batches = [], []
        for t in trainers:
            _, cam, batch = t.dm.next_train()
            cam, batch = downscale_batch(batch, cam, d)
            cams.append(cam)
            batches.append(batch)
        cam_stack = jax.tree.map(lambda *ls: jnp.stack(ls), *cams)
        batch_stack = jax.tree.map(lambda *ls: jnp.stack(ls), *batches)
        if scene_sharding is not None:
            cam_stack = jax.tree.map(
                lambda l: jax.device_put(l, scene_sharding)
                if hasattr(l, "shape") else l, cam_stack)
            batch_stack = jax.device_put(batch_stack, scene_sharding)
        stacked, metrics = multi_scene_train_step(
            stacked, cam_stack, batch_stack, config.model, share_up_net
        )
        if (step + 1) % config.model.refine_every == 0:
            from gaussiangrasper_tpu.engine.train_state import refine_step

            per_scene = unstack_states(stacked, n_scenes)
            cam0 = cams[0]
            per_scene = [
                refine_step(st, config.model, cam0.width, cam0.height,
                            len(t.dm))
                for st, t in zip(per_scene, trainers)
            ]
            stacked = stack_states(per_scene)
            if scene_sharding is not None:
                stacked = jax.device_put(stacked, scene_sharding)
        if step % config.steps_per_log == 0:
            print(
                f"[{step:6d}] scenes={n_scenes} loss={float(metrics['loss']):.4f} "
                f"psnr={float(metrics['psnr']):.2f}", flush=True,
            )
        if (step + 1) % config.steps_per_save == 0 or step + 1 == config.max_iterations:
            for i, st in enumerate(unstack_states(stacked, n_scenes)):
                path = ckpt.save_checkpoint(
                    config.run_dir / f"scene_{i}" / "checkpoints", st
                )
            print(f"saved {n_scenes} scene checkpoints at step {step + 1}")
    return unstack_states(stacked, n_scenes)


@partial(jax.jit, static_argnames=("cfg", "share_up_net"), donate_argnums=(0,))
def multi_scene_train_step(
    states: TrainState,            # stacked (S, ...) pytree
    cameras: Camera,               # leaves stacked (S, ...)
    batches: Dict[str, jax.Array],  # leaves stacked (S, ...)
    cfg: GaussianSplatConfig,
    share_up_net: bool = True,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One vmapped step over all scenes. With share_up_net, the post-step
    fea_up parameters are averaged across scenes (equivalent in
    expectation to summing the distillation gradients into one MLP)."""
    new_states, metrics = jax.vmap(
        lambda s, c, b: train_step(s, c, b, cfg)
    )(states, cameras, batches)
    if share_up_net:
        mean_up = jax.tree.map(lambda l: jnp.mean(l, axis=0), new_states.fea_up)
        s = jax.tree.leaves(new_states.step)[0].shape[0]
        new_states = new_states._replace(
            fea_up=jax.tree.map(
                lambda m: jnp.broadcast_to(m, (s,) + m.shape), mean_up
            )
        )
    return new_states, {k: jnp.mean(v) for k, v in metrics.items()}
