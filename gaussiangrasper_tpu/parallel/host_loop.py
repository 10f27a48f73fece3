"""Host loop for mesh-sharded training.

Couples the sharded step (parallel/train.py) with the datamanager: each
step draws a dp-sized camera batch (across hosts, each process draws from
its own camera shard and contributes its slice of the global batch via
jax.make_array_from_process_local_data), periodically runs the (sharding-
propagated) refinement step, and checkpoints from process 0.

This is the TPU-native replacement for the reference's
mp.spawn + DDP train_loop (/root/reference/nerfstudio/scripts/train.py:
161-224) — one controller per host, one jitted program per step.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gaussiangrasper_tpu.engine import checkpoint as ckpt
from gaussiangrasper_tpu.engine.train_state import refine_step
from gaussiangrasper_tpu.engine.trainer import _downscale_factor, downscale_batch
from gaussiangrasper_tpu.parallel.mesh import make_mesh
from gaussiangrasper_tpu.parallel.train import (
    make_sharded_train_step,
    shard_train_state,
)


def _globalize(tree, mesh):
    """Per-process batch leaves -> global dp-sharded arrays."""
    sharding = NamedSharding(mesh, P("dp"))
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda l: jax.make_array_from_process_local_data(sharding, np.asarray(l)),
        tree,
    )


def train_sharded(
    trainer,
    dp: Optional[int] = None,
    gauss: Optional[int] = None,
    tile_shard: Optional[bool] = None,
):
    """Run trainer's schedule with a ("dp","gauss") mesh. `trainer` is an
    engine.trainer.Trainer whose setup() has run.

    tile_shard: distribute each camera's compositing over the "gauss" axis
    (parallel/tile_shard.py) instead of the full-capacity gather. None =
    auto: on whenever the gauss axis is >1 (the full-capacity step never
    wins there — it gathers dead slots too). The all-gather budget is
    derived from the live alive count and RE-derived after every
    refinement; the jitted step is rebuilt only when the rounded budget
    actually moves (derive_gather_budget's 128-row quantum + margin make
    that rare)."""
    cfg = trainer.config
    mcfg = cfg.model
    state = trainer.state if trainer.state is not None else trainer.setup()
    cap = state.field.capacity
    mesh = make_mesh(dp=dp, gauss=gauss)
    dp_size = mesh.shape["dp"]
    local_dp = max(dp_size // jax.process_count(), 1)
    if tile_shard is None:
        tile_shard = mesh.shape["gauss"] > 1

    state = shard_train_state(state, mesh)
    gather_budget = None

    def build_step(alive_now):
        nonlocal gather_budget
        if not tile_shard:
            return make_sharded_train_step(mesh, mcfg, cap)
        from gaussiangrasper_tpu.parallel.tile_shard import derive_gather_budget

        gather_budget = derive_gather_budget(
            np.asarray(alive_now), mesh.shape["gauss"]
        )
        return make_sharded_train_step(
            mesh, mcfg, cap, tile_shard=True, gather_budget=gather_budget
        )

    step_fn = build_step(state.alive)
    num_train = len(trainer.dm)

    start = int(state.step)
    t0 = time.perf_counter()
    for step in range(start, cfg.max_iterations):
        d = _downscale_factor(mcfg, step)
        cams, batches = [], []
        for _ in range(local_dp):
            _, cam, batch = trainer.dm.next_train()
            cam, batch = downscale_batch(batch, cam, d)
            cams.append(cam)
            batches.append(batch)
        cam_stack = jax.tree.map(lambda *ls: jnp.stack(ls), *cams)
        batch_stack = jax.tree.map(lambda *ls: jnp.stack(ls), *batches)
        cam_stack = jax.tree.map(
            lambda l: _globalize(l, mesh) if hasattr(l, "shape") else l, cam_stack
        )
        batch_stack = _globalize(batch_stack, mesh)

        state, metrics = step_fn(state, cam_stack, batch_stack)

        if (step + 1) % mcfg.refine_every == 0:
            state = refine_step(state, mcfg, cams[0].width, cams[0].height,
                                num_train)
            if tile_shard:
                # refinement changed the alive count: re-derive the gather
                # budget; only rebuild (re-jit) when the rounded budget
                # moved, so recompiles happen at capacity-growth scale,
                # not every refine (derive_gather_budget docstring).
                from gaussiangrasper_tpu.parallel.tile_shard import (
                    derive_gather_budget,
                )

                new_budget = derive_gather_budget(
                    np.asarray(state.alive), mesh.shape["gauss"]
                )
                if new_budget != gather_budget:
                    step_fn = build_step(state.alive)

        if trainer.writer is not None and jax.process_index() == 0:
            keys = ["loss", "psnr", "gaussian_count", "overflow",
                    "pair_overflow"]
            keys += [k for k in ("gathered_rows", "gather_overflow",
                                 "merge_overflow") if k in metrics]
            trainer.writer.step(
                step,
                {k: metrics[k] for k in keys if k in metrics},
                pixels=dp_size * cams[0].width * cams[0].height,
            )
        if (step + 1) % cfg.steps_per_save == 0 or step + 1 == cfg.max_iterations:
            # all processes participate (orbax coordinates the write)
            path = ckpt.save_checkpoint(cfg.ckpt_dir, state)
            if jax.process_index() == 0:
                print(f"saved {path}")
    dt = time.perf_counter() - t0
    steps = cfg.max_iterations - start
    if steps and jax.process_index() == 0:
        px = steps * dp_size * trainer.dm.camera(0).width * trainer.dm.camera(0).height
        print(f"sharded: {steps} steps in {dt:.1f}s "
              f"({px / dt / 1e6:.2f} Mpx/s over mesh {dict(mesh.shape)})")
    trainer.state = state
    return state
