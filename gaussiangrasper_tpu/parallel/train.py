"""Sharded multi-camera training step (the DDP + primitive-sharding analog).

One jitted program per step: vmap over a camera batch (axis "dp"), Gaussian
field sharded over "gauss", losses averaged, gradients all-reduced across
"dp" and kept sharded across "gauss" — all collectives inserted by XLA from
NamedSharding annotations (see parallel/mesh.py for the axis semantics).

Replaces the reference's mp.spawn + NCCL DDP world (/root/reference/
nerfstudio/scripts/train.py:161-224) with zero hand-written communication.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.engine import optimizers as optim
from gaussiangrasper_tpu.engine.refinement import accumulate_stats
from gaussiangrasper_tpu.engine.train_state import TrainState
from gaussiangrasper_tpu.models.model import GaussianSplatConfig, train_loss


def _gauss_spec(leaf: jax.Array) -> P:
    """Capacity-axis sharding for field/opt leaves; scalars replicated."""
    if leaf.ndim == 0:
        return P()
    return P("gauss")


def state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """NamedShardings for every TrainState leaf: capacity-sharded field,
    opt state and stats; replicated step/key/fea_up (the EFD MLP is tiny)."""

    def named(spec):
        return NamedSharding(mesh, spec)

    def gauss_tree(tree):
        return jax.tree.map(lambda l: named(_gauss_spec(l)), tree)

    return TrainState(
        step=named(P()),
        field=gauss_tree(state.field),
        alive=named(P("gauss")),
        fea_up=jax.tree.map(lambda _: named(P()), state.fea_up),
        opt=jax.tree.map(lambda l: named(_gauss_spec(l)) if l.ndim > 0 and
            l.shape[0] == state.field.capacity else named(P()), state.opt),
        stats=gauss_tree(state.stats),
        key=named(P()),
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host-built TrainState onto the mesh."""
    return jax.device_put(state, state_shardings(state, mesh))


def batch_shardings(mesh: Mesh):
    """Camera batches and pixel batches shard their leading axis over dp."""
    return NamedSharding(mesh, P("dp"))


def make_sharded_train_step(mesh: Mesh, cfg: GaussianSplatConfig, capacity: int,
                            tile_shard: bool = False,
                            gather_budget: int | None = None,
                            alive=None):
    """Build the jitted sharded step.

    The returned function takes (state, cameras, batches) where every
    camera/batch leaf has a leading axis of size dp_batch (>= the mesh's dp
    extent, a multiple of it) and returns (state, metrics) with metrics
    averaged over the batch.

    tile_shard=True routes the render through the tile-sharded compositor
    (parallel/tile_shard.py): the compositing work for each camera is
    distributed over the "gauss" axis with a frustum-culled all-gather,
    instead of every device compositing the full image from a full-capacity
    gather. Composes with dp > 1 (the natural pod layout: dp over hosts x
    gauss within a host): the camera batch is vmapped with
    spmd_axis_name="dp", so each dp row runs the gauss-sharded composite
    for its own camera — 2-D (dp, gauss) parallelism from one program.
    """
    compositor = None
    if tile_shard:
        from gaussiangrasper_tpu.parallel.tile_shard import (
            derive_gather_budget,
            tile_sharded_compositor,
        )

        if gather_budget is None and alive is not None:
            # default path: a static budget from the concrete alive count
            # so dead capacity slots are never transmitted (re-derive after
            # refinement; see derive_gather_budget)
            gather_budget = derive_gather_budget(alive, mesh.shape["gauss"])
        compositor = tile_sharded_compositor(mesh, gather_budget=gather_budget)

    def step_fn(
        state: TrainState,
        cameras: Camera,
        batches: Dict[str, jax.Array],
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        model_state = {"field": state.field, "fea_up": state.fea_up}

        def loss_fn(ms, probes):
            def one(cam, batch, probe):
                return train_loss(
                    ms, state.alive, cam, batch, state.step, cfg,
                    probe=probe, compositor=compositor,
                )

            # With the tile-sharded compositor, the camera vmap is pinned
            # to the "dp" mesh axis (spmd_axis_name) so the inner
            # gauss-axis shard_map batches across dp rows instead of
            # refusing to trace under vmap.
            vmap_kw = {"spmd_axis_name": "dp"} if compositor is not None else {}
            totals, auxs = jax.vmap(one, **vmap_kw)(cameras, batches, probes)
            return jnp.mean(totals), auxs

        b = jax.tree.leaves(cameras)[0].shape[0]
        probes = jnp.zeros((b, capacity, 2), state.field.means.dtype)
        (total, auxs), (grads, probe_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(model_state, probes)

        # Densification stats: fold the batch axis (each camera contributes
        # its own visibility and grad-norm just as sequential steps would).
        stats = state.stats
        width, height = cameras.width, cameras.height
        def fold(stats, xy_g, radii):
            return accumulate_stats(stats, xy_g, radii, width, height)
        stats = jax.lax.fori_loop(
            0, b,
            lambda i, s: fold(s, probe_grads[i], auxs["radii"][i]),
            stats,
        )

        new_model, new_opt = optim.apply_updates_grouped(
            model_state, grads, state.opt, state.step
        )
        metrics = {
            "loss": total,
            "psnr": jnp.mean(auxs["psnr"]),
            "gaussian_count": jnp.sum(state.alive),
            "overflow": jnp.max(auxs["overflow"]),
            "pair_overflow": jnp.max(auxs["pair_overflow"]),
            **{k: jnp.mean(v) for k, v in auxs["loss_dict"].items()},
            # tile-shard gather stats (present only when the compositor is
            # the tile-sharded one): budget health must be visible in the
            # production writer, never only in tests
            **{k: jnp.max(auxs[k]) for k in
               ("gathered_rows", "gather_overflow", "merge_overflow")
               if k in auxs},
        }
        new_state = TrainState(
            step=state.step + 1,
            field=new_model["field"],
            alive=state.alive,
            fea_up=new_model["fea_up"],
            opt=new_opt,
            stats=stats,
            key=state.key,
        )
        return new_state, metrics

    # Sharding annotations: XLA derives every collective from these.
    dp_shard = batch_shardings(mesh)
    rep = NamedSharding(mesh, P())

    def shardings_for_state(state):
        return state_shardings(state, mesh)

    @partial(jax.jit, donate_argnums=(0,))
    def sharded_step(state, cameras, batches):
        state = jax.lax.with_sharding_constraint(state, shardings_for_state(state))
        cameras = jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(l, dp_shard)
            if l.ndim > 0 else l, cameras
        )
        batches = jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(l, dp_shard), batches
        )
        new_state, metrics = step_fn(state, cameras, batches)
        new_state = jax.lax.with_sharding_constraint(
            new_state, shardings_for_state(new_state)
        )
        metrics = jax.tree.map(
            lambda l: jax.lax.with_sharding_constraint(l, rep), metrics
        )
        return new_state, metrics

    return sharded_step
