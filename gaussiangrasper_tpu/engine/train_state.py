"""Training state + the fused, jittable train step.

The reference's Trainer.train_iteration (/root/reference/nerfstudio/engine/
trainer.py:458-498) runs: zero due grads -> forward -> loss -> backward ->
step due groups -> schedulers, with the densification statistics harvested
from `xys.retain_grad()` in an AFTER-callback (gaussian_splatting.py:373).
Here all of that is ONE pure function: loss, gradients (including the
screen-space probe gradient), per-group accumulation/Adam, and the stats
update fuse into a single XLA program — no Python between kernels, no
retain_grad hack, no separate callback pass.

Refinement (every refine_every steps) is a separately-jitted pure function
(engine/refinement.py) invoked by the host loop between steps.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.engine import optimizers as optim
from gaussiangrasper_tpu.engine.refinement import DensifyStats, accumulate_stats, refine
from gaussiangrasper_tpu.models.gaussian_field import GaussianParams
from gaussiangrasper_tpu.models.model import GaussianSplatConfig, train_loss


class TrainState(NamedTuple):
    step: jax.Array                      # () int32
    field: GaussianParams                # capacity-C parameter buffers
    alive: jax.Array                     # (C,) bool
    fea_up: Dict[str, jax.Array]         # EFD MLP params
    opt: Dict[str, optim.GroupOptState]  # per-group Adam + accumulators
    stats: DensifyStats                  # densification statistics
    key: jax.Array                       # PRNG state
    pose: Any = None                     # (num_cameras, 6) pose deltas or None

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive)


def init_train_state(
    key: jax.Array,
    field: GaussianParams,
    alive: jax.Array,
    fea_up: Dict[str, jax.Array],
    group_cfgs: Dict[str, optim.GroupConfig] = optim.DEFAULT_GROUPS,
    pose: Any = None,
) -> TrainState:
    model_state = {"field": field, "fea_up": fea_up, "pose": pose}
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        field=field,
        alive=alive,
        fea_up=fea_up,
        opt=optim.init_opt_state(model_state, group_cfgs),
        stats=DensifyStats.zeros(field.capacity),
        key=key,
        pose=pose,
    )


def grow_capacity(state: TrainState, new_capacity: int) -> TrainState:
    """Grow the field's capacity mid-training (host-side, outside jit).

    The reference reallocates every parameter to the checkpoint's
    Gaussian count on load (ref gaussian_splatting.py:301-313); in the
    fixed-capacity design the analog is padding every capacity-length
    buffer: field rows (dead-slot conventions via GaussianParams.pad_to,
    identity quats), the alive mask (False), the per-group Adam
    moments/accumulators (zeros — the same convention the densify
    optimizer surgery uses for fresh rows, ref optimizers.py:352-371)
    and the densify statistics (zeros). Use when densification saturates
    the allocated capacity (count pins at capacity and splits starve);
    resume training with the new capacity after re-saving."""
    c = state.field.capacity
    if new_capacity <= c:
        return state
    extra = new_capacity - c

    def pad_leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == c:
            return jnp.pad(x, [(0, extra)] + [(0, 0)] * (x.ndim - 1))
        return x

    # only FIELD parameter groups hold capacity-length optimizer state;
    # up_net/pose leaves could coincidentally share the leading dim
    field_groups = set(optim.FIELD_GROUP_OF.values())
    opt = {
        name: (jax.tree.map(pad_leaf, gs) if name in field_groups else gs)
        for name, gs in state.opt.items()
    }
    return state._replace(
        field=state.field.pad_to(new_capacity),
        alive=jnp.pad(state.alive, (0, extra)),
        opt=opt,
        stats=jax.tree.map(pad_leaf, state.stats),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(
    state: TrainState,
    camera: Camera,
    batch: Dict[str, jax.Array],
    cfg: GaussianSplatConfig,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One fused optimization step. Returns (new_state, metrics)."""
    c = state.field.capacity

    def loss_fn(model_state, probe):
        total, aux = train_loss(
            model_state, state.alive, camera, batch, state.step, cfg, probe=probe
        )
        return total, aux

    model_state = {"field": state.field, "fea_up": state.fea_up,
                   "pose": state.pose}
    probe = jnp.zeros((c, 2), state.field.means.dtype)
    (total, aux), (grads, probe_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(model_state, probe)

    # Densification statistics from the probe gradient (replaces the
    # reference's xys.retain_grad + after_train, ref :373-393).
    stats = accumulate_stats(
        state.stats, probe_grad, aux["radii"], camera.width, camera.height
    )

    new_model, new_opt = optim.apply_updates_grouped(
        model_state, grads, state.opt, state.step
    )

    metrics = {
        "loss": total,
        "psnr": aux["psnr"],
        "gaussian_count": state.num_alive,
        "overflow": aux["overflow"],
        "dropped_tiles": aux["dropped_tiles"],
        "pair_overflow": aux["pair_overflow"],
        **aux["loss_dict"],
        # per-group gradient norms (the reference's log_gradients panel,
        # trainer.py:483-492) — cheap reduces, always on
        **{
            f"grad_norm/{name}": optax.global_norm(g)
            for name, g in optim.to_groups(grads).items()
        },
    }
    new_state = TrainState(
        step=state.step + 1,
        field=new_model["field"],
        alive=state.alive,
        fea_up=new_model["fea_up"],
        opt=new_opt,
        stats=stats,
        key=state.key,
        pose=new_model.get("pose"),
    )
    return new_state, metrics


@partial(
    jax.jit,
    static_argnames=("cfg", "width", "height", "num_train_data"),
    donate_argnums=(0,),
)
def refine_step(
    state: TrainState,
    cfg: GaussianSplatConfig,
    width: int,
    height: int,
    num_train_data: int,
) -> TrainState:
    """Densify/cull/reset pass (host calls this every cfg.refine_every)."""
    key, sub = jax.random.split(state.key)
    adam_groups = {name: st.adam for name, st in state.opt.items()}
    field, alive, adam_groups, stats = refine(
        state.field,
        state.alive,
        adam_groups,
        state.stats,
        state.step,
        sub,
        width=width,
        height=height,
        num_train_data=num_train_data,
        warmup_length=cfg.warmup_length,
        refine_every=cfg.refine_every,
        reset_alpha_every=cfg.reset_alpha_every,
        densify_grad_thresh=cfg.densify_grad_thresh,
        densify_size_thresh=cfg.densify_size_thresh,
        n_split_samples=cfg.n_split_samples,
        stop_split_at=cfg.stop_split_at,
        stop_screen_size_at=cfg.stop_screen_size_at,
        split_screen_size=cfg.split_screen_size,
        cull_alpha_thresh=cfg.cull_alpha_thresh,
        cull_scale_thresh=cfg.cull_scale_thresh,
        cull_screen_size=cfg.cull_screen_size,
    )
    new_opt = {
        name: optim.GroupOptState(adam=adam_groups[name], accum=st.accum)
        for name, st in state.opt.items()
    }
    return state._replace(
        field=field, alive=alive, opt=new_opt, stats=stats, key=key
    )
