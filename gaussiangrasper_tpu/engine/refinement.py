"""Adaptive densification / culling under XLA static shapes.

The reference mutates parameter *lengths* every `refine_every` steps
(split/dup/cull + Adam-state surgery, /root/reference/nerfstudio/models/
gaussian_splatting.py:402-546, 333-371). On TPU that would force a
recompilation each time, so the design here is fixed-capacity + alive-mask:

- the field owns `capacity` slots; `alive` marks real Gaussians;
- culling clears mask bits (no data movement);
- split/dup children are *scattered into dead slots*, allocated with a
  prefix-sum free-list (searchsorted maps each dead slot back to its source
  Gaussian) — O(C log C), fully jittable, no dynamic shapes anywhere;
- Adam moments of reused slots are zeroed at write time, which is exactly
  the reference's `dup_in_optim` zero-padding (ref :352-371) expressed as a
  pure state transform.

Decision semantics replicate `refinement_after` (ref :402-478) bit-for-bit:
split mask, dup mask, the 0.5*max(H,W) grad normalization, the /1.6 scale
shrink applied to BOTH the split originals and their children, cull
thresholds and the reset-cool-down gating, and the periodic opacity reset
to logit(0.8 * cull_alpha_thresh) with zeroed opacity Adam state.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core.transforms import normalize, quat_to_rotmat
from gaussiangrasper_tpu.models.gaussian_field import GaussianParams


class DensifyStats(NamedTuple):
    """Running screen-space statistics driving densification (the
    reference's `xys_grad_norm` / `vis_counts` / `max_2Dsize` accumulated in
    `after_train`, ref :373-393). All arrays are capacity-length."""

    grad_norm_sum: jax.Array  # (C,) sum of ||dL/dxy|| over steps seen
    vis_counts: jax.Array     # (C,) number of steps the Gaussian was visible
    max_radii: jax.Array      # (C,) max screen radius / max(W, H)

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        # Three distinct buffers — sharing one array would alias donated
        # arguments under jit donation.
        return cls(
            grad_norm_sum=jnp.zeros((capacity,), jnp.float32),
            vis_counts=jnp.zeros((capacity,), jnp.float32),
            max_radii=jnp.zeros((capacity,), jnp.float32),
        )


def accumulate_stats(
    stats: DensifyStats,
    xy_grads: jax.Array,  # (C, 2) dL/dxys from the probe
    radii: jax.Array,     # (C,) screen radii (0 = not visible)
    width: int,
    height: int,
) -> DensifyStats:
    """Per-step update (ref after_train :373-393). The reference's FIRST
    accumulation after a reset sets vis_counts to ONES for every Gaussian
    and grad_norm to the raw grads (ref :380-382: torch.ones_like); later
    steps increment only visible entries. Replicated via the first-step
    branch below (detected by an all-zero counter)."""
    vis = (radii > 0.0).astype(jnp.float32)
    gn = jnp.linalg.norm(xy_grads, axis=-1)
    first = jnp.sum(stats.vis_counts) == 0.0
    return DensifyStats(
        grad_norm_sum=jnp.where(first, gn, stats.grad_norm_sum + gn * vis),
        vis_counts=jnp.where(first, jnp.ones_like(vis), stats.vis_counts + vis),
        max_radii=jnp.maximum(stats.max_radii, vis * radii / float(max(width, height))),
    )


def _alloc_children(
    dead: jax.Array,      # (C,) bool — free slots
    n_children: jax.Array,  # (C,) int32 — children requested per (alive) slot
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Free-list allocation: returns, per slot d,
      receives (C,) bool — d gets a child,
      src (C,) int32     — the parent slot index,
      child_j (C,) int32 — which of the parent's children (0..nsamps-1).
    Children beyond the free capacity are dropped (parents keep their
    originals, so this degrades gracefully when the field is full)."""
    c = dead.shape[0]
    # Rank of each dead slot in the free list.
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1  # valid where dead
    total_new = jnp.sum(n_children)
    # Exclusive prefix over requested children: parent i owns request ids
    # [off[i], off[i] + n_children[i]).
    cum_incl = jnp.cumsum(n_children)
    off = cum_incl - n_children
    receives = dead & (dead_rank < total_new)
    r = jnp.where(receives, dead_rank, 0)
    src = jnp.searchsorted(cum_incl, r, side="right").astype(jnp.int32)
    src = jnp.minimum(src, c - 1)
    child_j = r - off[src]
    return receives, src, child_j


def refine(
    field: GaussianParams,
    alive: jax.Array,
    adam_groups: Dict[str, Any],
    stats: DensifyStats,
    step: jax.Array,
    key: jax.Array,
    *,
    width: int,
    height: int,
    num_train_data: int,
    warmup_length: int = 500,
    refine_every: int = 100,
    reset_alpha_every: int = 30,
    densify_grad_thresh: float = 0.0002,
    densify_size_thresh: float = 0.01,
    n_split_samples: int = 2,
    stop_split_at: int = 15000,
    stop_screen_size_at: int = 4000,
    split_screen_size: float = 0.05,
    cull_alpha_thresh: float = 0.1,
    cull_scale_thresh: float = 0.5,
    cull_screen_size: float = 0.15,
) -> Tuple[GaussianParams, jax.Array, Dict[str, Any], DensifyStats]:
    """One refinement pass (call every `refine_every` steps, post-update).

    `adam_groups` maps group name -> optax.ScaleByAdamState whose mu/nu
    pytrees mirror the field leaves (see engine/optimizers.py). Returns the
    updated (field, alive, adam_groups, stats-reset-to-zero).

    Fully jittable: gating conditions are computed as traced booleans and
    applied via `jnp.where`, so a single compiled function serves every
    refinement step of the schedule.
    """
    c = field.capacity
    step = jnp.asarray(step)
    reset_interval = reset_alpha_every * refine_every
    past_warmup = step >= warmup_length
    # Only densify/cull once every image has been seen since the last
    # opacity reset (ref :406-410).
    cooled = (step % reset_interval) > (num_train_data + refine_every)

    scales = jnp.exp(field.log_scales)
    scale_max = jnp.max(scales, axis=-1)

    # ---- densification decision (ref :411-433) ----
    avg_grad = (
        stats.grad_norm_sum / jnp.maximum(stats.vis_counts, 1.0)
    ) * 0.5 * float(max(width, height))
    high_grads = avg_grad > densify_grad_thresh
    splits = scale_max > densify_size_thresh
    splits = jnp.where(
        step < stop_screen_size_at,
        splits | (stats.max_radii > split_screen_size),
        splits,
    )
    splits = splits & high_grads & alive
    dups = (scale_max <= densify_size_thresh) & high_grads & alive

    densify_on = past_warmup & (step < stop_split_at) & cooled
    splits = splits & densify_on
    dups = dups & densify_on

    # ---- allocate children into dead slots ----
    n_children = jnp.where(splits, n_split_samples, 0) + jnp.where(dups, 1, 0)
    receives, src, _ = _alloc_children(~alive, n_children.astype(jnp.int32))

    src_is_split = splits[src]
    # Split children: mean + R(quat) @ (scale * eps), scales / 1.6 (ref
    # :504-531). Dup children: exact copies (ref :533-546). Noise is drawn
    # per destination slot so children of one parent differ.
    eps = jax.random.normal(key, (c, 3), field.means.dtype)
    rot = quat_to_rotmat(normalize(field.quats[src]))
    offset = jnp.einsum("nij,nj->ni", rot, scales[src] * eps)
    child_means = field.means[src] + jnp.where(src_is_split[:, None], offset, 0.0)
    shrink = jnp.log(1.6)
    child_log_scales = field.log_scales[src] - jnp.where(src_is_split[:, None], shrink, 0.0)

    def scatter(leaf, child_leaf):
        m = receives.reshape((c,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, child_leaf, leaf)

    new_field = GaussianParams(
        means=scatter(field.means, child_means),
        log_scales=scatter(field.log_scales, child_log_scales),
        quats=scatter(field.quats, field.quats[src]),
        opacity_logits=scatter(field.opacity_logits, field.opacity_logits[src]),
        sh_coeffs=scatter(field.sh_coeffs, field.sh_coeffs[src]),
        features=scatter(field.features, field.features[src]),
    )
    # Shrink the split originals too (ref :521 mutates self.scales in place).
    new_field = new_field._replace(
        log_scales=new_field.log_scales - jnp.where(splits[:, None], shrink, 0.0)
    )
    new_alive = alive | receives

    # ---- cull (ref cull_gaussians :480-502; gating :458-462) ----
    # Freshly scattered children enter the cull pass with zeroed screen-size
    # stats (the reference appends zeros to max_2Dsize, ref :442) and their
    # own (post-shrink) scales.
    opac = jax.nn.sigmoid(new_field.opacity_logits)
    new_scale_max = jnp.max(jnp.exp(new_field.log_scales), axis=-1)
    max_radii_eff = jnp.where(receives, 0.0, stats.max_radii)
    culls = opac < cull_alpha_thresh
    toobig = new_scale_max > cull_scale_thresh
    culls = jnp.where(step > refine_every * reset_alpha_every, culls | toobig, culls)
    culls = jnp.where(
        (step > refine_every * reset_alpha_every) & (step < stop_screen_size_at),
        culls | (max_radii_eff > cull_screen_size),
        culls,
    )
    cull_on = past_warmup & cooled
    new_alive = new_alive & ~(culls & cull_on & new_alive)

    # ---- opacity reset (ref :465-475) ----
    reset_on = past_warmup & ((step % reset_interval) == refine_every)
    reset_logit = jnp.log(0.8 * cull_alpha_thresh) - jnp.log1p(-0.8 * cull_alpha_thresh)
    new_field = new_field._replace(
        opacity_logits=jnp.where(
            reset_on, jnp.full_like(new_field.opacity_logits, reset_logit),
            new_field.opacity_logits,
        )
    )

    # ---- Adam-state surgery as a pure map (ref :333-371) ----
    # Reused slots get zero moments; the opacity group is fully zeroed on
    # reset steps.
    def clean_moments(group_name, adam_state):
        def z(leaf):
            m = receives.reshape((c,) + (1,) * (leaf.ndim - 1))
            out = jnp.where(m, 0.0, leaf)
            if group_name == "opacity":
                out = jnp.where(reset_on, jnp.zeros_like(out), out)
            return out

        return adam_state._replace(
            mu=jax.tree.map(z, adam_state.mu),
            nu=jax.tree.map(z, adam_state.nu),
        )

    new_adam = {
        name: clean_moments(name, st) if name != "up_net" else st
        for name, st in adam_groups.items()
    }

    # Stats reset only once refinement is actually active (the reference's
    # whole refinement_after body — including the reset — is inside the
    # `step >= warmup_length` guard, ref :403, :476-478).
    new_stats = jax.tree.map(
        lambda z, old: jnp.where(past_warmup, z, old),
        DensifyStats.zeros(c), stats,
    )
    return new_field, new_alive, new_adam, new_stats
