"""Proposal-network sampling losses (nerfacto / mip-NeRF 360 machinery).

Role of the reference's model_components/ray_samplers.py
ProposalNetworkSampler + model_components/losses.py `interlevel_loss` and
`distortion_loss` (used by models/nerfacto.py get_loss_dict with weights
interlevel 1.0 / distortion 0.002, configs/method_configs.py nerfacto
entry). Pure jnp over (rays, samples) arrays — static shapes, fuses fully.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def outer_weights(
    t_env: jax.Array,   # (..., Sp+1) proposal bin edges (sorted)
    w_env: jax.Array,   # (..., Sp) proposal bin weights
    t: jax.Array,       # (..., S+1) query bin edges (sorted)
) -> jax.Array:
    """For each query interval, the total proposal weight of every proposal
    bin it overlaps (the mip-NeRF 360 `lossfun_outer` envelope; reference
    losses.py interlevel path). Returns (..., S)."""
    cw = jnp.concatenate(
        [jnp.zeros_like(w_env[..., :1]), jnp.cumsum(w_env, axis=-1)], axis=-1
    )  # (..., Sp+1)

    def per_ray(te, cwr, tq):
        lo = jnp.searchsorted(te, tq[:-1], side="left")
        hi = jnp.searchsorted(te, tq[1:], side="right")
        lo = jnp.clip(lo - 1, 0, cwr.shape[0] - 1)
        hi = jnp.clip(hi, 0, cwr.shape[0] - 1)
        return cwr[hi] - cwr[lo]

    flat_env = t_env.reshape(-1, t_env.shape[-1])
    flat_cw = cw.reshape(-1, cw.shape[-1])
    flat_t = t.reshape(-1, t.shape[-1])
    out = jax.vmap(per_ray)(flat_env, flat_cw, flat_t)
    return out.reshape(t.shape[:-1] + (t.shape[-1] - 1,))


def interlevel_loss(
    prop_hists,                    # list of (edges (...,Sp+1), weights (...,Sp))
    t: jax.Array,                  # (..., S+1) final edges
    w: jax.Array,                  # (..., S) final weights
) -> jax.Array:
    """sum over proposal levels of E[ clip(w - w_outer, 0)^2 / (w + eps) ]
    (reference losses.py `interlevel_loss`; proposal nets must upper-bound
    the final histogram). Final weights are detached (the reference
    detaches the fine histogram so only the proposals are pushed)."""
    t = jax.lax.stop_gradient(t)
    w = jax.lax.stop_gradient(w)
    total = 0.0
    for t_env, w_env in prop_hists:
        w_outer = outer_weights(t_env, w_env, t)
        excess = jnp.clip(w - w_outer, 0.0)
        total = total + jnp.mean(excess * excess / (w + 1e-7))
    return total


def distortion_loss(t: jax.Array, w: jax.Array, near: float, far: float
                    ) -> jax.Array:
    """mip-NeRF 360 distortion: concentrate weight mass
    (reference losses.py `distortion_loss` via torchmetrics'
    lossfun_distortion). t normalized to [0, 1]."""
    s = (t - near) / (far - near)
    mids = 0.5 * (s[..., 1:] + s[..., :-1])      # (..., S)
    dm = jnp.abs(mids[..., :, None] - mids[..., None, :])
    inter = jnp.sum(w[..., :, None] * w[..., None, :] * dm, axis=(-2, -1))
    intra = jnp.sum(w * w * (s[..., 1:] - s[..., :-1]), axis=-1) / 3.0
    return jnp.mean(inter + intra)
