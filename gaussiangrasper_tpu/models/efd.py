"""Efficient Feature Distillation head: the `fea_up` MLP.

32 -> 128 -> ReLU -> 512 linear stack lifting rendered latent features into
CLIP space (ref /root/reference/nerfstudio/models/gaussian_splatting.py:
198-213 `MLP`, instantiated :258, used in the up_loss :917-918). Plain
pytree weights (no framework module) so it checkpoints/shards like any
other parameter group ("up_net" in the reference's optimizers).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def init_mlp(
    key: jax.Array,
    in_dim: int = 32,
    out_dim: int = 512,
    hidden: Sequence[int] = (128,),
) -> Dict[str, jax.Array]:
    """Kaiming-uniform init (the torch.nn.Linear default the reference
    trains with)."""
    dims = [in_dim, *hidden, out_dim]
    params = {}
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, kw, kb = jax.random.split(key, 3)
        # torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) ->
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights and bias alike
        bound = 1.0 / jnp.sqrt(d_in)
        params[f"w{i}"] = jax.random.uniform(
            kw, (d_in, d_out), minval=-bound, maxval=bound
        )
        params[f"b{i}"] = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return params


def mlp_apply(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Forward: Linear-ReLU-...-Linear (no final activation)."""
    n_layers = len(params) // 2
    for i in range(n_layers):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    return x
