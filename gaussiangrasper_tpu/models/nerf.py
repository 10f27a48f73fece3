"""Ray-marched radiance-field models (the reference's NeRF-family zoo).

Role of the reference's models/vanilla_nerf.py and models/nerfacto.py (+
fields/). Two fields are provided behind one render interface:

  - "vanilla":  positional-encoded MLP, coarse-to-fine hierarchical
                sampling (vanilla_nerf.py / mipnerf lineage)
  - "nerfacto": multires hash grid + small MLPs (nerfacto.py /
                instant-ngp lineage, minus the tcnn fusion — see
                models/encodings.py for why pure-jnp gathers suffice)

Everything is pure pytree params + functions; the GS path shares the
Camera/ray primitives but none of this code.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core.rays import (
    RayBundle,
    composite,
    render_weights,
    sample_along_rays,
    sample_pdf,
)
from gaussiangrasper_tpu.models.efd import init_mlp, mlp_apply
from gaussiangrasper_tpu.models.encodings import (
    hash_grid_encode,
    init_hash_grid,
    positional_encoding,
    sh_encoding,
)


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    field: str = "nerfacto"           # "vanilla" | "nerfacto"
    near: float = 0.05
    far: float = 6.0
    num_coarse: int = 64
    num_fine: int = 64                 # pdf-resampled (vanilla) / second pass
    pos_freqs: int = 10
    dir_freqs: int = 4
    hidden: int = 128
    hash_levels: int = 12
    hash_features: int = 2
    log2_hashmap_size: int = 17
    scene_scale: float = 2.0           # positions mapped to [0,1] by /(2*scale)+0.5


def init_nerf(key: jax.Array, cfg: NerfConfig) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if cfg.field == "vanilla":
        in_dim = 3 + 6 * cfg.pos_freqs
        dir_dim = 3 + 6 * cfg.dir_freqs
        return {
            "density_mlp": init_mlp(k1, in_dim, cfg.hidden + 1,
                                    (cfg.hidden, cfg.hidden, cfg.hidden)),
            "color_mlp": init_mlp(k2, cfg.hidden + dir_dim, 3, (cfg.hidden // 2,)),
        }
    grid = init_hash_grid(
        k1, num_levels=cfg.hash_levels, features_per_level=cfg.hash_features,
        log2_hashmap_size=cfg.log2_hashmap_size,
    )
    enc_dim = cfg.hash_levels * cfg.hash_features
    return {
        "grid": grid,
        # density head: 1 density + 15 geo features
        "density_mlp": init_mlp(k2, enc_dim, 16, (64,)),
        # color head: sh-deg3 dirs minus DC (15) + geo (15)
        "color_mlp": init_mlp(k3, 15 + 15, 3, (64,)),
    }


def _field(params: Dict, cfg: NerfConfig, positions, directions):
    """(density (..., 1), rgb (..., 3))."""
    if "grid" in params:
        x01 = jnp.clip(positions / (2 * cfg.scene_scale) + 0.5, 0.0, 1.0)
        enc = hash_grid_encode(params["grid"], x01)
        h = mlp_apply(params["density_mlp"], enc)
        density = jax.nn.softplus(h[..., :1] - 1.0)
        geo = h[..., 1:]
        d_enc = sh_encoding(directions, degree=3)[..., 1:]  # drop DC: 15 dims
        rgb = jax.nn.sigmoid(
            mlp_apply(params["color_mlp"], jnp.concatenate([d_enc, geo], -1))
        )
        return density, rgb
    enc = positional_encoding(positions, cfg.pos_freqs)
    h = mlp_apply(params["density_mlp"], enc)
    density = jax.nn.softplus(h[..., :1] - 1.0)
    geo = h[..., 1:]
    d_enc = positional_encoding(directions, cfg.dir_freqs)
    rgb = jax.nn.sigmoid(
        mlp_apply(params["color_mlp"], jnp.concatenate([geo, d_enc], -1))
    )
    return density, rgb


def render_rays(
    params: Dict, bundle: RayBundle, key: jax.Array, cfg: NerfConfig
) -> Dict[str, jax.Array]:
    """Hierarchical volume rendering: uniform coarse pass, inverse-CDF fine
    pass, composite rgb/depth/acc (the reference VanillaPipeline's NeRF
    path: ray_samplers + renderers)."""
    k1, k2 = jax.random.split(key)
    coarse = sample_along_rays(bundle, cfg.near, cfg.far, cfg.num_coarse, k1)
    dens_c, rgb_c = _field(params, cfg, coarse.positions, coarse.directions)
    w_c = render_weights(dens_c, coarse.deltas)

    # fine resampling around coarse weights
    mids = 0.5 * (coarse.starts[..., 0] + coarse.ends[..., 0])  # (..., S)
    edges = jnp.concatenate(
        [coarse.starts[..., :1, 0], 0.5 * (mids[..., 1:] + mids[..., :-1]),
         coarse.ends[..., -1:, 0]], axis=-1,
    )
    t_fine = sample_pdf(edges, w_c[..., 0], cfg.num_fine, k2)
    t_all = jnp.sort(jnp.concatenate([mids, t_fine], axis=-1), axis=-1)
    pos = (
        bundle.origins[..., None, :]
        + bundle.directions[..., None, :] * t_all[..., None]
    )
    dirs = jnp.broadcast_to(bundle.directions[..., None, :], pos.shape)
    dens, rgb = _field(params, cfg, pos, dirs)
    deltas = jnp.concatenate(
        [t_all[..., 1:] - t_all[..., :-1],
         jnp.full_like(t_all[..., :1], 1e10)], axis=-1,
    )[..., None]
    w = render_weights(dens, deltas)
    out_rgb = composite(w, rgb, background=jnp.zeros(3))
    depth = composite(w, t_all[..., None])
    acc = jnp.sum(w, axis=-2)
    return {
        "rgb": out_rgb,
        "depth": depth,
        "accumulation": acc,
        "rgb_coarse": composite(w_c, rgb_c, background=jnp.zeros(3)),
    }
