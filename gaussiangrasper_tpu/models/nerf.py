"""Ray-marched radiance-field models (the reference's NeRF-family zoo).

Role of the reference's models/ + fields/ directories (vanilla_nerf.py,
nerfacto.py, mipnerf.py, instant_ngp.py, tensorf.py, neus.py,
neus_facto.py, semantic_nerfw.py, dnerf via the temporal distortion,
phototourism via appearance embeddings). One render interface over
several fields:

  - "vanilla":    positional-encoded MLP, hierarchical sampling
                  (models/vanilla_nerf.py)
  - "nerfacto":   multires hash grid + small MLPs (models/nerfacto.py,
                  minus the tcnn fusion — see models/encodings.py)
  - "mipnerf":    integrated positional encoding over conical-frustum
                  Gaussians (models/mipnerf.py; math in models/mip.py)
  - "instant-ngp": hash grid + occupancy-grid empty-space skipping
                  (models/instant_ngp.py; grid in models/occupancy.py)
  - "tensorf":    VM-decomposed factor grids (models/tensorf.py;
                  field in models/tensorf_field.py)
  - "neus" / "neus-facto": SDF + logistic-CDF alphas (models/neus.py,
                  neus_facto.py; field in models/sdf_field.py)

Cross-cutting options mirroring the reference's model variants:
  - num_semantic_classes > 0 -> a semantic head over geometry features,
    composited with detached weights (models/semantic_nerfw.py)
  - num_appearance_embeds > 0 -> per-image appearance embeddings fed to
    the color head (phototourism / nerfacto's use_appearance_embedding)
  - deformation=True -> a time-conditioned deformation MLP warping
    samples into the canonical field (dnerf's DNeRFField temporal
    distortion, fields/density_fields / temporal_distortions.py)

Everything is pure pytree params + functions; the GS path shares the
Camera/ray primitives but none of this code.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

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
from gaussiangrasper_tpu.models import mip, occupancy, sdf_field, tensorf_field


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    field: str = "nerfacto"  # vanilla|nerfacto|mipnerf|instant-ngp|tensorf|neus|neus-facto
    near: float = 0.05
    far: float = 6.0
    num_coarse: int = 64
    num_fine: int = 64                 # pdf-resampled / second pass
    pos_freqs: int = 10
    dir_freqs: int = 4
    hidden: int = 128
    hash_levels: int = 12
    hash_features: int = 2
    log2_hashmap_size: int = 17
    scene_scale: float = 2.0           # positions mapped to [0,1] by /(2*scale)+0.5
    # tensorf
    tensorf_resolution: int = 128
    tensorf_density_components: int = 8
    tensorf_appearance_components: int = 24
    # variants
    num_semantic_classes: int = 0      # semantic-nerfw head
    num_appearance_embeds: int = 0     # phototourism per-image embeddings
    appearance_embed_dim: int = 16
    deformation: bool = False          # dnerf time-warp
    time_freqs: int = 4
    deform_freqs: int = 6
    # proposal-network sampling (the real nerfacto sampler: 2 density-only
    # proposal fields + pdf refinement, ref models/nerfacto.py +
    # ProposalNetworkSampler, model_components/ray_samplers.py)
    use_proposal: bool = False
    num_proposal_samples: Tuple[int, ...] = (128, 64)
    proposal_hash_levels: int = 5
    proposal_log2_hashmap_size: int = 15


def _geo_dim(cfg: NerfConfig) -> int:
    """Width of the geometry features each field hands to extra heads."""
    if cfg.field in ("vanilla", "mipnerf"):
        return cfg.hidden
    if cfg.field in ("nerfacto", "instant-ngp"):
        return 15
    return 0  # tensorf / sdf fields expose no shared geo features


def init_nerf(key: jax.Array, cfg: NerfConfig) -> Dict:
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    app = cfg.appearance_embed_dim if cfg.num_appearance_embeds else 0
    if cfg.field == "vanilla":
        in_dim = 3 + 6 * cfg.pos_freqs
        dir_dim = 3 + 6 * cfg.dir_freqs
        params = {
            "density_mlp": init_mlp(k1, in_dim, cfg.hidden + 1,
                                    (cfg.hidden, cfg.hidden, cfg.hidden)),
            "color_mlp": init_mlp(k2, cfg.hidden + dir_dim + app, 3,
                                  (cfg.hidden // 2,)),
        }
    elif cfg.field == "mipnerf":
        # single MLP shared by coarse+fine passes (the mip-NeRF design,
        # ref models/mipnerf.py) over IPE features (no raw-input term)
        in_dim = 6 * cfg.pos_freqs
        dir_dim = 3 + 6 * cfg.dir_freqs
        params = {
            "density_mlp": init_mlp(k1, in_dim, cfg.hidden + 1,
                                    (cfg.hidden, cfg.hidden, cfg.hidden)),
            "color_mlp": init_mlp(k2, cfg.hidden + dir_dim + app, 3,
                                  (cfg.hidden // 2,)),
        }
    elif cfg.field in ("nerfacto", "instant-ngp"):
        grid = init_hash_grid(
            k1, num_levels=cfg.hash_levels, features_per_level=cfg.hash_features,
            log2_hashmap_size=cfg.log2_hashmap_size,
        )
        enc_dim = cfg.hash_levels * cfg.hash_features
        params = {
            "grid": grid,
            # density head: 1 density + 15 geo features
            "density_mlp": init_mlp(k2, enc_dim, 16, (64,)),
            # color head: sh-deg3 dirs minus DC (15) + geo (15) (+ appearance)
            "color_mlp": init_mlp(k3, 15 + 15 + app, 3, (64,)),
        }
    elif cfg.field == "tensorf":
        params = init_tensorf_params(k1, cfg)
    elif cfg.field in ("neus", "neus-facto"):
        params = sdf_field.init_sdf_field(k1, variant=cfg.field)
    else:
        raise ValueError(f"unknown field {cfg.field!r}")

    if cfg.num_semantic_classes:
        if _geo_dim(cfg) == 0:
            raise ValueError(
                f"field {cfg.field!r} exposes no geometry features; the "
                "semantic head (semantic-nerfw) needs a vanilla/mipnerf/"
                "nerfacto/instant-ngp field"
            )
        params["semantic_mlp"] = init_mlp(
            k4, _geo_dim(cfg), cfg.num_semantic_classes, (64,)
        )
    if cfg.num_appearance_embeds:
        params["appearance"] = 0.1 * jax.random.normal(
            k5, (cfg.num_appearance_embeds, cfg.appearance_embed_dim)
        )
    if cfg.use_proposal:
        for i in range(len(cfg.num_proposal_samples)):
            kp = jax.random.fold_in(k7, i)
            ka, kb = jax.random.split(kp)
            params[f"proposal_{i}"] = {
                "grid": init_hash_grid(
                    ka, num_levels=cfg.proposal_hash_levels,
                    features_per_level=2,
                    log2_hashmap_size=cfg.proposal_log2_hashmap_size,
                    max_res=256,
                ),
                "density_mlp": init_mlp(
                    kb, cfg.proposal_hash_levels * 2, 1, (16,)
                ),
            }
    if cfg.deformation:
        in_dim = (3 + 6 * cfg.deform_freqs) + (1 + 2 * cfg.time_freqs)
        dmlp = init_mlp(k6, in_dim, 3, (64, 64))
        # zero the last layer: identity warp at init (the DNeRF convention)
        last = len(dmlp) // 2 - 1
        dmlp[f"w{last}"] = jnp.zeros_like(dmlp[f"w{last}"])
        dmlp[f"b{last}"] = jnp.zeros_like(dmlp[f"b{last}"])
        params["deform_mlp"] = dmlp
    return params


def init_tensorf_params(key: jax.Array, cfg: NerfConfig) -> Dict:
    return tensorf_field.init_tensorf(
        key,
        resolution=cfg.tensorf_resolution,
        density_components=cfg.tensorf_density_components,
        appearance_components=cfg.tensorf_appearance_components,
    )


def _deform(params: Dict, cfg: NerfConfig, positions, times):
    """dnerf temporal warp: x_canonical = x + MLP(PE(x), PE(t))."""
    if not cfg.deformation or "deform_mlp" not in params:
        return positions
    t = jnp.broadcast_to(jnp.asarray(times, positions.dtype), positions.shape[:-1])
    t_enc = positional_encoding(t[..., None], cfg.time_freqs)
    x_enc = positional_encoding(positions, cfg.deform_freqs)
    delta = mlp_apply(params["deform_mlp"], jnp.concatenate([x_enc, t_enc], -1))
    return positions + delta


def _field(
    params: Dict,
    cfg: NerfConfig,
    positions,
    directions,
    appearance=None,
    ipe_cov=None,
):
    """(density (..., 1), rgb (..., 3), geo features (..., G))."""
    if cfg.field == "tensorf":
        x01 = jnp.clip(positions / (2 * cfg.scene_scale) + 0.5, 0.0, 1.0)
        density = tensorf_field.tensorf_density(params, x01)
        rgb = tensorf_field.tensorf_rgb(params, x01, directions)
        return density, rgb, jnp.zeros(positions.shape[:-1] + (0,))
    if cfg.field in ("nerfacto", "instant-ngp"):
        x01 = jnp.clip(positions / (2 * cfg.scene_scale) + 0.5, 0.0, 1.0)
        enc = hash_grid_encode(params["grid"], x01)
        h = mlp_apply(params["density_mlp"], enc)
        density = jax.nn.softplus(h[..., :1] - 1.0)
        geo = h[..., 1:]
        d_enc = sh_encoding(directions, degree=3)[..., 1:]  # drop DC: 15 dims
        inputs = [d_enc, geo]
        if appearance is not None:
            inputs.append(jnp.broadcast_to(appearance, geo.shape[:-1] + appearance.shape[-1:]))
        rgb = jax.nn.sigmoid(
            mlp_apply(params["color_mlp"], jnp.concatenate(inputs, -1))
        )
        return density, rgb, geo
    # vanilla / mipnerf MLP fields
    if cfg.field == "mipnerf":
        enc = mip.integrated_pos_enc(positions, ipe_cov, cfg.pos_freqs)
    else:
        enc = positional_encoding(positions, cfg.pos_freqs)
    h = mlp_apply(params["density_mlp"], enc)
    density = jax.nn.softplus(h[..., :1] - 1.0)
    geo = h[..., 1:]
    d_enc = positional_encoding(directions, cfg.dir_freqs)
    inputs = [geo, d_enc]
    if appearance is not None:
        inputs.append(jnp.broadcast_to(appearance, geo.shape[:-1] + appearance.shape[-1:]))
    rgb = jax.nn.sigmoid(
        mlp_apply(params["color_mlp"], jnp.concatenate(inputs, -1))
    )
    return density, rgb, geo


def _semantics(params: Dict, cfg: NerfConfig, geo, weights):
    """Composite semantic logits with gradient-detached weights (the
    semantic-nerfw trick, ref models/semantic_nerfw.py get_outputs)."""
    if not cfg.num_semantic_classes or "semantic_mlp" not in params:
        return None
    logits = mlp_apply(params["semantic_mlp"], geo)
    return jnp.sum(jax.lax.stop_gradient(weights) * logits, axis=-2)


def _appearance_vec(params, cfg, appearance_idx):
    if cfg.num_appearance_embeds and "appearance" in params:
        idx = 0 if appearance_idx is None else appearance_idx
        return params["appearance"][idx]
    return None


def render_rays(
    params: Dict,
    bundle: RayBundle,
    key: jax.Array,
    cfg: NerfConfig,
    grid: Optional[occupancy.OccupancyGrid] = None,
    times: Optional[jax.Array] = None,
    appearance_idx: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Render a ray bundle under the configured field. Optional inputs:
    `grid` (instant-ngp occupancy), `times` (dnerf), `appearance_idx`
    (phototourism per-image embedding row)."""
    if cfg.field == "mipnerf":
        return _render_mipnerf(params, bundle, key, cfg, appearance_idx)
    if cfg.field in ("neus", "neus-facto"):
        return _render_neus(params, bundle, key, cfg)
    if cfg.field == "instant-ngp":
        return _render_ingp(params, bundle, key, cfg, grid, appearance_idx)
    if cfg.use_proposal:
        return _render_proposal(params, bundle, key, cfg, times, appearance_idx)
    return _render_hierarchical(params, bundle, key, cfg, times, appearance_idx)


def _proposal_density(params: Dict, cfg: NerfConfig, positions) -> jax.Array:
    """Density-only proposal field (small hash grid + linear head)."""
    x01 = jnp.clip(positions / (2 * cfg.scene_scale) + 0.5, 0.0, 1.0)
    enc = hash_grid_encode(params["grid"], x01)
    return jax.nn.softplus(mlp_apply(params["density_mlp"], enc) - 1.0)


def _render_proposal(params, bundle, key, cfg, times, appearance_idx):
    """The real nerfacto sampler: density-only proposal fields refine the
    sample distribution before the main field runs once (ref
    models/nerfacto.py + ProposalNetworkSampler); emits the interlevel and
    distortion losses (ref nerfacto get_loss_dict, weights 1.0 / 0.002)."""
    from gaussiangrasper_tpu.models import proposal as prop_mod

    app = _appearance_vec(params, cfg, appearance_idx)
    shape = bundle.origins.shape[:-1]

    def edges_to_weights(level_params, edges, density_fn):
        mids = 0.5 * (edges[..., 1:] + edges[..., :-1])
        pos = (
            bundle.origins[..., None, :]
            + bundle.directions[..., None, :] * mids[..., None]
        )
        if cfg.deformation:
            pos = _deform(params, cfg, pos, times)
        dens = density_fn(level_params, pos)
        deltas = (edges[..., 1:] - edges[..., :-1])[..., None]
        return render_weights(dens, deltas)[..., 0], pos, mids

    # stratified initial edges
    n0 = cfg.num_proposal_samples[0]
    t = jnp.linspace(0.0, 1.0, n0 + 1)
    edges = jnp.broadcast_to(cfg.near + (cfg.far - cfg.near) * t, shape + (n0 + 1,))
    key, sub = jax.random.split(key)
    jitter = (jax.random.uniform(sub, shape + (n0 - 1,)) - 0.5) / n0
    interior = edges[..., 1:-1] + jitter * (cfg.far - cfg.near)
    edges = jnp.concatenate([edges[..., :1], interior, edges[..., -1:]], -1)

    hists = []
    counts = list(cfg.num_proposal_samples[1:]) + [cfg.num_fine]
    for i, n_next in enumerate(counts):
        w, _, _ = edges_to_weights(
            params[f"proposal_{i}"], edges,
            lambda p, x: _proposal_density(p, cfg, x),
        )
        hists.append((edges, w))
        key, sub = jax.random.split(key)
        t_next = sample_pdf(edges, w, n_next + 1, sub)
        edges = jnp.sort(t_next, axis=-1)

    # main field on the final intervals
    mids = 0.5 * (edges[..., 1:] + edges[..., :-1])
    pos = (
        bundle.origins[..., None, :]
        + bundle.directions[..., None, :] * mids[..., None]
    )
    if cfg.deformation:
        pos = _deform(params, cfg, pos, times)
    dirs = jnp.broadcast_to(bundle.directions[..., None, :], pos.shape)
    dens, rgb, geo = _field(params, cfg, pos, dirs, app)
    deltas = (edges[..., 1:] - edges[..., :-1])[..., None]
    w = render_weights(dens, deltas)

    out = {
        "rgb": composite(w, rgb, background=jnp.zeros(3)),
        "depth": composite(w, mids[..., None]),
        "accumulation": jnp.sum(w, axis=-2),
        "rgb_coarse": composite(w, rgb, background=jnp.zeros(3)),
        "interlevel": prop_mod.interlevel_loss(hists, edges, w[..., 0])[None],
        "distortion": prop_mod.distortion_loss(
            edges, w[..., 0], cfg.near, cfg.far
        )[None],
    }
    sem = _semantics(params, cfg, geo, w)
    if sem is not None:
        out["semantics"] = sem
    return out


def _render_hierarchical(params, bundle, key, cfg, times, appearance_idx):
    """Uniform coarse pass + inverse-CDF fine pass (the reference
    VanillaPipeline's NeRF path: ray_samplers + renderers)."""
    k1, k2 = jax.random.split(key)
    app = _appearance_vec(params, cfg, appearance_idx)
    coarse = sample_along_rays(bundle, cfg.near, cfg.far, cfg.num_coarse, k1)
    pos_c = _deform(params, cfg, coarse.positions, times) if cfg.deformation else coarse.positions
    dens_c, rgb_c, _ = _field(params, cfg, pos_c, coarse.directions, app)
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
    if cfg.deformation:
        pos = _deform(params, cfg, pos, times)
    dirs = jnp.broadcast_to(bundle.directions[..., None, :], pos.shape)
    dens, rgb, geo = _field(params, cfg, pos, dirs, app)
    deltas = jnp.concatenate(
        [t_all[..., 1:] - t_all[..., :-1],
         jnp.full_like(t_all[..., :1], 1e10)], axis=-1,
    )[..., None]
    w = render_weights(dens, deltas)
    out = {
        "rgb": composite(w, rgb, background=jnp.zeros(3)),
        "depth": composite(w, t_all[..., None]),
        "accumulation": jnp.sum(w, axis=-2),
        "rgb_coarse": composite(w_c, rgb_c, background=jnp.zeros(3)),
    }
    sem = _semantics(params, cfg, geo, w)
    if sem is not None:
        out["semantics"] = sem
    return out


def _render_mipnerf(params, bundle, key, cfg, appearance_idx):
    """Two-level cone rendering with a single shared MLP
    (ref models/mipnerf.py get_outputs)."""
    k1, k2 = jax.random.split(key)
    app = _appearance_vec(params, cfg, appearance_idx)
    radius = mip.pixel_radius(bundle.pixel_area)
    shape = bundle.origins.shape[:-1]

    # stratified coarse edges
    t = jnp.linspace(0.0, 1.0, cfg.num_coarse + 1)
    edges = cfg.near + (cfg.far - cfg.near) * t
    edges = jnp.broadcast_to(edges, shape + (cfg.num_coarse + 1,))
    # jitter interior boundaries, keep near/far fixed (stratified edges)
    jitter = jax.random.uniform(k1, shape + (cfg.num_coarse - 1,)) - 0.5
    widths = jnp.diff(edges, axis=-1)
    interior = edges[..., 1:-1] + jitter * jnp.minimum(
        widths[..., :-1], widths[..., 1:]
    )
    edges = jnp.concatenate([edges[..., :1], interior, edges[..., -1:]], axis=-1)

    def level(level_edges):
        starts, ends = level_edges[..., :-1], level_edges[..., 1:]
        means, cov = mip.conical_frustum_to_gaussian(
            bundle.origins, bundle.directions, starts, ends, radius
        )
        dirs = jnp.broadcast_to(bundle.directions[..., None, :], means.shape)
        dens, rgb, _ = _field(params, cfg, means, dirs, app, ipe_cov=cov)
        w = render_weights(dens, (ends - starts)[..., None])
        mids = 0.5 * (starts + ends)
        return w, rgb, mids

    w_c, rgb_c, _ = level(edges)
    t_fine = sample_pdf(edges, w_c[..., 0], cfg.num_fine + 1, k2)
    fine_edges = jnp.sort(t_fine, axis=-1)
    w, rgb, mids = level(fine_edges)
    return {
        "rgb": composite(w, rgb, background=jnp.zeros(3)),
        "depth": composite(w, mids[..., None]),
        "accumulation": jnp.sum(w, axis=-2),
        "rgb_coarse": composite(w_c, rgb_c, background=jnp.zeros(3)),
    }


def _render_ingp(params, bundle, key, cfg, grid, appearance_idx):
    """Single dense pass with occupancy masking (ref models/instant_ngp.py
    + nerfacc's VolumetricSampler; static-shape skipping per
    models/occupancy.py)."""
    app = _appearance_vec(params, cfg, appearance_idx)
    n = cfg.num_coarse + cfg.num_fine
    samples = sample_along_rays(bundle, cfg.near, cfg.far, n, key)
    dens, rgb, geo = _field(params, cfg, samples.positions, samples.directions, app)
    num_live = jnp.asarray(samples.positions.shape[0] * samples.positions.shape[1])
    if grid is not None:
        dens = occupancy.masked_densities(grid, samples.positions, dens)
        # live-sample count for dynamic batch sizing (the reference's
        # num_samples_per_batch metric, ref models/instant_ngp.py
        # get_metrics_dict; here the static-shape analog counts samples in
        # occupied cells)
        num_live = jnp.sum(
            occupancy.occupancy_mask(grid, samples.positions), dtype=jnp.int32
        )
    w = render_weights(dens, samples.deltas)
    mids = 0.5 * (samples.starts + samples.ends)
    out = {
        "rgb": composite(w, rgb, background=jnp.zeros(3)),
        "depth": composite(w, mids),
        "accumulation": jnp.sum(w, axis=-2),
        "rgb_coarse": composite(w, rgb, background=jnp.zeros(3)),
        "num_live_samples": num_live,
    }
    sem = _semantics(params, cfg, geo, w)
    if sem is not None:
        out["semantics"] = sem
    return out


def _render_neus(params, bundle, key, cfg):
    """SDF rendering with the NeuS alpha estimator; emits normals and the
    eikonal residual for the loss (ref models/neus.py get_outputs +
    base_surface_model.py get_loss_dict)."""
    n = cfg.num_coarse + cfg.num_fine
    samples = sample_along_rays(bundle, cfg.near, cfg.far, n, key)
    sdf, geo = sdf_field.sdf_and_features(
        params, samples.positions, cfg.scene_scale
    )
    grad = sdf_field.sdf_gradient(params, samples.positions, cfg.scene_scale)
    inv_std = jnp.exp(10.0 * params["s"])
    alphas = sdf_field.neus_alphas(
        sdf, grad, samples.directions, samples.deltas, inv_std
    )
    w = sdf_field.alphas_to_weights(alphas)
    normals = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-6
    )
    rgb = sdf_field.sdf_rgb(
        params, samples.positions, samples.directions, normals, geo
    )
    mids = 0.5 * (samples.starts + samples.ends)
    return {
        "rgb": composite(w, rgb, background=jnp.zeros(3)),
        "depth": composite(w, mids),
        "accumulation": jnp.sum(w, axis=-2),
        "normal": composite(w, normals),
        "eikonal": jnp.mean(
            (jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2, axis=-1, keepdims=True
        ),
        "rgb_coarse": composite(w, rgb, background=jnp.zeros(3)),
    }
