"""The language-embedded Gaussian-splatting model: render + losses.

Functional re-design of the reference `GaussianSplattingModel`
(/root/reference/nerfstudio/models/gaussian_splatting.py:231): model state
is a pure pytree {field: GaussianParams, fea_up: MLP params}; rendering and
loss are pure functions of (state, alive-mask, camera, batch, step).

Key TPU-first departures from the reference:
- ONE fused rasterization pass over 3+F+1+3 channels (rgb, latent feature,
  depth, normal) instead of four CUDA launches (ref :735-784).
- The screen-space gradient statistics that drive densification (the
  reference's `xys.retain_grad()` hack, :724) are obtained via an explicit
  zero-valued `probe` added to xys, so one backward yields both parameter
  grads and per-Gaussian dL/dxy.
- SAM-mask contrastive / distillation samples arrive as fixed-size index
  tensors from the data layer (the reference's dynamic `torch.unique` loops,
  :120-148, don't trace; the sampling distribution is preserved host-side).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussiangrasper_tpu.core import sh
from gaussiangrasper_tpu.core.cameras import Camera, view_matrix
from gaussiangrasper_tpu.core.transforms import quat_to_rotmat
from gaussiangrasper_tpu.models import losses
from gaussiangrasper_tpu.models.efd import mlp_apply
from gaussiangrasper_tpu.models.gaussian_field import GaussianParams
from gaussiangrasper_tpu.ops.projection import project_gaussians
from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig, rasterize_projected


@dataclasses.dataclass(frozen=True)
class GaussianSplatConfig:
    """Mirrors the reference `GaussianSplattingModelConfig` (ref :150-196)
    plus TPU rasterizer knobs."""

    warmup_length: int = 500
    refine_every: int = 100
    resolution_schedule: int = 250
    num_downscales: int = 1
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    reset_alpha_every: int = 30
    densify_grad_thresh: float = 0.0002
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    sh_degree_interval: int = 1000
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    random_init: bool = False
    ssim_lambda: float = 0.2
    stop_split_at: int = 15000
    sh_degree: int = 4
    max_gauss_ratio: float = 10.0
    feature_dim: int = 32
    clip_dim: int = 512
    depth_background: float = 10.0
    sky_alpha_reg: float = 0.0
    """Weight of an alpha penalty on masked-OUT pixels (beyond-reference
    extension, OFF by default = exact loss-set parity with ref
    get_loss_dict :841-933). The boundary mask marks rays that hit
    nothing; the reference leaves them entirely unsupervised, so
    floaters accumulate wherever no training view penalizes them — the
    dominant residual error of the r5 held-out evals (clipping ~1-2 dB
    of masked PSNR when they drift over object pixels,
    docs/ROUND_NOTES.md round 5). `reg * mean(alpha[~valid])` drives
    rendered opacity to zero exactly where the capture says there is
    free space. Suggested 0.1-0.5 for mask-gated captures."""
    pose_opt_mode: str = "off"
    """Camera pose optimization: "off" (the reference's GS default,
    ref gaussian_splatting.py:191), "SO3xR3", or "SE3"
    (ref cameras/camera_optimizers.py:40). When on, per-camera 6-dof
    deltas live in the train state's "camera_opt" optimizer group and are
    applied to the pose before every render (ref :640
    camera_optimizer.apply_to_camera)."""
    raster: RasterizeConfig = RasterizeConfig()

    @property
    def num_channels(self) -> int:
        return 3 + self.feature_dim + 1 + 3

    def background(self) -> jnp.ndarray:
        """Channel backgrounds: rgb 0, feature 0, depth 10, normal 0 (the
        values the reference passes at ref :745, :757, :769, :783)."""
        bg = jnp.zeros((self.num_channels,), jnp.float32)
        return bg.at[3 + self.feature_dim].set(self.depth_background)


def smallest_axis_normals(log_scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Per-Gaussian normal = rotation column of the smallest scale axis
    (ref :605-622 `get_smallest_axis`). Column selection is a one-hot
    contraction, not a take_along_axis: per-row gathers cost ~12 ns/row
    on this TPU regardless of width (measured 7 ms/step for the 600k-row
    take at the bench point, r4 hlo_stats) while the masked reduce over
    3 columns is pure VPU traffic."""
    R = quat_to_rotmat(quats)  # (N, 3, 3)
    idx = jnp.argmin(log_scales, axis=-1)  # (N,)
    onehot = jax.nn.one_hot(idx, 3, dtype=R.dtype)  # (N, 3)
    return jnp.einsum("nij,nj->ni", R, onehot)


def active_sh_degree(step: jax.Array | int, cfg: GaussianSplatConfig):
    return jnp.minimum(step // cfg.sh_degree_interval, cfg.sh_degree)


def render(
    field: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    step: jax.Array | int,
    cfg: GaussianSplatConfig,
    *,
    probe: Optional[jax.Array] = None,
    crop_mask: Optional[jax.Array] = None,
    pose_delta: Optional[jax.Array] = None,
    compositor: Optional[Any] = None,
) -> Dict[str, Any]:
    """Render rgb / feature / depth / normal maps for one camera.

    Returns dict with per-channel images plus projection byproducts needed
    by the densification statistics (radii, per-Gaussian screen positions).
    """
    F = cfg.feature_dim
    if pose_delta is not None and cfg.pose_opt_mode != "off":
        from gaussiangrasper_tpu.core.pose_opt import apply_pose_delta

        camera = camera.replace(
            camera_to_world=apply_pose_delta(
                camera.camera_to_world, pose_delta, cfg.pose_opt_mode
            )
        )
    vm = view_matrix(camera.camera_to_world)
    mask = alive if crop_mask is None else (alive & crop_mask)

    proj = project_gaussians(
        field.means,
        jnp.exp(field.log_scales),
        field.quats,
        vm,
        camera.fx,
        camera.fy,
        camera.cx,
        camera.cy,
        camera.width,
        camera.height,
        mask=mask,
    )
    if probe is not None:
        proj = proj._replace(xys=proj.xys + probe)

    # View-dependent colors (SH), degree scheduled by step (ref :726-731).
    # The reference detaches means for the view direction (ref :726) —
    # xyz receives no gradient through the SH basis.
    viewdirs = jax.lax.stop_gradient(field.means) - camera.origin[None, :]
    viewdirs = viewdirs / losses.safe_norm(viewdirs)
    n_deg = active_sh_degree(step, cfg)
    rgbs = jnp.clip(sh.eval_sh(n_deg, viewdirs, field.sh_coeffs) + 0.5, 0.0, 1.0)

    normals = smallest_axis_normals(field.log_scales, field.quats)

    colors = jnp.concatenate(
        [rgbs, field.features, proj.depths[:, None], normals], axis=-1
    )
    opac = jax.nn.sigmoid(field.opacity_logits)

    # `compositor` lets the parallel layer swap in the tile-sharded
    # composite (parallel/tile_shard.py) without duplicating the model
    # logic; the default is the single-device tile pipeline.
    composite = compositor if compositor is not None else rasterize_projected
    out = composite(
        proj,
        colors,
        opac,
        cfg.background(),
        camera.width,
        camera.height,
        cfg.raster,
    )
    img = out["image"]
    res = {
        "rgb": img[..., 0:3],
        "feature": img[..., 3 : 3 + F],
        "depth": img[..., 3 + F : 4 + F],
        "normal": img[..., 4 + F : 7 + F],
        "normal_vis": (img[..., 4 + F : 7 + F] + 1.0) / 2.0,
        "alpha": out["alpha"],
        "proj": proj,
        "bins": out["bins"],
    }
    return res


def feature_pca_vis(feature_map: jax.Array) -> jax.Array:
    """Project an (H, W, F) feature map to 3 channels via PCA for
    visualization (ref :788-795 uses torch.pca_lowrank)."""
    h, w, f = feature_map.shape
    flat = feature_map.reshape(-1, f)
    centered = flat - flat.mean(0, keepdims=True)
    cov = centered.T @ centered / flat.shape[0]
    _, vecs = jnp.linalg.eigh(cov)  # ascending
    basis = vecs[:, -3:][:, ::-1]
    proj = flat @ basis
    lo = jnp.percentile(proj, 2.0, axis=0)
    hi = jnp.percentile(proj, 98.0, axis=0)
    return jnp.clip((proj - lo) / (hi - lo + 1e-8), 0, 1).reshape(h, w, 3)


def train_loss(
    state: Dict[str, Any],
    alive: jax.Array,
    camera: Camera,
    batch: Dict[str, jax.Array],
    step: jax.Array | int,
    cfg: GaussianSplatConfig,
    probe: Optional[jax.Array] = None,
    compositor: Optional[Any] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Total training loss + aux outputs.

    Loss set and weights replicate ref get_loss_dict (:841-933); the trainer
    sums dict values, so we return the sum directly plus the dict.

    batch keys (all resized to the camera's current resolution host-side):
      image (H,W,3), depth (H,W), normal (H,W,3), valid_mask (H,W) bool,
      pair_a/pair_b (G,P,2) int32, pair_valid (G,P), group_valid (G,),
      points (S,2) int32, point_valid (S,), gt_clip (S,512).
    """
    field: GaussianParams = state["field"]
    pose_delta = None
    if state.get("pose") is not None and "cam_idx" in batch:
        pose_delta = state["pose"][batch["cam_idx"]]
    outs = render(
        field, alive, camera, step, cfg, probe=probe, pose_delta=pose_delta,
        compositor=compositor,
    )

    gt_img = batch["image"]
    valid = batch["valid_mask"]
    depth_gt = batch["depth"]
    depth_mask = (depth_gt > 0.05) & valid
    gt_normal = batch["normal"]
    gt_normal = gt_normal / losses.safe_norm(gt_normal)

    # --- RGB: masked L1 + SSIM on zeroed-invalid images (ref :882-885) ---
    rgb = outs["rgb"]
    l1 = losses.masked_l1(rgb, gt_img, valid)
    vm3 = valid[..., None].astype(rgb.dtype)
    sim = 1.0 - losses.ssim(gt_img * vm3, rgb * vm3)
    main_loss = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * sim

    # --- depth / normal (ref :879-880) ---
    depth_loss = losses.masked_l1(outs["depth"][..., 0], depth_gt, depth_mask)
    normal_l = losses.normal_loss(outs["normal"], gt_normal, depth_mask)

    # --- SAM contrastive + CLIP distillation (ref :907-918) ---
    # ONE fused pixel gather for pair_a + pair_b + distillation points:
    # each gather's backward scatter materializes a full (H*W, F) zero
    # buffer (~1.7 ms each at the bench point, r4 hlo_stats), so the
    # three gathers share one. NOTE (r5 measured): the backward of this
    # gather is a ~3.8 ms strided scatter into the channel-planar
    # gradient image; three reformulations (row-major barrier, explicit
    # planar gather, gathering from the pre-assembly (T, P, C) tile
    # tensor) all measured equal or worse — XLA pins the layout to the
    # planar d(image) consumer either way, and the tile-tensor route
    # added a dense (T, P, C) cotangent add. The simple form is the
    # measured optimum; docs/ROUND_NOTES.md round 5.
    fea = outs["feature"]
    pts = batch["points"]
    g, p_, _ = batch["pair_a"].shape
    idx = jnp.concatenate(
        [batch["pair_a"].reshape(-1, 2), batch["pair_b"].reshape(-1, 2),
         pts], axis=0,
    )
    feats = fea[idx[:, 0], idx[:, 1]]  # (2*G*P + S, F)
    fa = feats[: g * p_].reshape(g, p_, -1)
    fb = feats[g * p_ : 2 * g * p_].reshape(g, p_, -1)
    sampled = feats[2 * g * p_ :]  # (S, F)
    fea_loss = losses.contrastive_pairs_loss(
        fa, fb, batch["pair_valid"], batch["group_valid"]
    )
    lifted = mlp_apply(state["fea_up"], sampled)
    up_loss = losses.distillation_loss(lifted, batch["gt_clip"], batch["point_valid"])

    # --- every-10-step regularizers (ref :920-929) ---
    reg_on = (jnp.asarray(step) % 10 == 0).astype(rgb.dtype)
    sh_r = reg_on * losses.sh_reg(field.sh_coeffs, alive)
    scale_r = reg_on * losses.scale_reg(field.log_scales, alive, cfg.max_gauss_ratio)

    loss_dict = {
        "main_loss": main_loss,
        "feature_loss": fea_loss,
        "up_loss": up_loss,
        "depth_loss": depth_loss,
        "normal_loss": normal_l,
        "sh_reg": sh_r,
        "scale_reg": scale_r,
    }
    if cfg.sky_alpha_reg > 0.0:
        # opt-in floater suppression (see config docstring): rendered
        # alpha on masked-out (free-space) pixels is penalized to zero
        inv = 1.0 - valid.astype(rgb.dtype)
        loss_dict["sky_alpha_reg"] = cfg.sky_alpha_reg * (
            jnp.sum(outs["alpha"] * inv) / jnp.maximum(jnp.sum(inv), 1.0)
        )
    total = sum(loss_dict.values())
    bins = outs["bins"]
    # pair_overflow: pairs the static stream budget B clipped (pair-stream
    # backend only; None on the table/XLA paths, and absent on ShardedBins
    # where the band budget's clips surface as merge_overflow instead).
    # Emitting 0 in those cases keeps the metric always present so a
    # too-small pair_budget_per_tile is never silent in train metrics.
    pair_ovf = getattr(bins, "pair_overflow", None)
    if pair_ovf is None:
        pair_ovf = jnp.zeros((), jnp.int32)
    aux = {
        "loss_dict": loss_dict,
        "psnr": losses.psnr(rgb, gt_img, valid),
        "radii": outs["proj"].radii,
        "overflow": bins.overflow,
        "dropped_tiles": bins.dropped_tiles,
        "pair_overflow": pair_ovf,
        "alpha": outs["alpha"],
    }
    # Tile-sharded compositor stats (ShardedBins only): all-gather volume
    # and budget overflows, so the production writer can surface them
    # (VERDICT r3 #2 — gathered_rows/overflow must reach train metrics).
    for k in ("gathered_rows", "gather_overflow", "merge_overflow"):
        v = getattr(bins, k, None)
        if v is not None:
            aux[k] = v
    return total, aux


class GaussianSplatModel:
    """Thin namespace bundling config + pure functions (for API parity with
    the reference's Model class; all real work is in the functions above)."""

    def __init__(self, config: GaussianSplatConfig):
        self.config = config

    def render(self, field, alive, camera, step, **kw):
        return render(field, alive, camera, step, self.config, **kw)

    def train_loss(self, state, alive, camera, batch, step, **kw):
        return train_loss(state, alive, camera, batch, step, self.config, **kw)
