"""Trainer for the ray-marched (NeRF-family) models.

Role of the reference's VanillaPipeline + VanillaDataManager ray path
(/root/reference/nerfstudio/data/datamanagers/base_datamanager.py:364:
PixelSampler batches -> RayGenerator -> model(ray_bundle)): per step,
sample R random pixels across a random cached camera, generate rays,
render, loss against the ground-truth pixels. Shares the image cache and
parsers with the GS path.

Variant-specific behavior mirroring the reference's method set:
  - depth-nerfacto: masked depth L1 (models/depth_nerfacto.py)
  - instant-ngp:    an occupancy grid EMA-updated every
                    `grid_update_every` steps by probing the density field
                    at jittered cell centers (nerfacc's update loop,
                    models/instant_ngp.py get_training_callbacks)
  - neus/neus-facto: eikonal regularization (base_surface_model.py)
  - tensorf:        L1 sparsity on the density factors (models/tensorf.py)
  - semantic-nerfw: cross-entropy on composited semantic logits
                    (models/semantic_nerfw.py); labels come from the SAM
                    mask channel, invalid/out-of-range ids are masked out
  - dnerf:          per-frame `time` routed into the deformation field
  - phototourism:   per-image appearance embedding index = camera index
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.core.rays import generate_rays
from gaussiangrasper_tpu.data.manager import FullImageDatamanager
from gaussiangrasper_tpu.engine import checkpoint as ckpt
from gaussiangrasper_tpu.models import occupancy
from gaussiangrasper_tpu.models.nerf import NerfConfig, init_nerf, render_rays
from gaussiangrasper_tpu.models.tensorf_field import tensorf_l1_reg
from gaussiangrasper_tpu.utils.writer import MetricsWriter


@dataclasses.dataclass
class NerfTrainerConfig:
    data: Path = Path("data")
    output_dir: Path = Path("outputs")
    experiment_name: str = "nerfacto"
    max_iterations: int = 5000
    rays_per_batch: int = 1024
    pixel_sampler: str = "uniform"
    """"uniform", "patch" (patch-based losses) or "pair" (pair/ranking
    losses) — the reference's PixelSampler zoo (pixel_samplers.py:53,
    :291, :376)."""
    patch_size: int = 8
    pair_radius: int = 2
    lr: float = 5e-3
    depth_lambda: float = 0.0      # depth L1 weight (depth-nerfacto)
    eikonal_lambda: float = 0.1    # neus family
    semantic_lambda: float = 0.0   # semantic-nerfw
    tensorf_reg_lambda: float = 0.0
    interlevel_lambda: float = 1.0   # nerfacto proposal losses
    distortion_lambda: float = 0.002
    coarse_rgb_lambda: float = 0.1
    use_occupancy_grid: bool = False   # instant-ngp
    grid_resolution: int = 64
    grid_update_every: int = 16
    dynamic_batch: bool = False
    """Adapt rays/batch to target a constant live-sample count (the
    DynamicBatchPipeline analog, engine/dynamic_batch.py; pairs with
    use_occupancy_grid)."""
    target_num_samples: int = 1 << 18
    steps_per_save: int = 2000
    steps_per_log: int = 50
    seed: int = 42
    model: NerfConfig = dataclasses.field(default_factory=NerfConfig)

    @property
    def run_dir(self) -> Path:
        return Path(self.output_dir) / self.experiment_name


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def _nerf_step(params, opt_state, camera, coords, target, target_depth,
               target_sem, t_frame, app_idx, grid, key, cfg, tx_lr,
               weights):
    tx = optax.adam(tx_lr)

    def loss_fn(p):
        rb = generate_rays(camera, coords)
        out = render_rays(p, rb, key, cfg, grid=grid, times=t_frame,
                          appearance_idx=app_idx)
        mse = jnp.mean((out["rgb"] - target) ** 2)
        loss = mse + weights["coarse"] * jnp.mean(
            (out["rgb_coarse"] - target) ** 2
        )
        # masked depth L1 (the depth-nerfacto term, ref models/depth_nerfacto.py)
        dmask = (target_depth > 0.05).astype(mse.dtype)
        dl1 = jnp.sum(
            jnp.abs(out["depth"][..., 0] - target_depth) * dmask
        ) / jnp.maximum(jnp.sum(dmask), 1.0)
        loss = loss + weights["depth"] * dl1
        if "eikonal" in out:
            loss = loss + weights["eikonal"] * jnp.mean(out["eikonal"])
        if "interlevel" in out:
            # nerfacto proposal losses (ref models/nerfacto.py
            # get_loss_dict: interlevel 1.0, distortion 0.002)
            loss = loss + weights["interlevel"] * jnp.mean(out["interlevel"])
            loss = loss + weights["distortion"] * jnp.mean(out["distortion"])
        if "semantics" in out and cfg.num_semantic_classes:
            c = cfg.num_semantic_classes
            valid = ((target_sem >= 0) & (target_sem < c)).astype(mse.dtype)
            logp = jax.nn.log_softmax(out["semantics"])
            lbl = jnp.clip(target_sem, 0, c - 1)
            ce = -jnp.take_along_axis(logp, lbl[..., None], -1)[..., 0]
            loss = loss + weights["semantic"] * (
                jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            )
        if cfg.field == "tensorf":
            loss = loss + weights["tensorf_reg"] * tensorf_l1_reg(p)
        return loss, (out, mse)

    (_, (out, mse)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    metrics = {"loss": mse, "psnr": psnr}
    if "num_live_samples" in out:
        metrics["num_samples"] = out["num_live_samples"]
    return params, opt_state, metrics


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _grid_update(grid, params, key, cfg):
    """Probe the density field at one jittered point per cell and EMA-merge
    (nerfacc's every-N-steps occupancy update)."""
    res = grid.resolution
    ii = jnp.arange(res)
    cells = jnp.stack(jnp.meshgrid(ii, ii, ii, indexing="ij"), -1).reshape(-1, 3)
    u = (cells.astype(jnp.float32) + jax.random.uniform(key, cells.shape)) / res
    lo, hi = grid.aabb[0], grid.aabb[1]
    pos = lo + u * (hi - lo)
    # density only; direction is irrelevant to it for every field here
    from gaussiangrasper_tpu.models.nerf import _field

    dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), pos.shape)
    dens, _, _ = _field(params, cfg, pos, dirs)
    return occupancy.update_grid(grid, pos, dens[..., 0])


class NerfTrainer:
    def __init__(self, config: NerfTrainerConfig, dm: FullImageDatamanager):
        self.config = config
        self.dm = dm
        self.params = None
        self.opt_state = None
        self.grid = None
        self.key = jax.random.PRNGKey(config.seed)
        # dnerf: per-frame times from the parser (metadata["times"]) or a
        # uniform ramp over the capture order
        meta = dm.outputs.metadata
        n = len(dm)
        if config.model.deformation:
            self.times = np.asarray(
                meta.get("times", np.linspace(0.0, 1.0, max(n, 2))[:n]),
                np.float32,
            )
        else:
            self.times = np.zeros(n, np.float32)

    def setup(self):
        self.key, sub = jax.random.split(self.key)
        self.params = init_nerf(sub, self.config.model)
        self.opt_state = optax.adam(self.config.lr).init(self.params)
        self.rng = np.random.default_rng(self.config.seed)
        if self.config.use_occupancy_grid:
            s = self.config.model.scene_scale
            self.grid = occupancy.init_grid(
                [[-s, -s, -s], [s, s, s]], resolution=self.config.grid_resolution
            )
        return self.params

    def _weights(self):
        c = self.config
        m = c.model
        return {
            "depth": jnp.asarray(c.depth_lambda),
            "eikonal": jnp.asarray(
                c.eikonal_lambda if m.field in ("neus", "neus-facto") else 0.0
            ),
            "semantic": jnp.asarray(c.semantic_lambda),
            "tensorf_reg": jnp.asarray(c.tensorf_reg_lambda),
            "coarse": jnp.asarray(c.coarse_rgb_lambda),
            "interlevel": jnp.asarray(c.interlevel_lambda),
            "distortion": jnp.asarray(c.distortion_lambda),
        }

    def train(self):
        cfg = self.config
        writer = MetricsWriter(steps_per_log=cfg.steps_per_log,
                               max_steps=cfg.max_iterations)
        n = len(self.dm)
        weights = self._weights()
        from gaussiangrasper_tpu.data.pixel_samplers import make_pixel_sampler

        sampler = make_pixel_sampler(
            cfg.pixel_sampler, cfg.rays_per_batch,
            patch_size=cfg.patch_size, pair_radius=cfg.pair_radius,
        )
        sizer = None
        if cfg.dynamic_batch:
            from gaussiangrasper_tpu.engine.dynamic_batch import (
                DynamicBatchSizer,
            )

            sizer = DynamicBatchSizer(
                target_num_samples=cfg.target_num_samples,
                max_num_samples_per_ray=cfg.model.num_coarse + cfg.model.num_fine,
            )
        for step in range(cfg.max_iterations):
            if sizer is not None and sizer.num_rays != sampler.rays_per_batch:
                sampler = make_pixel_sampler(
                    cfg.pixel_sampler, sizer.num_rays,
                    patch_size=cfg.patch_size, pair_radius=cfg.pair_radius,
                )
            idx = int(self.rng.integers(0, n))
            cam, batch = self.dm.get_batch(idx)
            img = batch["image"]
            pix = sampler.sample(self.rng, cam.height, cam.width)
            ys, xs = jnp.asarray(pix[:, 0]), jnp.asarray(pix[:, 1])
            coords = jnp.stack([ys, xs], -1)
            target = img[ys, xs]
            target_depth = batch["depth"][ys, xs]
            sam = batch.get("sam_mask")
            target_sem = (
                sam[ys, xs] if sam is not None
                else jnp.full((ys.shape[0],), -1, jnp.int32)
            )
            if (
                self.grid is not None
                and step % cfg.grid_update_every == 0
            ):
                self.key, sub = jax.random.split(self.key)
                self.grid = _grid_update(self.grid, self.params, sub, cfg.model)
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, metrics = _nerf_step(
                self.params, self.opt_state, cam, coords, target,
                target_depth, target_sem, jnp.asarray(self.times[idx]),
                jnp.asarray(idx % max(cfg.model.num_appearance_embeds, 1)),
                self.grid, sub, cfg.model, cfg.lr, weights,
            )
            if sizer is not None:
                measured = metrics.get("num_samples")
                if measured is None:  # dense renderer: every sample lives
                    measured = ys.shape[0] * (
                        cfg.model.num_coarse + cfg.model.num_fine
                    )
                sizer.update(int(measured))
                metrics["num_rays_per_batch"] = jnp.asarray(
                    sampler.rays_per_batch
                )
            writer.step(step, metrics, pixels=int(ys.shape[0]))
            if (step + 1) % cfg.steps_per_save == 0 or step + 1 == cfg.max_iterations:
                path = self._save(step + 1)
                print(f"saved {path}")
        return self.params

    def _save(self, step):
        state = {"params": self.params, "opt_state": self.opt_state}
        import orbax.checkpoint as ocp

        path = (cfg_dir := self.config.run_dir / "checkpoints") / ckpt.STEP_FMT.format(step)
        cfg_dir.mkdir(parents=True, exist_ok=True)
        with ocp.StandardCheckpointer() as c:
            c.save(path.absolute(), state, force=True)
        return path

    def render_image(self, camera: Camera, chunk: int = 4096,
                     time_value: float = 0.0):
        """Full-image eval render in ray chunks (the reference's
        get_outputs_for_camera_ray_bundle chunked eval)."""
        rb = generate_rays(camera)
        flat = jax.tree.map(lambda l: l.reshape(-1, l.shape[-1]), rb)
        total = flat.origins.shape[0]
        outs = []
        key = jax.random.PRNGKey(0)
        t = jnp.asarray(time_value)
        for i in range(0, total, chunk):
            sl = jax.tree.map(lambda l: l[i : i + chunk], flat)
            outs.append(
                render_rays(self.params, sl, key, self.config.model,
                            grid=self.grid, times=t)["rgb"]
            )
        return jnp.concatenate(outs).reshape(camera.height, camera.width, 3)
