"""Trainer for the ray-marched (NeRF-family) models.

Role of the reference's VanillaPipeline + VanillaDataManager ray path
(/root/reference/nerfstudio/data/datamanagers/base_datamanager.py:364:
PixelSampler batches -> RayGenerator -> model(ray_bundle)): per step,
sample R random pixels across a random cached camera, generate rays,
render, L2 against the ground-truth pixels. Shares the image cache and
parsers with the GS path.
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
from gaussiangrasper_tpu.models.nerf import NerfConfig, init_nerf, render_rays
from gaussiangrasper_tpu.utils.writer import MetricsWriter


@dataclasses.dataclass
class NerfTrainerConfig:
    data: Path = Path("data")
    output_dir: Path = Path("outputs")
    experiment_name: str = "nerfacto"
    max_iterations: int = 5000
    rays_per_batch: int = 1024
    lr: float = 5e-3
    depth_lambda: float = 0.0  # depth L1 weight (depth-nerfacto variant)
    steps_per_save: int = 2000
    steps_per_log: int = 50
    seed: int = 42
    model: NerfConfig = dataclasses.field(default_factory=NerfConfig)

    @property
    def run_dir(self) -> Path:
        return Path(self.output_dir) / self.experiment_name


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def _nerf_step(params, opt_state, camera, coords, target, target_depth,
               key, cfg, tx_lr, depth_lambda):
    tx = optax.adam(tx_lr)

    def loss_fn(p):
        rb = generate_rays(camera, coords)
        out = render_rays(p, rb, key, cfg)
        mse = jnp.mean((out["rgb"] - target) ** 2)
        # masked depth L1 (the depth-nerfacto term, ref models/depth_nerfacto.py)
        dmask = (target_depth > 0.05).astype(mse.dtype)
        dl1 = jnp.sum(
            jnp.abs(out["depth"][..., 0] - target_depth) * dmask
        ) / jnp.maximum(jnp.sum(dmask), 1.0)
        return mse + depth_lambda * dl1, (out, mse)

    (_, (out, mse)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    return params, opt_state, {"loss": mse, "psnr": psnr}


class NerfTrainer:
    def __init__(self, config: NerfTrainerConfig, dm: FullImageDatamanager):
        self.config = config
        self.dm = dm
        self.params = None
        self.opt_state = None
        self.key = jax.random.PRNGKey(config.seed)

    def setup(self):
        self.key, sub = jax.random.split(self.key)
        self.params = init_nerf(sub, self.config.model)
        self.opt_state = optax.adam(self.config.lr).init(self.params)
        self.rng = np.random.default_rng(self.config.seed)
        return self.params

    def train(self):
        cfg = self.config
        writer = MetricsWriter(steps_per_log=cfg.steps_per_log,
                               max_steps=cfg.max_iterations)
        n = len(self.dm)
        for step in range(cfg.max_iterations):
            idx = int(self.rng.integers(0, n))
            cam, batch = self.dm.get_batch(idx)
            img = batch["image"]
            ys = jnp.asarray(self.rng.integers(0, cam.height, cfg.rays_per_batch))
            xs = jnp.asarray(self.rng.integers(0, cam.width, cfg.rays_per_batch))
            coords = jnp.stack([ys, xs], -1)
            target = img[ys, xs]
            target_depth = batch["depth"][ys, xs]
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, metrics = _nerf_step(
                self.params, self.opt_state, cam, coords, target,
                target_depth, sub, cfg.model, cfg.lr, cfg.depth_lambda,
            )
            writer.step(step, metrics, pixels=cfg.rays_per_batch)
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

    def render_image(self, camera: Camera, chunk: int = 4096):
        """Full-image eval render in ray chunks (the reference's
        get_outputs_for_camera_ray_bundle chunked eval)."""
        rb = generate_rays(camera)
        flat = jax.tree.map(lambda l: l.reshape(-1, l.shape[-1]), rb)
        total = flat.origins.shape[0]
        outs = []
        key = jax.random.PRNGKey(0)
        for i in range(0, total, chunk):
            sl = jax.tree.map(lambda l: l[i : i + chunk], flat)
            outs.append(render_rays(self.params, sl, key, self.config.model)["rgb"])
        return jnp.concatenate(outs).reshape(camera.height, camera.width, 3)
