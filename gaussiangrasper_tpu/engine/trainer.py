"""Host training loop.

Role of the reference Trainer (/root/reference/nerfstudio/engine/
trainer.py:139-498): setup (data, model init from seeds, optimizers),
the 30k-step loop with BEFORE/AFTER callbacks, refinement every 100 steps,
checkpoint every 2000, metric logging, and the coarse-to-fine resolution
schedule (gaussian_splatting.py:599-603). All device work is two jitted
functions (train_step / refine_step); everything here is orchestration.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.data.manager import FullImageDatamanager, SamplerConfig
from gaussiangrasper_tpu.engine import checkpoint as ckpt
from gaussiangrasper_tpu.engine.train_state import (
    TrainState,
    init_train_state,
    refine_step,
    train_step,
)
from gaussiangrasper_tpu.models.efd import init_mlp
from gaussiangrasper_tpu.models.gaussian_field import init_from_seeds, init_random
from gaussiangrasper_tpu.models.model import GaussianSplatConfig
from gaussiangrasper_tpu.utils.writer import MetricsWriter


@dataclasses.dataclass
class TrainerConfig:
    """Mirrors the reference gaussian-splatting TrainerConfig surface
    (method_configs.py:603-668) minus torch-isms."""

    data: Path = Path("data")
    output_dir: Path = Path("outputs")
    experiment_name: str = "gaussian-splatting"
    max_iterations: int = 30000
    steps_per_save: int = 2000
    steps_per_log: int = 10
    steps_per_eval_image: int = 100
    seed: int = 42
    capacity_multiplier: float = 8.0
    """Field capacity = multiplier x seed count (densification headroom)."""
    capacity: Optional[int] = None
    random_init_points: int = 50000
    tensorboard: bool = False
    vis: str = ""
    """Extra metric backends, '+'-separated (the reference's --vis modes,
    utils/writer.py:306-407): any of tensorboard, wandb, comet. Backends
    whose library is missing degrade silently."""
    prefetch: bool = True
    """Overlap host-side batch prep (sampling/IO) with device compute."""
    viewer_port: Optional[int] = None
    """Serve the live training viewer on this port (ref viewer_beta)."""
    load_dir: Optional[Path] = None
    profiler: str = "none"
    """'trace' captures an XLA device trace (xplane, TensorBoard/Perfetto
    viewable) for steps 12..16 into <run_dir>/profiler_traces — the
    reference's LoggingConfig.profiler='pytorch' chrome-trace capture at
    steps 12/17 (ref utils/profiler.py:149-196)."""
    dataparser: str = "auto"
    """Named dataparser from data/dataparsers/zoo.py (the reference's
    15-parser CLI registry, dataparser_configs.py); auto-detects by layout."""
    model: GaussianSplatConfig = dataclasses.field(default_factory=GaussianSplatConfig)

    @property
    def run_dir(self) -> Path:
        return Path(self.output_dir) / self.experiment_name

    @property
    def ckpt_dir(self) -> Path:
        return self.run_dir / "checkpoints"


def _downscale_factor(cfg: GaussianSplatConfig, step: int) -> int:
    """2^max(num_downscales - step // resolution_schedule, 0) (ref :599-603)."""
    return 2 ** max(cfg.num_downscales - step // cfg.resolution_schedule, 0)


def downscale_batch(batch: Dict, cam: Camera, d: int) -> Tuple[Camera, Dict]:
    """Host-side coarse-to-fine: shrink images by 2^k and rescale the
    sampled pixel indices into the shrunken frame."""
    if d == 1:
        return cam, batch
    import cv2

    def shrink(a, interp=cv2.INTER_LINEAR):
        a = np.asarray(a)
        out = cv2.resize(
            a.astype(np.float32), (a.shape[1] // d, a.shape[0] // d),
            interpolation=interp,
        )
        return out

    h2, w2 = np.asarray(batch["image"]).shape[0] // d, np.asarray(batch["image"]).shape[1] // d
    out = dict(batch)
    # interpolation modes match the reference (get_loss_dict :850-867):
    # bilinear for image/depth/normal, nearest for masks
    out["image"] = jnp.asarray(shrink(batch["image"]))
    out["depth"] = jnp.asarray(shrink(batch["depth"]))
    out["normal"] = jnp.asarray(shrink(batch["normal"]))
    out["valid_mask"] = jnp.asarray(
        shrink(np.asarray(batch["valid_mask"]).astype(np.float32),
               cv2.INTER_NEAREST) > 0.5
    )
    for k in ("pair_a", "pair_b", "points"):
        out[k] = jnp.minimum(
            jnp.asarray(batch[k]) // d,
            jnp.array([h2 - 1, w2 - 1], jnp.int32),
        )
    return cam.rescale(1.0 / d), out


class Trainer:
    def __init__(self, config: TrainerConfig, datamanager: FullImageDatamanager):
        self.config = config
        self.dm = datamanager
        self.writer: Optional[MetricsWriter] = None
        self.state: Optional[TrainState] = None

    def setup(self) -> TrainState:
        cfg = self.config
        mcfg = cfg.model
        key = jax.random.PRNGKey(cfg.seed)
        k_field, k_mlp, k_state = jax.random.split(key, 3)

        seeds = self.dm.seed_points
        if seeds is not None:
            xyz, rgb = seeds
            cap = cfg.capacity or int(len(xyz) * cfg.capacity_multiplier)
            field, alive = init_from_seeds(
                k_field, xyz, rgb,
                feature_dim=mcfg.feature_dim, sh_degree=mcfg.sh_degree,
                capacity=cap,
            )
        else:
            n = cfg.random_init_points
            cap = cfg.capacity or int(n * cfg.capacity_multiplier)
            field, alive = init_random(
                k_field, n, feature_dim=mcfg.feature_dim,
                sh_degree=mcfg.sh_degree, capacity=cap,
            )
        fea_up = init_mlp(k_mlp, mcfg.feature_dim, mcfg.clip_dim, (128,))
        pose = None
        if mcfg.pose_opt_mode != "off":
            from gaussiangrasper_tpu.core.pose_opt import init_pose_deltas

            pose = init_pose_deltas(len(self.dm))
        state = init_train_state(k_state, field, alive, fea_up, pose=pose)

        if cfg.load_dir is not None:
            path = ckpt.latest_checkpoint(cfg.load_dir)
            if path is not None:
                state = ckpt.load_checkpoint(path, state)
                print(f"resumed from {path} at step {int(state.step)}")

        self.writer = MetricsWriter(
            log_dir=cfg.run_dir / "tb", tensorboard=cfg.tensorboard,
            steps_per_log=cfg.steps_per_log, max_steps=cfg.max_iterations,
            vis=[v for v in cfg.vis.split("+") if v],
            experiment_name=cfg.experiment_name,
        )
        self.state = state
        self.save_config()
        return state

    def save_config(self) -> None:
        cfg = self.config
        cfg.run_dir.mkdir(parents=True, exist_ok=True)
        payload = dataclasses.asdict(cfg)
        payload = jax.tree.map(
            lambda v: str(v) if isinstance(v, Path) else v, payload,
            is_leaf=lambda v: isinstance(v, Path),
        )
        (cfg.run_dir / "config.json").write_text(json.dumps(payload, indent=2))

    def train(self) -> TrainState:
        cfg = self.config
        mcfg = cfg.model
        state = self.state if self.state is not None else self.setup()
        num_train = len(self.dm)

        source = self.dm
        prefetcher = None
        if cfg.prefetch and cfg.max_iterations - int(state.step) > 1:
            from gaussiangrasper_tpu.data.prefetch import PrefetchingDatamanager

            prefetcher = source = PrefetchingDatamanager(self.dm)

        viewer_server = None
        if cfg.viewer_port is not None:
            from gaussiangrasper_tpu.scripts.viewer import (
                scene_info_from_dm,
                serve_in_background,
            )

            self.state = state
            viewer_server = serve_in_background(
                lambda: self.state, mcfg, cfg.viewer_port,
                scene_info=scene_info_from_dm(self.dm),
            )

        tracer = None
        if cfg.profiler == "trace":
            from gaussiangrasper_tpu.utils.profiler import TraceCapture

            tracer = TraceCapture(cfg.run_dir / "profiler_traces")

        start = int(state.step)
        t0 = time.perf_counter()
        for step in range(start, cfg.max_iterations):
            if tracer is not None:
                tracer.maybe_step(step)
            cam_idx, cam, batch = source.next_train()
            d = _downscale_factor(mcfg, step)
            cam_s, batch_s = downscale_batch(batch, cam, d)
            if state.pose is not None:
                batch_s = dict(batch_s, cam_idx=jnp.asarray(cam_idx, jnp.int32))
            state, metrics = train_step(state, cam_s, batch_s, mcfg)
            self.state = state  # live handle for the training viewer

            # failure detection: a non-finite loss means the run is
            # poisoned — save a post-mortem checkpoint and stop instead of
            # silently training on NaNs (the reference has no such guard).
            if step % 10 == 0 and not np.isfinite(float(metrics["loss"])):
                if prefetcher is not None:
                    prefetcher.close()
                path = ckpt.save_checkpoint(cfg.ckpt_dir, state, step=step)
                raise FloatingPointError(
                    f"non-finite loss at step {step}; post-mortem state "
                    f"saved to {path}"
                )

            if (step + 1) % mcfg.refine_every == 0:
                state = refine_step(
                    state, mcfg, cam_s.width, cam_s.height, num_train
                )

            if self.writer is not None:
                self.writer.step(
                    step,
                    {k: metrics[k] for k in ("loss", "psnr", "gaussian_count")},
                    pixels=cam_s.width * cam_s.height,
                )
                # eval-image panel (ref trainer.py:529-532): render a held
                # view into tensorboard every steps_per_eval_image
                if (
                    self.writer.has_backend
                    and (step + 1) % cfg.steps_per_eval_image == 0
                ):
                    from gaussiangrasper_tpu.models.model import render as render_fn

                    ev_cam, _ = self.dm.get_batch(0)
                    outs = render_fn(
                        state.field, state.alive, ev_cam, state.step, mcfg
                    )
                    self.writer.image(
                        step, "eval/rgb",
                        np.clip(np.asarray(outs["rgb"]), 0, 1),
                    )
            if (step + 1) % cfg.steps_per_save == 0 or step + 1 == cfg.max_iterations:
                path = ckpt.save_checkpoint(cfg.ckpt_dir, state)
                print(f"saved {path}")
        if tracer is not None:
            tracer.close()
        if prefetcher is not None:
            prefetcher.close()
        if viewer_server is not None:
            viewer_server.shutdown()
        dt = time.perf_counter() - t0
        steps_done = cfg.max_iterations - start
        if steps_done:
            print(f"trained {steps_done} steps in {dt:.1f}s ({steps_done / dt:.2f} it/s)")
        self.state = state
        return state


def make_trainer(config: TrainerConfig) -> Trainer:
    """Build datamanager (resolving the named/auto dataparser) + trainer."""
    from gaussiangrasper_tpu.data.dataparsers.zoo import resolve_parser

    outputs = resolve_parser(Path(config.data), config.dataparser).parse()
    dm = FullImageDatamanager(outputs, SamplerConfig(), seed=config.seed)
    return Trainer(config, dm)
