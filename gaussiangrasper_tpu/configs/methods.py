"""Method registry: name -> trainer factory.

Role of the reference's method_configs.py registry + plugin discovery
(/root/reference/nerfstudio/configs/method_configs.py:603,
plugins/registry.py:34-80): the train CLI selects a method by name;
third-party methods register through the
`gaussiangrasper_tpu.method_configs` entry-point group or the
GGT_METHOD_CONFIGS env var ("name=module:factory,...").
"""

from __future__ import annotations

import dataclasses
import importlib
import os
from typing import Callable, Dict


def _gaussian_splatting(args) -> None:
    from gaussiangrasper_tpu.engine.trainer import TrainerConfig, make_trainer
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig

    model = GaussianSplatConfig(
        feature_dim=args.feature_dim,
        sh_degree=args.sh_degree,
        warmup_length=args.warmup_length,
        refine_every=args.refine_every,
        densify_grad_thresh=args.densify_grad_thresh,
    )
    config = TrainerConfig(
        data=args.data[0],
        output_dir=args.output_dir,
        experiment_name=args.experiment_name,
        max_iterations=args.max_iterations,
        steps_per_save=args.steps_per_save,
        seed=args.seed,
        capacity=args.capacity,
        tensorboard=args.tensorboard,
        viewer_port=getattr(args, "viewer_port", None),
        load_dir=args.load_dir,
        model=model,
    )
    if len(args.data) > 1:
        from gaussiangrasper_tpu.engine.multi_scene import train_multi

        train_multi(config, args.data)
        return
    trainer = make_trainer(config)
    trainer.setup()
    mesh = getattr(args, "mesh", None)
    if mesh:
        from gaussiangrasper_tpu.parallel.host_loop import train_sharded

        dp, gauss = (int(x) for x in mesh.split(","))
        train_sharded(trainer, dp=dp, gauss=gauss)
        return
    trainer.train()


def _nerf(field: str, depth_lambda: float = 0.0):
    def run(args) -> None:
        from gaussiangrasper_tpu.engine.nerf_trainer import (
            NerfTrainer,
            NerfTrainerConfig,
        )
        from gaussiangrasper_tpu.engine.trainer import make_trainer, TrainerConfig
        from gaussiangrasper_tpu.models.nerf import NerfConfig

        # reuse the GS data path for parsing/caching
        base = make_trainer(TrainerConfig(data=args.data[0]))
        cfg = NerfTrainerConfig(
            data=args.data[0],
            output_dir=args.output_dir,
            experiment_name=args.experiment_name,
            max_iterations=args.max_iterations,
            steps_per_save=args.steps_per_save,
            seed=args.seed,
            depth_lambda=depth_lambda,
            model=NerfConfig(field=field),
        )
        t = NerfTrainer(cfg, base.dm)
        t.setup()
        t.train()

        # eval render-out (the GS path gets this via scripts/render.py)
        import json

        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        from gaussiangrasper_tpu.models import losses

        out_dir = cfg.run_dir / "renders"
        out_dir.mkdir(parents=True, exist_ok=True)
        rows = []
        for i in range(min(4, len(base.dm))):
            cam, batch = base.dm.get_batch(i)
            rgb = np.clip(np.asarray(t.render_image(cam)), 0, 1)
            Image.fromarray((rgb * 255).astype(np.uint8)).save(
                out_dir / f"{i:05d}.png"
            )
            rows.append({
                "view": i,
                "psnr": float(losses.psnr(jnp.asarray(rgb), batch["image"])),
            })
        (out_dir / "metrics.json").write_text(json.dumps(rows, indent=2))
        print("eval:", rows)

    return run


METHODS: Dict[str, Callable] = {
    "gaussian-splatting": _gaussian_splatting,
    "nerfacto": _nerf("nerfacto"),
    "vanilla-nerf": _nerf("vanilla"),
    "depth-nerfacto": _nerf("nerfacto", depth_lambda=0.1),
}


def _load_external() -> None:
    """Entry points + env-var registration (ref plugins/registry.py)."""
    spec = os.environ.get("GGT_METHOD_CONFIGS", "")
    for item in filter(None, spec.split(",")):
        name, target = item.split("=", 1)
        mod, attr = target.split(":", 1)
        METHODS[name] = getattr(importlib.import_module(mod), attr)
    try:
        from importlib.metadata import entry_points

        for ep in entry_points(group="gaussiangrasper_tpu.method_configs"):
            METHODS[ep.name] = ep.load()
    except Exception:
        pass


_load_external()


def get_method(name: str) -> Callable:
    if name not in METHODS:
        raise KeyError(f"unknown method {name!r}; have {sorted(METHODS)}")
    return METHODS[name]
