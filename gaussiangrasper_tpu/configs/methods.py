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
        sky_alpha_reg=getattr(args, "sky_alpha_reg", 0.0),
    )
    mt = getattr(args, "max_tiles_per_gaussian", None)
    if mt:
        model = dataclasses.replace(
            model, raster=dataclasses.replace(
                model.raster, max_tiles_per_gaussian=mt))
    config = TrainerConfig(
        data=args.data[0],
        output_dir=args.output_dir,
        experiment_name=args.experiment_name,
        max_iterations=args.max_iterations,
        steps_per_save=args.steps_per_save,
        seed=args.seed,
        capacity=args.capacity,
        tensorboard=args.tensorboard,
        vis=getattr(args, "vis", ""),
        viewer_port=getattr(args, "viewer_port", None),
        load_dir=args.load_dir,
        profiler=getattr(args, "profiler", "none"),
        dataparser=getattr(args, "dataparser", "auto"),
        model=model,
    )
    if len(args.data) > 1:
        from gaussiangrasper_tpu.engine.multi_scene import train_multi

        mesh_arg = getattr(args, "mesh", None)
        multi_dp = int(mesh_arg.split(",")[0]) if mesh_arg else None
        train_multi(config, args.data, dp=multi_dp)
        return
    trainer = make_trainer(config)
    trainer.setup()
    mesh = getattr(args, "mesh", None)
    if mesh:
        from gaussiangrasper_tpu.parallel.host_loop import train_sharded

        dp, gauss = (int(x) for x in mesh.split(","))
        ts_arg = getattr(args, "tile_shard", "auto")
        tile_shard = None if ts_arg == "auto" else (ts_arg == "on")
        train_sharded(trainer, dp=dp, gauss=gauss, tile_shard=tile_shard)
        return
    trainer.train()


def _nerf(field: str, model_kwargs: dict | None = None, **trainer_kwargs):
    def run(args) -> None:
        from gaussiangrasper_tpu.engine.nerf_trainer import (
            NerfTrainer,
            NerfTrainerConfig,
        )
        from gaussiangrasper_tpu.engine.trainer import make_trainer, TrainerConfig
        from gaussiangrasper_tpu.models.nerf import NerfConfig

        # reuse the GS data path for parsing/caching
        base = make_trainer(TrainerConfig(
            data=args.data[0],
            dataparser=getattr(args, "dataparser", "auto"),
        ))
        mkw = dict(model_kwargs or {})
        if mkw.pop("_appearance_per_image", False):
            # phototourism: one appearance embedding per training image
            mkw["num_appearance_embeds"] = len(base.dm)
        cfg = NerfTrainerConfig(
            data=args.data[0],
            output_dir=args.output_dir,
            experiment_name=args.experiment_name,
            max_iterations=args.max_iterations,
            steps_per_save=args.steps_per_save,
            seed=args.seed,
            model=NerfConfig(field=field, **mkw),
            **trainer_kwargs,
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


def _generfacto(args) -> None:
    """Text-to-3D via Score Distillation Sampling (ref models/generfacto.py
    + generative/). The full scaffold is implemented (random orbit
    cameras, SDS, opacity prior — models/generative.py); the denoiser is
    pluggable: GGT_GUIDANCE=color runs the analytic test guidance,
    GGT_GUIDANCE_DIR=<path> wires locally cached diffusion weights, and
    with neither the install hint prints (the reference's external-method
    pattern, configs/external_methods.py)."""
    import os

    import jax

    from gaussiangrasper_tpu.models import generative as gen

    if os.environ.get("GGT_GUIDANCE") == "color":
        guidance = gen.ColorTargetGuidance()
    elif os.environ.get("GGT_GUIDANCE_DIR"):
        guidance = gen.StableDiffusionGuidance(os.environ["GGT_GUIDANCE_DIR"])
    else:
        raise SystemExit(
            "generfacto requires diffusion-guidance weights "
            "(StableDiffusion/DeepFloyd) which are unavailable in this "
            "environment. Set GGT_GUIDANCE_DIR=<cached weights> to use "
            "them, or GGT_GUIDANCE=color for the analytic scaffold test "
            "guidance (models/generative.py)."
        )
    cfg = gen.GenerfactoConfig(max_iterations=args.max_iterations)
    params, render_view = gen.train_generfacto(
        jax.random.PRNGKey(args.seed), guidance, cfg,
        progress=lambda i, l: (i % 50 == 0) and print(f"[{i}] sds={l:.4f}"),
    )
    out_dir = args.output_dir / args.experiment_name
    out_dir.mkdir(parents=True, exist_ok=True)
    cam, _, _ = gen.random_orbit_camera(
        jax.random.PRNGKey(0), cfg.resolution, radius_mean=cfg.radius_mean
    )
    rgb = render_view(cam)
    import numpy as np
    from PIL import Image

    Image.fromarray(
        (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    ).save(out_dir / "generated.png")
    print(f"wrote {out_dir / 'generated.png'}")


# the reference's registered method set (configs/method_configs.py:98-668),
# minus the external-dep text-to-3D method which is install-hint gated
METHODS: Dict[str, Callable] = {
    "gaussian-splatting": _gaussian_splatting,
    "nerfacto": _nerf("nerfacto", {"use_proposal": True}),
    "nerfacto-big": _nerf(
        "nerfacto",
        {"use_proposal": True, "hash_levels": 16, "log2_hashmap_size": 19,
         "num_fine": 96},
    ),
    "nerfacto-huge": _nerf(
        "nerfacto",
        {"use_proposal": True, "hash_levels": 16, "log2_hashmap_size": 21,
         "num_proposal_samples": (256, 96), "num_fine": 128},
    ),
    "vanilla-nerf": _nerf("vanilla", coarse_rgb_lambda=1.0),
    "depth-nerfacto": _nerf("nerfacto", depth_lambda=0.1),
    "mipnerf": _nerf("mipnerf"),
    "instant-ngp": _nerf(
        # the reference trains ingp through DynamicBatchPipeline
        # (method_configs.py); engine/dynamic_batch.py is the analog
        "instant-ngp", use_occupancy_grid=True, dynamic_batch=True
    ),
    "instant-ngp-bounded": _nerf(
        "instant-ngp", {"scene_scale": 1.0}, use_occupancy_grid=True,
        dynamic_batch=True
    ),
    "tensorf": _nerf("tensorf", tensorf_reg_lambda=5e-4),
    "dnerf": _nerf("vanilla", {"deformation": True}, coarse_rgb_lambda=1.0),
    "semantic-nerfw": _nerf(
        "nerfacto", {"num_semantic_classes": 64}, semantic_lambda=0.1
    ),
    "phototourism": _nerf("nerfacto", {"_appearance_per_image": True}),
    "neus": _nerf("neus", eikonal_lambda=0.1),
    "neus-facto": _nerf("neus-facto", eikonal_lambda=0.1),
    "generfacto": _generfacto,
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
