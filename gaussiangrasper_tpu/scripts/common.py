"""Shared run-loading for the offline tools (render / update / export).

Role of the reference's eval_setup (/root/reference/nerfstudio/utils/
eval_utils.py:67-110): read the config saved at train time, rebuild the
datamanager + model state, and restore the latest checkpoint.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax

from gaussiangrasper_tpu.engine import checkpoint as ckpt
from gaussiangrasper_tpu.engine.trainer import Trainer, TrainerConfig, make_trainer
from gaussiangrasper_tpu.engine.train_state import TrainState
from gaussiangrasper_tpu.models.model import GaussianSplatConfig
from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig


def config_from_json(path: Path) -> TrainerConfig:
    payload = json.loads(Path(path).read_text())
    model_payload = payload.pop("model")
    raster = RasterizeConfig(**model_payload.pop("raster"))
    model = GaussianSplatConfig(raster=raster, **model_payload)
    for k in ("data", "output_dir", "load_dir"):
        if payload.get(k) is not None:
            payload[k] = Path(payload[k])
    return TrainerConfig(model=model, **payload)


def load_run(
    run_dir: Path, step: Optional[int] = None, data_override: Optional[Path] = None
) -> Tuple[TrainerConfig, Trainer, TrainState]:
    """(config, trainer-with-datamanager, restored state)."""
    run_dir = Path(run_dir)
    config = config_from_json(run_dir / "config.json")
    if data_override is not None:
        config.data = Path(data_override)
    trainer = make_trainer(config)
    state = trainer.setup()
    path = (
        run_dir / "checkpoints" / ckpt.STEP_FMT.format(step)
        if step is not None
        else ckpt.latest_checkpoint(run_dir / "checkpoints")
    )
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {run_dir / 'checkpoints'}")
    state = ckpt.load_checkpoint(path, state)
    trainer.state = state
    return config, trainer, state
