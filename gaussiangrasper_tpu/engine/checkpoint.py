"""Orbax checkpointing of the full training state.

Role of the reference's Trainer.save_checkpoint / _load_checkpoint
(/root/reference/nerfstudio/engine/trainer.py:392-456: step-numbered files,
pipeline+optimizers+schedulers state, optional keep-latest-only). The
reference's variable-Gaussian-count reload trick (gaussian_splatting.py:
301-313 re-allocates parameters to the checkpoint's count) is unnecessary
here: capacity + alive-mask are part of the pytree and restore to exactly
the saved shapes.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from gaussiangrasper_tpu.engine.train_state import TrainState

STEP_FMT = "step_{:09d}"


def save_checkpoint(
    ckpt_dir: Path,
    state: TrainState,
    step: Optional[int] = None,
    keep_only_latest: bool = True,
) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    path = (ckpt_dir / STEP_FMT.format(step)).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if keep_only_latest:
        for p in ckpt_dir.iterdir():
            if p.is_dir() and p.name.startswith("step_") and p != path:
                shutil.rmtree(p)
    return path


def latest_checkpoint(ckpt_dir: Path) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(
        p for p in ckpt_dir.iterdir() if p.is_dir() and p.name.startswith("step_")
    )
    return steps[-1].absolute() if steps else None


def load_checkpoint(path: Path, template: TrainState) -> TrainState:
    """Restore into the structure/shardings of `template` (build it with
    the same capacity/config; use jax.eval_shape for a cheap template)."""
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), abstract)
