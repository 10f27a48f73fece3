from gaussiangrasper_tpu.engine.optimizers import (
    GroupConfig,
    DEFAULT_GROUPS,
    init_opt_state,
    apply_updates_grouped,
)
from gaussiangrasper_tpu.engine.refinement import DensifyStats, refine, accumulate_stats
from gaussiangrasper_tpu.engine.train_state import TrainState

__all__ = [
    "GroupConfig",
    "DEFAULT_GROUPS",
    "init_opt_state",
    "apply_updates_grouped",
    "DensifyStats",
    "refine",
    "accumulate_stats",
    "TrainState",
]
