from gaussiangrasper_tpu.parallel.mesh import make_mesh
from gaussiangrasper_tpu.parallel.tile_shard import (
    composite_tile_sharded,
    tile_sharded_compositor,
)
from gaussiangrasper_tpu.parallel.train import (
    make_sharded_train_step,
    shard_train_state,
)

__all__ = ["make_mesh", "make_sharded_train_step", "shard_train_state"]
