"""GaussianGrasper-TPU: a TPU-native language-embedded 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
leejaehot/GaussianGrasper (a nerfstudio fork + gsplat CUDA kernels):
differentiable tile-based rasterization of 3D Gaussians with RGB / depth /
normal / latent-CLIP-feature channels, Efficient Feature Distillation,
adaptive densification, scene editing, and multi-host sharded training.

Layer map (mirrors SURVEY.md section 1, re-imagined TPU-first):
  core/      geometry + camera primitives           (ref: nerfstudio/cameras/)
  ops/       projection / binning / rasterization   (ref: gsplat CUDA kernels)
  models/    Gaussian field, EFD head, losses       (ref: nerfstudio/models/gaussian_splatting.py)
  data/      dataparsers, datasets, datamanager     (ref: nerfstudio/data/)
  engine/    optimizers, refinement, trainer, ckpt  (ref: nerfstudio/engine/)
  parallel/  mesh, sharding, distributed render     (ref: NCCL/DDP -> pjit/shard_map)
  scripts/   train / render / eval / update / export CLIs
"""

__version__ = "0.1.0"
