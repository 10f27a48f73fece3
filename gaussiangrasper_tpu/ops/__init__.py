from gaussiangrasper_tpu.ops.projection import project_gaussians, ProjectedGaussians
from gaussiangrasper_tpu.ops.rasterize import rasterize, RasterizeConfig

__all__ = ["project_gaussians", "ProjectedGaussians", "rasterize", "RasterizeConfig"]
