from gaussiangrasper_tpu.data.dataparsers.base import DataparserOutputs
from gaussiangrasper_tpu.data.dataparsers.colmap import ColmapDataParser
from gaussiangrasper_tpu.data.dataparsers.transforms_json import TransformsJsonParser

__all__ = ["DataparserOutputs", "ColmapDataParser", "TransformsJsonParser"]
