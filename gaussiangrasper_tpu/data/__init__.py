from gaussiangrasper_tpu.data.dataparsers.base import DataparserOutputs
from gaussiangrasper_tpu.data.dataset import InputDataset
from gaussiangrasper_tpu.data.manager import FullImageDatamanager

__all__ = ["DataparserOutputs", "InputDataset", "FullImageDatamanager"]
