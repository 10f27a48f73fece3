from gaussiangrasper_tpu.configs.methods import METHODS, get_method

__all__ = ["METHODS", "get_method"]
