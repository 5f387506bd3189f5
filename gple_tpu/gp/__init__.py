from gple_tpu.gp.opt import AVERAGE_TOLERANCE, Optimizer, OptResult

__all__ = ["AVERAGE_TOLERANCE", "Optimizer", "OptResult"]
