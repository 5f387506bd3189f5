from gple_tpu.dynamics.evolve import (
    evolve_step,
    is_coupling,
    is_very_small,
    predict_new_points,
)

__all__ = ["evolve_step", "is_coupling", "is_very_small", "predict_new_points"]
