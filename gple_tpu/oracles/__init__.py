from gple_tpu.oracles.schrodinger import DVRConfig, DVRSolver
from gple_tpu.oracles.liouville import LiouvilleConfig, LiouvilleSolver

__all__ = ["DVRConfig", "DVRSolver", "LiouvilleConfig", "LiouvilleSolver"]
