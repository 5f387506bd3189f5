from gple_tpu.utils.constants import HBAR, PLANCK_H

__all__ = ["HBAR", "PLANCK_H"]
