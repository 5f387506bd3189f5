from gple_tpu.models.tully import (
    MODELS,
    absorbing_potential,
    adiabatic_coupling,
    adiabatic_force,
    adiabatic_potential,
    adiabatic_transform,
    diabatic_force,
    diabatic_hesse,
    diabatic_potential,
    sym2x2_eigh,
)

__all__ = [
    "MODELS",
    "absorbing_potential",
    "adiabatic_coupling",
    "adiabatic_force",
    "adiabatic_potential",
    "adiabatic_transform",
    "diabatic_force",
    "diabatic_hesse",
    "diabatic_potential",
    "sym2x2_eigh",
]
