from gple_tpu.sampler.mc import (
    MCParameters,
    POSSIBLE_DISPLACEMENTS,
    element_monte_carlo,
    generate_extra_points_element,
    initial_distribution,
    markov_chain,
    tune_displacement,
    tune_steps,
)

__all__ = [
    "MCParameters",
    "POSSIBLE_DISPLACEMENTS",
    "element_monte_carlo",
    "generate_extra_points_element",
    "initial_distribution",
    "markov_chain",
    "tune_displacement",
    "tune_steps",
]
