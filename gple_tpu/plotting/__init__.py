from gple_tpu.plotting.plots import (
    plot_averages,
    plot_gple_log,
    plot_oracle_averages,
    plot_parameters,
    plot_phase_space_frames,
    plot_point_cloud,
)

__all__ = [
    "plot_averages",
    "plot_gple_log",
    "plot_oracle_averages",
    "plot_parameters",
    "plot_phase_space_frames",
    "plot_point_cloud",
]
