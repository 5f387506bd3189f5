from gple_tpu.ops.kernels import (
    KernelParams,
    RealTrainState,
    fit_real,
    gram,
    loocv_error,
    population as real_population,
    predict_real,
    purity as real_purity,
    r_average as real_r_average,
)
from gple_tpu.ops.complex_kernels import (
    ComplexKernelParams,
    ComplexTrainState,
    fit_complex,
    predict_complex,
)

__all__ = [
    "KernelParams",
    "RealTrainState",
    "fit_real",
    "gram",
    "loocv_error",
    "predict_real",
    "real_population",
    "real_purity",
    "real_r_average",
    "ComplexKernelParams",
    "ComplexTrainState",
    "fit_complex",
    "predict_complex",
]
