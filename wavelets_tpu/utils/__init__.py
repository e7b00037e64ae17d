from .noise_calibration import compute_noise_weights
from .io import save_coefficients, load_coefficients
from .frameio import FrameStack, write_array, native_available
from .profiling import StageTimer, Cost, decompose_cost, wow_cost, roofline

__all__ = [
    "compute_noise_weights",
    "save_coefficients",
    "load_coefficients",
    "FrameStack",
    "write_array",
    "native_available",
    "StageTimer",
    "Cost",
    "decompose_cost",
    "wow_cost",
    "roofline",
]
