from .noise_calibration import compute_noise_weights
from .io import save_coefficients, load_coefficients

__all__ = [
    "compute_noise_weights",
    "save_coefficients",
    "load_coefficients",
]
