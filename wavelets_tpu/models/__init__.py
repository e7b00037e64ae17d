from .denoise import denoise, denoise_core
from .enhance import enhance, prepare_params
from .wow import wow, wow_core
from .richardson_lucy import richardson_lucy, richardson_lucy_stack

__all__ = [
    "denoise",
    "denoise_core",
    "enhance",
    "prepare_params",
    "wow",
    "wow_core",
    "richardson_lucy",
    "richardson_lucy_stack",
]
