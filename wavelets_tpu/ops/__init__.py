from .filters import ScalingFunction, TRIANGLE, B3SPLINE
from .conv import smooth, separable_smooth_axis, local_variance, atrous_conv_nd
from .stats import (
    generalized_anscombe,
    mad_noise,
    significance_soft,
    significance_hard,
)

__all__ = [
    "ScalingFunction",
    "TRIANGLE",
    "B3SPLINE",
    "smooth",
    "separable_smooth_axis",
    "local_variance",
    "atrous_conv_nd",
    "generalized_anscombe",
    "mad_noise",
    "significance_soft",
    "significance_hard",
]
