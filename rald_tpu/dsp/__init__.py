"""L0 — radar DSP (TPU-native).

Pure-function, jit-compiled re-design of the reference's multiprocess NumPy
preprocessing stack (``dataset_preprocessor/utils/radardsp.py``,
``radar_preprocessing.py``, ``cache_test_cfar_utils.py``): XLA batched FFTs,
static scatter indices for the virtual antenna array, fully vectorized CFAR
detectors, and static-shape budgeted peak extraction.
"""
from rald_tpu.dsp.params import RadarParams, parse_antenna_array
from rald_tpu.dsp.bins import (
    get_range_bins,
    get_velocity_bins,
    get_angle_bins,
    get_bins,
    get_max_range,
    get_max_velocity,
    get_range_resolution,
    get_velocity_resolution,
    fft_size,
)
from rald_tpu.dsp.virtual_array import (
    virtual_array,
    virtual_array_shape,
    velocity_compensation,
    steering_matrix,
)
from rald_tpu.dsp.rae import raeivv_map, NOISE_THRESHOLD
from rald_tpu.dsp.cfar import (
    weibull_quantile,
    masked_weibull_quantile,
    os_cfar,
    nq_cfar_2d,
    mask_real_2d,
)
from rald_tpu.dsp.cfar_points import (
    rae_interpo,
    resize_linear_align_corners,
    weighted_allocation,
    budgeted_topk,
    cube_idx2coord,
    cfar_points_from_cube,
)

__all__ = [
    "RadarParams",
    "parse_antenna_array",
    "get_range_bins",
    "get_velocity_bins",
    "get_angle_bins",
    "get_bins",
    "get_max_range",
    "get_max_velocity",
    "get_range_resolution",
    "get_velocity_resolution",
    "fft_size",
    "virtual_array",
    "virtual_array_shape",
    "velocity_compensation",
    "steering_matrix",
    "raeivv_map",
    "NOISE_THRESHOLD",
    "weibull_quantile",
    "masked_weibull_quantile",
    "os_cfar",
    "nq_cfar_2d",
    "mask_real_2d",
    "rae_interpo",
    "resize_linear_align_corners",
    "weighted_allocation",
    "budgeted_topk",
    "cube_idx2coord",
    "cfar_points_from_cube",
]
