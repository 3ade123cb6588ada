"""Model layer: SMIN and its submodules as pure-functional pytree modules."""

from video_moment_localization_tpu.models.smin import (
    init_smin_params,
    smin_forward,
)
from video_moment_localization_tpu.models.lstm import bilstm, init_bilstm_params

__all__ = [
    "init_smin_params",
    "smin_forward",
    "bilstm",
    "init_bilstm_params",
]
