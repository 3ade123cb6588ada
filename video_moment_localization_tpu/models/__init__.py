"""Model layer: SMIN and its submodules as pure-functional pytree modules."""

from video_moment_localization_tpu.models.lstm import bilstm, init_bilstm_params
from video_moment_localization_tpu.models.port import (
    params_from_torch_state_dict,
    torch_state_dict_from_params,
)
from video_moment_localization_tpu.models.smin import (
    init_smin_params,
    smin_forward,
)

__all__ = [
    "init_smin_params",
    "smin_forward",
    "bilstm",
    "init_bilstm_params",
    "params_from_torch_state_dict",
    "torch_state_dict_from_params",
]
