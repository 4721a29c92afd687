from ivf_tpu.ops.padding import same_pad_amounts, explicit_same_padding
from ivf_tpu.ops.conv import (
    conv3d_same,
    max_pool3d_same,
    avg_pool3d_valid,
    conv2d_same_torch,
)
from ivf_tpu.ops.convlstm_cell import convlstm_cell_step, fused_gate_math

__all__ = [
    "same_pad_amounts",
    "explicit_same_padding",
    "conv3d_same",
    "max_pool3d_same",
    "avg_pool3d_valid",
    "conv2d_same_torch",
    "convlstm_cell_step",
    "fused_gate_math",
]
