from ivf_tpu.interpret.perturb import (
    perturb_sequence,
    freeze_perturb,
    reverse_perturb,
    tv_norm,
    snap_mask,
    find_submasks_from_mask,
)
from ivf_tpu.interpret.mask_opt import (
    init_mask_central,
    init_mask_random,
    find_mask,
    MaskSearchResult,
)
from ivf_tpu.interpret.gradcam import grad_cam

__all__ = [
    "perturb_sequence",
    "freeze_perturb",
    "reverse_perturb",
    "tv_norm",
    "snap_mask",
    "find_submasks_from_mask",
    "init_mask_central",
    "init_mask_random",
    "find_mask",
    "MaskSearchResult",
    "grad_cam",
]
