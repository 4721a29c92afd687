"""TF-style SAME padding, computed statically at trace time.

The reference re-derives TF "SAME" padding inside every forward pass because
torch lacks asymmetric SAME for strided convs
(``video_features_pytorch/models/I3D_doubled.py:77-106`` and ``:9-40``).
Under XLA all shapes are static, so the same arithmetic runs once at trace
time here and becomes explicit per-dimension ``(lo, hi)`` padding on the
convolution — zero runtime cost.

Formula (identical to TF/the reference's ``compute_pad``): for a spatial dim
of size ``s`` with kernel ``k`` and stride ``st``::

    pad_total = max(k - st, 0)            if s % st == 0
                max(k - (s % st), 0)      otherwise
    lo = pad_total // 2 ; hi = pad_total - lo
"""

from __future__ import annotations

from typing import Sequence, Tuple


def same_pad_amounts(size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """(lo, hi) SAME padding for one dimension — mirrors I3D_doubled.py:77-81."""
    if size % stride == 0:
        total = max(kernel - stride, 0)
    else:
        total = max(kernel - (size % stride), 0)
    lo = total // 2
    return lo, total - lo


def explicit_same_padding(
    sizes: Sequence[int], kernels: Sequence[int], strides: Sequence[int]
) -> Tuple[Tuple[int, int], ...]:
    """Per-dimension (lo, hi) SAME padding for a list of spatial dims."""
    assert len(sizes) == len(kernels) == len(strides)
    return tuple(
        same_pad_amounts(s, k, st) for s, k, st in zip(sizes, kernels, strides)
    )
