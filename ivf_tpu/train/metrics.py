"""Metrics — top-k precision and running meters.

``topk_accuracy`` mirrors ``utils.accuracy``
(video_features_pytorch/utils.py:206-219): percentage of samples whose
target is within the top-k predictions, returned per requested k.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def topk_accuracy(
    output: jax.Array, target: jax.Array, topk: Sequence[int] = (1,)
) -> Tuple[jax.Array, ...]:
    """output: (B, num_classes) scores; target: (B,) int labels.
    Returns tuple of scalar percentages (0..100), one per k."""
    n_classes = output.shape[-1]
    maxk = min(max(topk), n_classes)  # clamp for few-class heads (KTH: 6)
    _, pred = jax.lax.top_k(output, maxk)  # (B, maxk)
    correct = pred == target[:, None]
    batch = output.shape[0]
    return tuple(
        jnp.sum(correct[:, : min(k, n_classes)]) * (100.0 / batch)
        for k in topk
    )


class AverageMeter:
    """Running average (utils.py:241-256)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
