"""Synthetic in-memory clip datasets — benches, dryruns, examples, tests.

One definition of the indexable uint8-clip stub that ``api.find_masks`` /
``api.train`` consume (``__getitem__ -> (clip_uint8, label, clip_id)``),
shared by ``scripts/bench_e2e.py``, ``__graft_entry__.dryrun_multichip``
and the e2e test suite instead of four hand-rolled copies.
"""

from __future__ import annotations

import numpy as np


class SyntheticClips:
    """Indexable uint8 clip dataset; labels round-robin over ``num_classes``.

    ``lazy=True`` (default) stores ONE base clip and derives per-index
    variants by a small offset — O(1) memory for any ``n`` (bench_e2e
    materializes 22k+ clips through this), still distinct inputs per index
    so memoizing backends can't collapse them. ``lazy=False`` materializes
    independent random clips (useful when per-clip content must be
    uncorrelated).
    """

    def __init__(
        self,
        n: int,
        t: int = 16,
        hw: int = 224,
        num_classes: int = 174,
        seed: int = 0,
        lazy: bool = True,
    ):
        rng = np.random.RandomState(seed)
        self.n = int(n)
        self.num_classes = int(num_classes)
        self.lazy = lazy
        if lazy:
            self.base = rng.randint(0, 235, (t, hw, hw, 3)).astype(np.uint8)
        else:
            self.clips = rng.randint(0, 255, (n, t, hw, hw, 3)).astype(
                np.uint8
            )

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        if self.lazy:
            clip = self.base + np.uint8(i % 19)
        else:
            clip = self.clips[i]
        return clip, i % self.num_classes, f"clip{i}"
