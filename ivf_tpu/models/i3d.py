"""Inception-v1 I3D, TPU-native Flax implementation.

Capability parity with the reference's two torch variants
(``video_features_pytorch/models/I3D_doubled.py`` — smth-smth head — and
``I3D_doubled_kth.py`` — KTH 160x120 head; they differ only in the Logits
avg-pool kernel) and with the TF/Sonnet variant
(``video_features_tf/models/i3d.py``), whose temporal-mean logits head is
available via ``temporal_mean=True``.

Layout is channels-last ``(B, T, H, W, C)``; endpoints are sown into the
``'intermediates'`` collection, and ``features_to`` / ``head_from`` expose a
differentiable trunk/head split that replaces the reference's hook-based
``ModelOutputsVideo`` (``grad_cam_videos.py:13-43``) for Grad-CAM.

Knobs carried over from the reference constructor (I3D_doubled.py:186-335):
  * ``stride_mod_layers`` + ``last_stride`` — remove temporal striding from
    the named layers (2x/4x temporal resolution for mask search),
  * ``final_endpoint`` — truncate the trunk,
  * ``dropout_rate`` — the reference passes ``dropout_keep_prob`` straight
    into ``nn.Dropout``, so its 0.5 is really a DROP probability; we name it
    honestly,
  * ``softmax`` / ``last_relu`` head options,
  * ``pool_shape`` — Logits avg-pool kernel; ``None`` reproduces the smth
    formula (lines 310-318), KTH passes ``(final_time_length, 4, 5)``
    (I3D_doubled_kth.py:299-308).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ivf_tpu.models.layers import InceptionModule, Unit3D
from ivf_tpu.ops.conv import avg_pool3d_valid, max_pool3d_same

# (endpoint name, kind, spec) in trunk order — mirrors VALID_ENDPOINTS
# (I3D_doubled.py:165-184). 'spool' endpoints honor stride_mod_layers.
_TRUNK = (
    ("Conv3d_1a_7x7", "conv", dict(out=64, kernel=(7, 7, 7), stride_t=2, stride_hw=2)),
    ("MaxPool3d_2a_3x3", "pool", dict(window=(1, 3, 3), stride=(1, 2, 2))),
    ("Conv3d_2b_1x1", "conv", dict(out=64, kernel=(1, 1, 1), stride_t=1, stride_hw=1)),
    ("Conv3d_2c_3x3", "conv", dict(out=192, kernel=(3, 3, 3), stride_t=1, stride_hw=1)),
    ("MaxPool3d_3a_3x3", "pool", dict(window=(1, 3, 3), stride=(1, 2, 2))),
    ("Mixed_3b", "mixed", dict(out=(64, 96, 128, 16, 32, 32))),
    ("Mixed_3c", "mixed", dict(out=(128, 128, 192, 32, 96, 64))),
    ("MaxPool3d_4a_3x3", "spool", dict(window=(3, 3, 3), stride_t=2, stride_hw=2)),
    ("Mixed_4b", "mixed", dict(out=(192, 96, 208, 16, 48, 64))),
    ("Mixed_4c", "mixed", dict(out=(160, 112, 224, 24, 64, 64))),
    ("Mixed_4d", "mixed", dict(out=(128, 128, 256, 24, 64, 64))),
    ("Mixed_4e", "mixed", dict(out=(112, 144, 288, 32, 64, 64))),
    ("Mixed_4f", "mixed", dict(out=(256, 160, 320, 32, 128, 128))),
    ("MaxPool3d_5a_2x2", "spool", dict(window=(2, 2, 2), stride_t=2, stride_hw=2)),
    ("Mixed_5b", "mixed", dict(out=(256, 160, 320, 32, 128, 128))),
    ("Mixed_5c", "mixed", dict(out=(384, 192, 384, 48, 128, 128))),
)

TRUNK_ENDPOINTS = tuple(name for name, _, _ in _TRUNK)
VALID_ENDPOINTS = TRUNK_ENDPOINTS + ("Logits", "Predictions")


class I3D(nn.Module):
    num_classes: int = 400
    final_endpoint: str = "Logits"
    dropout_rate: float = 0.5
    last_stride: int = 1
    stride_mod_layers: Tuple[str, ...] = ()
    softmax: bool = False
    last_relu: Optional[str] = None  # None | 'relu' | 'leaky' (dead in the reference -> None) | 'leaky_fixed'
    spatial_squeeze: bool = True
    pool_shape: Optional[Tuple[int, int, int]] = None
    temporal_mean: bool = False  # TF-variant head: mean logits over time
    guided_relu: bool = False  # guided-backprop backward (same forward)
    remat: bool = False  # checkpoint Inception blocks: ~2x activation-memory
    # reduction in backward passes (bigger mask-search batches) for ~30%
    # extra forward FLOPs
    stem_s2d: bool = True  # space-to-depth stem (identical math, ~2x faster
    # stem on TPU; auto-falls back when stride/shape conditions don't hold)
    fold_bn: bool = True  # inference-mode BN-into-conv folding (layers.py)
    fuse_1x1: bool = True  # inference-mode Inception 1x1x1 branch fusion
    fuse_3x3: object = False  # block-diag 3x3x3 branch fusion: True |
    # False | 'auto' (<=14^2 blocks only). Both modes measured slightly
    # net-negative at batch 128 (the blocks are FLOP-relevant there); may
    # win at small batch where op overhead dominates
    use_pallas: bool = False  # 1x1x1 convs via the Pallas fused
    # matmul+bias+ReLU kernel (ops/pallas/pointwise_conv.py); measured vs
    # the XLA path in PERF.md — off by default where XLA wins
    pallas_pool: bool = False  # Inception branch-3 pools via the Pallas
    # maxpool fwd/bwd kernels (see models/layers.py + PERF.md)
    fuse_pool_conv: object = False  # whole Inception branch 3 (pool + folded
    # 1x1x1 conv + ReLU) as one Pallas kernel each way (models/layers.py);
    # True = per-frame grid, 'tblock' = whole-T frame-block grid (round 5)
    pool_impl: str = "reduce_window"  # 'shift': all maxpools as separable
    # shifted-slice max chains (elementwise-select VJP, no
    # select_and_scatter; tie-gradient deviation documented in ops/conv.py)

    def setup(self):
        if self.final_endpoint not in VALID_ENDPOINTS:
            raise ValueError(f"Unknown final endpoint {self.final_endpoint}")
        if self.guided_relu:
            from ivf_tpu.interpret.guided_backprop import guided_relu as act
        else:
            act = jax.nn.relu
        for name, kind, spec in _TRUNK:
            if kind == "conv":
                st = self._layer_stride_t(name, spec["stride_t"])
                setattr(
                    self,
                    name,
                    Unit3D(
                        spec["out"],
                        spec["kernel"],
                        (st, spec["stride_hw"], spec["stride_hw"]),
                        activation=act,
                        s2d=self.stem_s2d,
                        fold_bn=self.fold_bn,
                        use_pallas=self.use_pallas,
                    ),
                )
            elif kind == "mixed":
                mixed_cls = (
                    nn.remat(InceptionModule, static_argnums=(2,))
                    if self.remat
                    else InceptionModule
                )
                setattr(
                    self,
                    name,
                    mixed_cls(
                        spec["out"],
                        activation=act,
                        fold_bn=self.fold_bn,
                        fuse_1x1=self.fuse_1x1,
                        fuse_3x3=self.fuse_3x3,
                        use_pallas=self.use_pallas,
                        pallas_pool=self.pallas_pool,
                        fuse_pool_conv=self.fuse_pool_conv,
                        pool_impl=self.pool_impl,
                    ),
                )
        if self.last_relu == "leaky":
            # checkpoint-parity quirk: the reference's 'leaky' branch is DEAD
            # (I3D_doubled.py:321-325 — the following if/else resets
            # last_actf to None), so reference 'leaky' checkpoints trained
            # with NO final activation; reproduce that. 'leaky_fixed' gives
            # the evidently-intended semantics.
            act = None
        elif self.last_relu == "leaky_fixed":
            act = jax.nn.leaky_relu
        elif self.last_relu == "relu":
            act = jax.nn.relu
        else:
            act = None
        self.logits = Unit3D(
            self.num_classes,
            (1, 1, 1),
            use_batch_norm=False,
            use_bias=True,
            activation=act,
            use_pallas=self.use_pallas,
        )
        self.dropout = nn.Dropout(self.dropout_rate)

    def _layer_stride_t(self, name: str, default: int) -> int:
        return self.last_stride if name in self.stride_mod_layers else default

    def logits_pool_shape(self) -> Tuple[int, int, int]:
        if self.pool_shape is not None:
            return tuple(self.pool_shape)
        if not self.stride_mod_layers:
            return (2, 7, 7)
        # reference formula, I3D_doubled.py:316-318
        t = int(2 * ((2 / self.last_stride) ** len(self.stride_mod_layers)))
        return (t, 7, 7)

    def _apply_endpoint(self, name: str, kind: str, spec: dict, x, train: bool):
        if kind == "conv" or kind == "mixed":
            return getattr(self, name)(x, train)
        if kind == "pool":
            return max_pool3d_same(
                x, spec["window"], spec["stride"], impl=self.pool_impl
            )
        # spool
        st = self._layer_stride_t(name, spec["stride_t"])
        return max_pool3d_same(
            x,
            spec["window"],
            (st, spec["stride_hw"], spec["stride_hw"]),
            impl=self.pool_impl,
        )

    def _walk_trunk(
        self,
        x: jax.Array,
        train: bool,
        start_after: Optional[str] = None,
        stop_at: Optional[str] = None,
        sow: bool = False,
    ) -> jax.Array:
        """Apply trunk endpoints in order, optionally starting after /
        stopping at a named endpoint and sowing intermediates."""
        started = start_after is None
        for name, kind, spec in _TRUNK:
            if not started:
                started = name == start_after
                continue
            x = self._apply_endpoint(name, kind, spec, x, train)
            if sow:
                # key is "<endpoint>_out" — a bare endpoint name would
                # collide with the submodule scope of the same name
                self.sow("intermediates", f"{name}_out", x)
            if name == stop_at:
                return x
        return x

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, T, H, W, C) -> logits (B, num_classes) (or the activation
        at ``final_endpoint`` if that is a trunk endpoint)."""
        stop = self.final_endpoint if self.final_endpoint in TRUNK_ENDPOINTS else None
        x = self._walk_trunk(x, train, stop_at=stop, sow=True)
        if stop is not None:
            return x
        return self.head_from(x, "Mixed_5c", train)

    def extract_features(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Avg-pooled Mixed_5c features (reference Model.extract_features,
        I3D_doubled.py:382-388)."""
        feats = self.features_to(x, "Mixed_5c", train)
        return avg_pool3d_valid(feats, self.logits_pool_shape(), (1, 1, 1))

    def features_to(
        self, x: jax.Array, endpoint: str = "Mixed_5c", train: bool = False
    ) -> jax.Array:
        """Run the trunk up to and including ``endpoint`` — the Grad-CAM
        target activation."""
        assert endpoint in TRUNK_ENDPOINTS, endpoint
        return self._walk_trunk(x, train, stop_at=endpoint)

    def head_from(
        self, features: jax.Array, endpoint: str = "Mixed_5c", train: bool = False
    ) -> jax.Array:
        """Run the remainder of the net from ``endpoint`` activation to the
        final logits (incl. the Logits head: avg-pool -> dropout -> 1x1x1
        conv -> squeeze -> [softmax], I3D_doubled.py:310-333, 360-371).
        Grad-CAM differentiates this w.r.t. ``features``."""
        assert endpoint in TRUNK_ENDPOINTS, endpoint
        x = self._walk_trunk(features, train, start_after=endpoint)
        x = avg_pool3d_valid(x, self.logits_pool_shape(), (1, 1, 1))
        x = self.dropout(x, deterministic=not train)
        x = self.logits(x, train)
        if self.spatial_squeeze:
            x = x.squeeze(axis=(2, 3))  # (B, T', num_classes)
        if x.shape[1] == 1:
            out = x.squeeze(axis=1)
        elif self.temporal_mean:
            out = jnp.mean(x, axis=1)  # TF variant, models/i3d.py:467
        else:
            out = x  # (B, T', num_classes); torch returns (B, C, T') here
        # 'Predictions' endpoint == softmax head (reference VALID_ENDPOINTS;
        # TF variant's Predictions op, models/i3d.py:471-473)
        if self.softmax or self.final_endpoint == "Predictions":
            out = jax.nn.softmax(out, axis=-1)
        return out


def i3d_smth(num_classes: int = 174, **kw) -> I3D:
    """smth-smth variant: 16x224x224 inputs, pool (2,7,7) or stride-mod
    formula (I3D_doubled.py)."""
    return I3D(num_classes=num_classes, **kw)


def i3d_kth(num_classes: int = 6, final_time_length: int = 2, **kw) -> I3D:
    """KTH variant: 32-frame clips; Mixed_5c spatial extent for the
    reference's (120,160) frames is (4,5), so the Logits pool is
    ``(final_time_length, 4, 5)`` (I3D_doubled_kth.py:299-308). For
    (160,120)-oriented frames pass ``pool_shape=(t, 5, 4)``.
    """
    kw.setdefault("pool_shape", (final_time_length, 4, 5))
    return I3D(num_classes=num_classes, **kw)
