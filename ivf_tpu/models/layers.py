"""Shared Flax layers with torch-exact semantics.

``TorchBatchNorm`` reproduces ``torch.nn.BatchNorm{2,3}d`` bit-for-bit:
 * train: normalize by batch mean / *biased* batch var; running stats update
   uses the *unbiased* var with ``running = (1-m)*running + m*batch``
   (torch's ``momentum`` is the new-sample weight — opposite of flax's).
 * eval: normalize by running stats.
The I3D reference uses eps=1e-3, momentum=0.01
(``video_features_pytorch/models/I3D_doubled.py:75``); the ConvLSTM stack
uses eps=1e-5, momentum=0.1 (``models/convolution_lstm.py:85``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ivf_tpu.ops.conv import conv3d_same


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing channel axis, torch semantics."""

    eps: float = 1e-3
    momentum: float = 0.01  # torch convention: weight of the new batch stat

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, fold: bool = False
    ) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if fold:
            # return the inference-mode affine (s, t) with y = x*s + t so the
            # caller can fold BN into a preceding conv's kernel/bias
            s = scale * jax.lax.rsqrt(ra_var.value + self.eps)
            return s, bias - ra_mean.value * s

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.var(x, axis=reduce_axes)  # biased, used for normalization
            n = x.size // c
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class Unit3D(nn.Module):
    """Conv3D(SAME) -> BN -> activation, the I3D building block.

    Mirrors ``Unit3D`` in the reference (I3D_doubled.py:43-118): dynamic
    TF-SAME padding (static here), conv without bias when BN is on,
    BN(eps=1e-3, momentum=0.01), then ReLU by default.
    """

    out_channels: int
    kernel_shape: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: Callable | None = jax.nn.relu
    s2d: bool = False  # space-to-depth stem formulation (7x7x7 s2 only)
    fold_bn: bool = True  # at inference, fold BN into the conv kernel/bias
    # (one conv HLO instead of conv + 5-6 BN elementwise HLOs; identical
    # math up to float reassociation)
    use_pallas: bool = False  # 1x1x1 stride-1 convs via the Pallas MXU
    # matmul kernel with bias+ReLU fused in the epilogue (pointwise_conv.py)

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_folded: bool = False
    ):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (*self.kernel_shape, cin, self.out_channels),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        folding = self.use_batch_norm and self.fold_bn and not train
        if self.use_batch_norm:
            bn = TorchBatchNorm(eps=1e-3, momentum=0.01, name="bn")
            if folding:
                s, t = bn(jnp.zeros((1, self.out_channels)), fold=True)
                kernel = kernel * s
                bias = t if bias is None else bias * s + t
        if return_folded:
            # for cross-branch fusion: caller runs the conv itself
            assert folding, "return_folded requires inference-mode BN folding"
            return kernel, bias
        if (
            self.use_pallas
            and tuple(self.kernel_shape) == (1, 1, 1)
            and tuple(self.stride) == (1, 1, 1)
        ):
            from ivf_tpu.ops.pallas.pointwise_conv import pallas_pointwise_conv

            relu_fused = (
                self.activation is jax.nn.relu
                and (folding or not self.use_batch_norm)
            )
            x = pallas_pointwise_conv(
                x.astype(kernel.dtype),
                kernel.reshape(cin, self.out_channels),
                bias,
                relu=relu_fused,
            )
            if self.use_batch_norm and not folding:
                x = bn(x, train=train)
            if self.activation is not None and not relu_fused:
                x = self.activation(x)
            return x
        if (
            self.s2d
            and tuple(self.kernel_shape) == (7, 7, 7)
            and tuple(self.stride) == (2, 2, 2)
            and all(d % 2 == 0 for d in x.shape[1:4])
        ):
            from ivf_tpu.ops.conv import conv3d_stem_s2d

            x = conv3d_stem_s2d(x, kernel, bias)
        else:
            x = conv3d_same(x, kernel, tuple(self.stride), bias)
        if self.use_batch_norm and not folding:
            x = bn(x, train=train)
        if self.activation is not None:
            x = self.activation(x)
        return x


class InceptionModule(nn.Module):
    """4-branch Inception block (I3D_doubled.py:121-146).

    out_channels = [b0, b1a, b1b, b2a, b2b, b3b]; output is the channel
    concat of branch outputs in order (b0, b1, b2, b3).
    """

    out_channels: Sequence[int]
    activation: Callable = jax.nn.relu
    fold_bn: bool = True
    fuse_1x1: bool = True  # at inference, run the three parallel 1x1x1
    # branch convs (b0, b1a, b2a — same input) as ONE conv, splitting the
    # output channels after the shared ReLU
    fuse_3x3: object = False  # at inference, run the two 3x3x3 branch convs
    # as one block-diagonal conv over the contiguous [b1in; b2in] slice —
    # ~1.4x the FLOPs for half the ops. Off by default: measured net-negative
    # for the smth config (the big 28^2 layers are FLOP-bound)
    use_pallas: bool = False
    pallas_pool: bool = False  # branch-3 pool via the Pallas fwd/bwd kernel
    # pair (ops/pallas/maxpool3d.py) — bypasses XLA's select_and_scatter
    # backward; gradient ties route to all maxima instead of one (see the
    # kernel docstring); bit-identical forward
    pool_impl: str = "reduce_window"  # 'shift': branch-3 pool as a
    # separable shifted-slice max chain — elementwise-select VJP instead of
    # XLA select_and_scatter (see ops/conv.py::max_pool3d_same)
    fuse_pool_conv: object = False  # whole branch 3 (pool + folded-BN
    # 1x1x1 conv + bias + ReLU) as ONE Pallas kernel fwd and ONE bwd
    # (ops/pallas/fused_branch3.py): the pooled tensor never round-trips
    # HBM and select_and_scatter+conv-transpose collapse into one kernel.
    # True: per-(b, t) grid (each frame read 3x fwd / 5x bwd);
    # 'tblock': whole-T frame-block grid (round 5 — each frame read once).
    # Same tie-semantics note as pallas_pool. Inference/mask-search only
    # (requires folded BN); falls back when folding conditions don't hold

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from ivf_tpu.ops.conv import max_pool3d_same

        oc = self.out_channels
        act = self.activation
        fb = self.fold_bn
        up = self.use_pallas
        mods = {
            "b0": Unit3D(oc[0], (1, 1, 1), activation=act, fold_bn=fb,
                         use_pallas=up, name="b0"),
            "b1a": Unit3D(oc[1], (1, 1, 1), activation=act, fold_bn=fb,
                          use_pallas=up, name="b1a"),
            "b2a": Unit3D(oc[3], (1, 1, 1), activation=act, fold_bn=fb,
                          use_pallas=up, name="b2a"),
        }
        b1b = Unit3D(oc[2], (3, 3, 3), activation=act, fold_bn=fb, name="b1b")
        b2b = Unit3D(oc[4], (3, 3, 3), activation=act, fold_bn=fb, name="b2b")
        fusing = fb and not train and act is jax.nn.relu
        if self.fuse_1x1 and fusing:
            parts = [mods[k](x, return_folded=True) for k in ("b0", "b1a", "b2a")]
            kcat = jnp.concatenate([k for k, _ in parts], axis=-1)
            bcat = jnp.concatenate([b for _, b in parts])
            if up:
                from ivf_tpu.ops.pallas.pointwise_conv import (
                    pallas_pointwise_conv,
                )

                y = pallas_pointwise_conv(
                    x.astype(kcat.dtype),
                    kcat.reshape(x.shape[-1], -1),
                    bcat,
                    relu=True,
                )
            else:
                y = act(conv3d_same(x, kcat, (1, 1, 1), bcat))
            b0 = y[..., : oc[0]]
            b1 = y[..., oc[0] : oc[0] + oc[1]]
            b2 = y[..., oc[0] + oc[1] :]
        else:
            b0 = mods["b0"](x, train)
            b1 = mods["b1a"](x, train)
            b2 = mods["b2a"](x, train)
        # 'auto' fuses only small-spatial blocks (<=14^2), where per-op
        # overhead dominates and the block-diag FLOP premium is cheap
        fuse3 = self.fuse_3x3 is True or (
            self.fuse_3x3 == "auto" and x.shape[2] <= 14
        )
        if fuse3 and fusing:
            # folded kernels of both 3x3x3 branches in one block-diag conv
            dummy1 = jnp.zeros((1, 1, 1, 1, oc[1]), x.dtype)
            dummy2 = jnp.zeros((1, 1, 1, 1, oc[3]), x.dtype)
            k1, c1 = b1b(dummy1, return_folded=True)
            k2, c2 = b2b(dummy2, return_folded=True)
            kd = jnp.zeros(
                (3, 3, 3, oc[1] + oc[3], oc[2] + oc[4]), k1.dtype
            )
            kd = kd.at[..., : oc[1], : oc[2]].set(k1)
            kd = kd.at[..., oc[1] :, oc[2] :].set(k2)
            b12in = jnp.concatenate([b1, b2], axis=-1)
            y2 = act(
                conv3d_same(b12in, kd, (1, 1, 1), jnp.concatenate([c1, c2]))
            )
            b1 = y2[..., : oc[2]]
            b2 = y2[..., oc[2] :]
        else:
            b1 = b1b(b1, train)
            b2 = b2b(b2, train)
        b3b = Unit3D(
            oc[5], (1, 1, 1), activation=act, fold_bn=fb, use_pallas=up,
            name="b3b",
        )
        if self.fuse_pool_conv and fusing:
            from ivf_tpu.ops.pallas import fused_branch3

            fused = (
                fused_branch3.fused_pool_conv_tblock
                if self.fuse_pool_conv == "tblock"
                else fused_branch3.fused_pool_conv
            )
            k3, c3 = b3b(
                jnp.zeros((1, 1, 1, 1, x.shape[-1]), x.dtype),
                return_folded=True,
            )
            b3 = fused(x, k3.reshape(x.shape[-1], oc[5]), c3, True)
        else:
            if self.pallas_pool:
                from ivf_tpu.ops.pallas.maxpool3d import pallas_maxpool3d_s1

                b3 = pallas_maxpool3d_s1(x)
            else:
                b3 = max_pool3d_same(x, (3, 3, 3), (1, 1, 1), impl=self.pool_impl)
            b3 = b3b(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
