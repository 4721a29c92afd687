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
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
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
        x = conv3d_same(x, kernel, tuple(self.stride), bias)
        if self.use_batch_norm:
            x = TorchBatchNorm(eps=1e-3, momentum=0.01, name="bn")(x, train=train)
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from ivf_tpu.ops.conv import max_pool3d_same

        oc = self.out_channels
        act = self.activation
        b0 = Unit3D(oc[0], (1, 1, 1), activation=act, name="b0")(x, train)
        b1 = Unit3D(oc[1], (1, 1, 1), activation=act, name="b1a")(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), activation=act, name="b1b")(b1, train)
        b2 = Unit3D(oc[3], (1, 1, 1), activation=act, name="b2a")(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), activation=act, name="b2b")(b2, train)
        b3 = max_pool3d_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), activation=act, name="b3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
