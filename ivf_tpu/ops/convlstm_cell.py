"""Fused ConvLSTM cell step.

The reference cell (``video_features_pytorch/models/convolution_lstm.py:10-48``)
issues **8 separate Conv2d calls** per timestep per layer (Wxi, Whi, Wxf, Whf,
Wxc, Whc, Wxo, Who) and adds "peephole" terms ``c * Wci`` etc. whose weights
are zero constants created in ``init_hidden`` (lines 50-60) and never trained
— i.e. mathematically absent. TPU-native redesign:

  * the 4 input-to-hidden convs fuse into ONE conv producing ``4*hidden``
    channels (a single large MXU matmul per step instead of 4 small ones);
    likewise the 4 hidden-to-hidden convs — 2 convs/step instead of 8;
  * the peephole no-op terms are dropped (bit-identical output);
  * the gate nonlinearities + state update are a single fused elementwise
    block (``fused_gate_math``) that XLA fuses into the conv epilogue; an
    optional Pallas kernel provides the same op hand-fused.

Gate order inside the fused channel dim is ``(i, f, c, o)``. A checkpoint
importer concatenates the reference's separate ``Wx{i,f,c,o}``/``Wh{i,f,c,o}``
kernels along the output-channel axis in this order.

Gate math (reference lines 43-48, with zero peepholes elided)::

    i = sigmoid(conv(x, Wxi) + bxi + conv(h, Whi))
    f = sigmoid(conv(x, Wxf) + bxf + conv(h, Whf))
    c' = f * c + i * tanh(conv(x, Wxc) + bxc + conv(h, Whc))
    o = sigmoid(conv(x, Wxo) + bxo + conv(h, Who))
    h' = o * tanh(c')
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ivf_tpu.ops.conv import conv2d_same_torch


def keras_hard_sigmoid(x: jax.Array) -> jax.Array:
    """Keras's hard_sigmoid: clip(0.2*x + 0.5, 0, 1). NOTE this is NOT
    ``jax.nn.hard_sigmoid`` (slope 1/6); Keras uses slope 0.2 — the gate
    activation of Keras ConvLSTM2D (video_features_tf/models/clstm.py:21)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def fused_gate_math(
    gates_x: jax.Array,
    gates_h: jax.Array | None,
    c: jax.Array,
    recurrent_activation: str = "sigmoid",
) -> Tuple[jax.Array, jax.Array]:
    """Elementwise LSTM gate block. gates_*: (..., 4*H) in (i,f,c,o) order;
    gates_h may be None when the x/h convs were already merged.

    ``recurrent_activation='hard_sigmoid'`` reproduces the Keras ConvLSTM2D
    gate nonlinearity for the TF model family."""
    hidden = c.shape[-1]
    z = gates_x if gates_h is None else gates_x + gates_h
    zi, zf, zc, zo = (
        z[..., :hidden],
        z[..., hidden : 2 * hidden],
        z[..., 2 * hidden : 3 * hidden],
        z[..., 3 * hidden :],
    )
    act = (
        keras_hard_sigmoid
        if recurrent_activation == "hard_sigmoid"
        else jax.nn.sigmoid
    )
    i = act(zi)
    f = act(zf)
    new_c = f * c + i * jnp.tanh(zc)
    o = act(zo)
    new_h = o * jnp.tanh(new_c)
    return new_h, new_c


def convlstm_cell_step(
    x: jax.Array,
    h: jax.Array,
    c: jax.Array,
    wx: jax.Array,
    bx: jax.Array,
    wh: jax.Array,
    conv_stride: int = 1,
    use_pallas: bool = False,
    recurrent_activation: str = "sigmoid",
    x_padding: str = "torch",
) -> Tuple[jax.Array, jax.Array]:
    """One ConvLSTM timestep.

    x: (B, H, W, Cin); h, c: (B, H', W', Ch).
    wx: (k1, k2, Cin, 4*Ch) with bias bx (4*Ch,); wh: (k1, k2, Ch, 4*Ch), no
    bias (reference gives hidden convs ``bias=False``,
    convolution_lstm.py:26-32). Kernels may be rectangular (the TF KTH
    config uses (3, 5), config_train_kth_clstm.py:28-33).

    ``x_padding='torch'``: input conv uses torch symmetric padding
    (k-1)//2 (the torch family). ``x_padding='valid'``: no input padding —
    Keras ConvLSTM2D with padding='valid' (the TF KTH/smth configs). The
    hidden conv is always stride 1 with 'same'-style symmetric padding
    (Keras pads the recurrent conv SAME regardless of the input padding).
    Returns (new_h, new_c).

    When stride is 1 and both convs share padding, the x- and h-convs run
    as ONE conv over the channel-concat ``[x; h] * [wx; wh]`` — identical
    math, half the conv ops per step.
    """
    if (
        x_padding == "torch"
        and conv_stride == 1
        and x.shape[1:3] == h.shape[1:3]
    ):
        xh = jnp.concatenate([x, h.astype(x.dtype)], axis=-1)
        w = jnp.concatenate([wx, wh.astype(wx.dtype)], axis=-2)
        gates = conv2d_same_torch(xh, w, stride=1, bias=bx)
        gates_x, gates_h = gates, None
    else:
        px = (0, 0) if x_padding == "valid" else None
        gates_x = conv2d_same_torch(
            x, wx, stride=conv_stride, bias=bx, torch_padding=px
        )
        gates_h = conv2d_same_torch(h, wh, stride=1)
    if use_pallas and recurrent_activation == "sigmoid":
        from ivf_tpu.ops.pallas.fused_gates import pallas_gate_math

        return pallas_gate_math(gates_x, gates_h, c)
    return fused_gate_math(gates_x, gates_h, c, recurrent_activation)
