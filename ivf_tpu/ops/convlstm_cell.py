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


def fused_gate_math(
    gates_x: jax.Array, gates_h: jax.Array | None, c: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Elementwise LSTM gate block. gates_*: (..., 4*H) in (i,f,c,o) order;
    gates_h may be None when the x/h convs were already merged."""
    hidden = c.shape[-1]
    z = gates_x if gates_h is None else gates_x + gates_h
    zi, zf, zc, zo = (
        z[..., :hidden],
        z[..., hidden : 2 * hidden],
        z[..., 2 * hidden : 3 * hidden],
        z[..., 3 * hidden :],
    )
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    new_c = f * c + i * jnp.tanh(zc)
    o = jax.nn.sigmoid(zo)
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
) -> Tuple[jax.Array, jax.Array]:
    """One ConvLSTM timestep.

    x: (B, H, W, Cin); h, c: (B, H', W', Ch) where H' = H // conv_stride.
    wx: (k, k, Cin, 4*Ch) with bias bx (4*Ch,); wh: (k, k, Ch, 4*Ch), no bias
    (reference gives hidden convs ``bias=False``, convolution_lstm.py:26-32).

    Input convs use torch symmetric padding (k-1)//2 with ``conv_stride``;
    hidden convs are always stride 1 (reference lines 25-32).
    Returns (new_h, new_c).

    When ``conv_stride == 1`` the x- and h-convolutions share stride and
    padding, so they run as ONE conv over the channel-concat
    ``[x; h] * [wx; wh]`` — identical math, half the conv ops per step.
    """
    if conv_stride == 1 and x.shape[1:3] == h.shape[1:3]:
        xh = jnp.concatenate([x, h.astype(x.dtype)], axis=-1)
        w = jnp.concatenate([wx, wh.astype(wx.dtype)], axis=-2)
        gates = conv2d_same_torch(xh, w, stride=1, bias=bx)
        gates_x, gates_h = gates, None
    else:
        gates_x = conv2d_same_torch(x, wx, stride=conv_stride, bias=bx)
        gates_h = conv2d_same_torch(h, wh, stride=1)
    if use_pallas:
        from ivf_tpu.ops.pallas.fused_gates import pallas_gate_math

        return pallas_gate_math(gates_x, gates_h, c)
    return fused_gate_math(gates_x, gates_h, c)
