"""Pallas kernel: fused ConvLSTM gate nonlinearities + state update.

The gate block is elementwise over five equal-shaped operands
(zi, zf, zc, zo, c) producing (new_h, new_c); semantic layout is irrelevant,
so we flatten every operand to lane-aligned ``(rows, 128)`` tiles and run one
VPU pass — 2 outputs written per 5 inputs read, one trip through VMEM instead
of the ~9 intermediate arrays a naive composition would materialize.

This mirrors the math of the reference cell
(``video_features_pytorch/models/convolution_lstm.py:43-48``) minus its
zero-constant peephole terms (see ops/convlstm_cell.py docstring).

Like the sibling kernels (pointwise_conv, maxpool3d, fused_branch3) it
carries a custom VJP — the mask search and training both need gradients
through the cell — with the backward computed by the equivalent jnp math
(elementwise, so the recompute is cheap and the gradient exact).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 256  # 256*128 f32 = 128 KiB per operand; 7 operands ~ 0.9 MiB VMEM


def _gate_kernel(zi_ref, zf_ref, zc_ref, zo_ref, c_ref, h_out_ref, c_out_ref):
    i = jax.nn.sigmoid(zi_ref[:])
    f = jax.nn.sigmoid(zf_ref[:])
    new_c = f * c_ref[:] + i * jnp.tanh(zc_ref[:])
    h_out_ref[:] = jax.nn.sigmoid(zo_ref[:]) * jnp.tanh(new_c)
    c_out_ref[:] = new_c


def _to_tiles(x: jax.Array, rows: int) -> jax.Array:
    flat = x.reshape(-1)
    pad = rows * _LANES - flat.shape[0]
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(rows, _LANES)


def _ref_math(z: jax.Array, c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """jnp twin of the kernel (sigmoid gates) — the VJP reference."""
    zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    new_c = f * c + i * jnp.tanh(zc)
    return jax.nn.sigmoid(zo) * jnp.tanh(new_c), new_c


def _forward(z: jax.Array, c: jax.Array, interpret: bool):
    zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
    n_elem = c.size
    rows = -(-n_elem // _LANES)
    rows = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS  # round up to block multiple
    tiles = [_to_tiles(a, rows) for a in (zi, zf, zc, zo, c)]

    grid = (rows // _BLOCK_ROWS,)
    spec = pl.BlockSpec(
        (_BLOCK_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, _LANES), c.dtype)
    new_h, new_c = pl.pallas_call(
        _gate_kernel,
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(*tiles)
    new_h = new_h.reshape(-1)[:n_elem].reshape(c.shape)
    new_c = new_c.reshape(-1)[:n_elem].reshape(c.shape)
    return new_h, new_c


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gate_core(interpret: bool, z: jax.Array, c: jax.Array):
    return _forward(z, c, interpret)


def _gate_core_fwd(interpret, z, c):
    return _forward(z, c, interpret), (z, c)


def _gate_core_bwd(interpret, res, g):
    z, c = res
    _, vjp = jax.vjp(_ref_math, z, c)
    return vjp(g)


_gate_core.defvjp(_gate_core_fwd, _gate_core_bwd)


def pallas_gate_math(
    gates_x: jax.Array,
    gates_h: Optional[jax.Array],
    c: jax.Array,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.convlstm_cell.fused_gate_math (sigmoid
    recurrent activation). ``interpret`` defaults to auto: Pallas interpret
    mode off-TPU (the virtual CPU mesh), compiled on TPU — same detection
    as the sibling kernels."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    z = gates_x if gates_h is None else gates_x + gates_h
    return _gate_core(bool(interpret), z, c)
