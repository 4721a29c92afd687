"""Pallas MXU kernel: fused pointwise (1x1x1) conv + bias + ReLU.

A 1x1x1 conv is a channel matmul over N = B*T*H*W positions; I3D spends
~40% of its conv count on them (every Inception branch entry + the logits
head). This kernel runs the matmul on the MXU with the bias add and ReLU
fused into the epilogue — one HLO for what is otherwise conv+add+relu
(valuable on backends with high per-op overhead; see PERF.md).

Grid: (N/TN, Cout/TC); each program brings a (TN, Cin) row block and a
(Cin, TC) weight block to VMEM, accumulates in f32, applies bias+ReLU and
writes (TN, TC). Inputs are zero-padded to tile multiples (zeros are
harmless: extra rows are dropped, padded Cin contributes 0 to the dot).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256  # rows per program
_TC = 128  # output channels per program (lane width)


def _kernel(x_ref, w_ref, b_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pw_conv(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    relu: bool,
    interpret: Optional[bool],
):
    return _pw_impl(x, w, bias, relu, interpret)


def _pw_fwd(x, w, bias, relu, interpret):
    y = _pw_impl(x, w, bias, relu, interpret)
    return y, (x, w, y if relu else None, bias)


def _pw_bwd(relu, interpret, res, g):
    """VJP: m = g * (y > 0); dx = m @ w.T (via the same Pallas kernel);
    dw = x.T @ m; db = sum(m). Model params are usually closed-over
    constants (the mask search), so dw/db get dead-code-eliminated."""
    x, w, y, bias = res
    m = jnp.where(y > 0, g, 0) if relu else g
    dx = _pw_impl(m, w.T, None, False, interpret)
    cin, cout = w.shape
    n = 1
    for d in x.shape[:-1]:
        n *= d
    dw = jnp.einsum(
        "nc,nd->cd",
        x.reshape(n, cin).astype(jnp.float32),
        m.reshape(n, cout).astype(jnp.float32),
    ).astype(w.dtype)
    db = jnp.sum(m.reshape(n, cout).astype(jnp.float32), axis=0).astype(
        bias.dtype  # cotangent dtype must match the bias primal, not g
    )
    return dx, dw, db


_pw_conv.defvjp(_pw_fwd, _pw_bwd)


def pallas_pointwise_conv(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    relu: bool = True,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x: (..., Cin); w: (Cin, Cout); bias: (Cout,) or None.
    Returns (..., Cout) with the same leading shape. Differentiable via a
    custom VJP (the dx path reuses the kernel with w.T).

    ``interpret``: None (default) auto-selects — Pallas interpreter
    off-TPU, compiled kernel on TPU; an explicit True/False overrides."""
    b = bias if bias is not None else jnp.zeros((w.shape[1],), x.dtype)
    return _pw_conv(x, w, b, relu, interpret)


@partial(jax.jit, static_argnames=("relu", "interpret"))
def _pw_impl(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array],
    relu: bool,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    cin, cout = w.shape
    n = 1
    for d in lead:
        n *= d
    x2 = x.reshape(n, cin)

    n_pad = _round_up(max(n, 1), _TN)
    cin_pad = _round_up(cin, 128)
    cout_pad = _round_up(cout, _TC)
    if n_pad != n or cin_pad != cin:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, cin_pad - cin)))
    wp = jnp.pad(w, ((0, cin_pad - cin), (0, cout_pad - cout)))
    b = bias if bias is not None else jnp.zeros((cout,), x.dtype)
    bp = jnp.pad(b, (0, cout_pad - cout)).reshape(1, cout_pad)

    grid = (n_pad // _TN, cout_pad // _TC)
    out = pl.pallas_call(
        partial(_kernel, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TN, cin_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin_pad, _TC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TN, _TC), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, cout_pad), x.dtype),
        interpret=interpret,
    )(x2, wp, bp)
    return out[:n, :cout].reshape(*lead, cout)
