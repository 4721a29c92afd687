"""Pallas TPU kernels: 3x3x3 stride-1 zero-padded-SAME maxpool, fwd + bwd.

This is the Inception branch-3 pool (I3D_doubled.py:129-146 via
MaxPool3dSamePadding) — it appears 9 times in I3D and its XLA backward is a
27-element-window ``select_and_scatter``, measured at ~13 GB/s effective on
the bench chip (scripts/bench_pool.py) while convs hit ~150 TFLOP/s.

Design: grid = (B, T, C/128); each program reads (H, W, 128) slices of the
t-1 / t / t+1 frames (three BlockSpecs over the same array with clamped
index maps; border contributions are masked in-kernel to reproduce the
zero-padding), so the VMEM working set stays a few hundred KB per step:

  * forward: y[t] = max(hw9(x[t]), hw9(x[t-1]), hw9(x[t+1])) where hw9 is
    the separable 3x3 spatial shift-max;
  * backward (exact gather-form VJP of the window max):
    ``grad_in[t,h,w] = sum_{dt,dh,dw} (x[t,h,w] == y[t+dt,h+dh,w+dw]) *
    g[t+dt,h+dh,w+dw]`` — 27 VPU compare/select/add terms.

Equality runs on bf16 bit patterns (Mosaic rejects bf16 vector cmpf on
v5e); bit equality == float equality for the non-negative, non-NaN
post-ReLU activations this pool sees.

Tie semantics: where several window elements equal the max,
select_and_scatter routes the cotangent to ONE of them while this kernel
routes it to ALL that equal it. For post-ReLU activations ties are (a)
exact zeros, whose cotangent the preceding ReLU VJP kills anyway, or (b)
float collisions — gradients agree almost everywhere; the difference is
documented and the XLA path remains the default (``pallas_pool=False``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _shift(v: jax.Array, d: int, axis: int) -> jax.Array:
    """Shift with zero fill: result[i] = v[i + d] (d in {-1, 0, 1})."""
    if d == 0:
        return v
    z = jnp.zeros_like(jax.lax.slice_in_dim(v, 0, 1, axis=axis))
    if d == 1:
        return jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis), z], axis=axis
        )
    return jnp.concatenate(
        [z, jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)], axis=axis
    )


def _eq(a: jax.Array, b: jax.Array) -> jax.Array:
    """Equality in f32: v5e's VPU has no 16-bit vector compares (neither
    bf16 cmpf nor i16 cmpi lower); the bf16->f32 upcast is exact and the
    per-T-slice blocks keep the f32 temporaries tiny."""
    if a.dtype == jnp.bfloat16:
        return a.astype(jnp.float32) == b.astype(jnp.float32)
    return a == b


def _hw_max9(v: jax.Array) -> jax.Array:
    """Separable 3x3 spatial shift-max over (H, W, C) with zero fill."""
    for axis in (0, 1):
        v = jnp.maximum(jnp.maximum(v, _shift(v, 1, axis)), _shift(v, -1, axis))
    return v


def _gather9(x: jax.Array, y: jax.Array, g: jax.Array) -> jax.Array:
    """sum_{dh,dw} (x == y[.+dh, .+dw]) * g[.+dh, .+dw] over (H, W, C)."""
    acc = jnp.where(_eq(x, y), g, 0)
    for dh in (-1, 0, 1):
        ys_h = _shift(y, dh, 0) if dh else y
        gs_h = _shift(g, dh, 0) if dh else g
        for dw in (-1, 0, 1):
            if dh == 0 and dw == 0:
                continue
            ys = _shift(ys_h, dw, 1) if dw else ys_h
            gs = _shift(gs_h, dw, 1) if dw else gs_h
            acc = acc + jnp.where(_eq(x, ys), gs, 0)
    return acc


def _fwd_kernel(xp_ref, xc_ref, xn_ref, o_ref, *, t_dim: int):
    t = pl.program_id(1)
    c = _hw_max9(xc_ref[0, 0])
    p = _hw_max9(xp_ref[0, 0])
    n = _hw_max9(xn_ref[0, 0])
    zero = jnp.zeros_like(c)
    p = jnp.where(t > 0, p, zero)  # zero-pad at the temporal borders
    n = jnp.where(t < t_dim - 1, n, zero)
    o_ref[0, 0] = jnp.maximum(jnp.maximum(c, p), n)


def _bwd_kernel(
    xc_ref, yp_ref, yc_ref, yn_ref, gp_ref, gc_ref, gn_ref, o_ref, *, t_dim: int
):
    t = pl.program_id(1)
    x = xc_ref[0, 0]
    acc = _gather9(x, yc_ref[0, 0], gc_ref[0, 0])
    accp = _gather9(x, yp_ref[0, 0], gp_ref[0, 0])
    accn = _gather9(x, yn_ref[0, 0], gn_ref[0, 0])
    zero = jnp.zeros_like(acc)
    acc = acc + jnp.where(t > 0, accp, zero)
    acc = acc + jnp.where(t < t_dim - 1, accn, zero)
    o_ref[0, 0] = acc


def _pad_c(x: jax.Array):
    c = x.shape[-1]
    cp = -(-c // _LANES) * _LANES
    if cp != c:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, cp - c)])
    return x, c, cp


def _slice_spec(h, w, t_dim, dt):
    def index_map(b, t, cb):
        tt = t + dt
        tt = jnp.clip(tt, 0, t_dim - 1)
        return (b, tt, 0, 0, cb)

    return pl.BlockSpec(
        (1, 1, h, w, _LANES), index_map, memory_space=pltpu.VMEM
    )


def _run_fwd(x: jax.Array) -> jax.Array:
    xp, c, cp = _pad_c(x)
    b, t, h, w, _ = xp.shape
    y = pl.pallas_call(
        partial(_fwd_kernel, t_dim=t),
        grid=(b, t, cp // _LANES),
        in_specs=[_slice_spec(h, w, t, d) for d in (-1, 0, 1)],
        out_specs=_slice_spec(h, w, t, 0),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xp, xp, xp)
    return y[..., :c] if cp != c else y


def _run_bwd(x: jax.Array, y: jax.Array, g: jax.Array) -> jax.Array:
    xp, c, cp = _pad_c(x)
    yp, _, _ = _pad_c(y)
    gp, _, _ = _pad_c(g)
    b, t, h, w, _ = xp.shape
    specs = [_slice_spec(h, w, t, 0)] + [
        _slice_spec(h, w, t, d) for d in (-1, 0, 1)
    ] * 2
    gi = pl.pallas_call(
        partial(_bwd_kernel, t_dim=t),
        grid=(b, t, cp // _LANES),
        in_specs=specs,
        out_specs=_slice_spec(h, w, t, 0),
        out_shape=jax.ShapeDtypeStruct(xp.shape, g.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xp, yp, yp, yp, gp, gp, gp)
    return gi[..., :c] if cp != c else gi


@jax.custom_vjp
def pallas_maxpool3d_s1(x: jax.Array) -> jax.Array:
    """3x3x3 stride-1 zero-padded SAME maxpool over (B, T, H, W, C)."""
    return _run_fwd(x)


def _vjp_fwd(x):
    y = _run_fwd(x)
    return y, (x, y)


def _vjp_bwd(res, g):
    x, y = res
    return (_run_bwd(x, y, g),)


pallas_maxpool3d_s1.defvjp(_vjp_fwd, _vjp_bwd)
