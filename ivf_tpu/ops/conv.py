"""3D conv / pool primitives with the reference's exact padding semantics.

Layout is TPU-native channels-last throughout:
  * activations: ``(B, T, H, W, C)``  (NDHWC)
  * conv kernels: ``(kT, kH, kW, Cin, Cout)``  (DHWIO)

Parity notes vs the reference (``video_features_pytorch/models/I3D_doubled.py``):
  * ``conv3d_same``   <- Unit3D's dynamic SAME pad + Conv3d (lines 77-109).
  * ``max_pool3d_same`` <- MaxPool3dSamePadding (lines 8-40). The reference
    pads with **zeros** (``F.pad`` default) before max-pooling, *not* -inf as
    TF SAME pooling would; we replicate the zero-pad exactly. (In I3D every
    pooled activation is post-ReLU so the two agree, but parity is parity.)
  * ``avg_pool3d_valid`` <- torch ``nn.AvgPool3d`` in the Logits head
    (lines 310-318): VALID padding, count includes the full window.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ivf_tpu.ops.padding import explicit_same_padding

_CONV3D_DIMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)
_CONV2D_DIMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def conv3d_same(
    x: jax.Array,
    kernel: jax.Array,
    strides: Sequence[int] = (1, 1, 1),
    bias: jax.Array | None = None,
    preferred_dtype=None,
) -> jax.Array:
    """3D convolution with TF-SAME (asymmetric) padding.

    x: (B, T, H, W, C); kernel: (kT, kH, kW, Cin, Cout).

    Mixed precision: the activation is cast to the kernel dtype (bf16 params
    => bf16 MXU inputs). Output dtype follows the kernel (the MXU still
    accumulates f32 internally for bf16); forcing an f32 output with bf16
    operands would break the conv transpose rule in the backward pass.
    """
    pad = explicit_same_padding(x.shape[1:4], kernel.shape[:3], strides)
    out = lax.conv_general_dilated(
        x.astype(kernel.dtype),
        kernel,
        window_strides=tuple(strides),
        padding=pad,
        dimension_numbers=_CONV3D_DIMS,
        preferred_element_type=preferred_dtype or kernel.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def conv2d_same_torch(
    x: jax.Array,
    kernel: jax.Array,
    stride: int = 1,
    bias: jax.Array | None = None,
    torch_padding: int | None = None,
    preferred_dtype=None,
) -> jax.Array:
    """2D convolution matching torch ``nn.Conv2d(padding=p)`` semantics.

    The reference ConvLSTM cell uses symmetric torch padding
    ``p = (k-1)//2`` (``models/convolution_lstm.py:23-32``), which for odd
    kernels and stride 1 equals SAME but for stride>1 differs from TF SAME —
    so we reproduce torch's symmetric padding exactly.

    x: (B, H, W, C); kernel: (kH, kW, Cin, Cout).
    """
    if torch_padding is None:
        torch_padding = (
            (kernel.shape[0] - 1) // 2,
            (kernel.shape[1] - 1) // 2,
        )
    if isinstance(torch_padding, int):
        torch_padding = (torch_padding, torch_padding)
    p1, p2 = torch_padding
    out = lax.conv_general_dilated(
        x.astype(kernel.dtype),
        kernel,
        window_strides=(stride, stride),
        padding=((p1, p1), (p2, p2)),
        dimension_numbers=_CONV2D_DIMS,
        preferred_element_type=preferred_dtype or kernel.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def conv3d_stem_s2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Space-to-depth formulation of the I3D stem conv (7x7x7, stride 2,
    TF-SAME) — mathematically identical, ~2x faster on TPU.

    A Cin=3 conv uses 3/128 MXU lanes; regrouping 2x2x2 input blocks into
    channels gives Cin=24 with a 4x4x4 stride-1 kernel. Derivation: SAME
    padding for k=7,s=2 on even sizes is (2,3); zero-padding the kernel to 8
    makes every output tap a whole number of 2-blocks -> block-domain conv
    with kernel 4, stride 1, padding (1,2). The (7,7,7,Cin,Cout) parameter is
    reshaped at apply time, so checkpoints are untouched.

    Requires: kernel 7^3, implied stride 2, all of (T,H,W) even.
    """
    kt, kh, kw, cin, cout = kernel.shape
    assert (kt, kh, kw) == (7, 7, 7), "s2d stem specialized for 7x7x7"
    b, t, h, w, _ = x.shape
    assert t % 2 == 0 and h % 2 == 0 and w % 2 == 0, (t, h, w)

    # kernel: pad 7 -> 8 at the high side of each spatial dim, regroup
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    k8 = k8.reshape(4, 2, 4, 2, 4, 2, cin, cout)
    k_s2d = jnp.transpose(k8, (0, 2, 4, 1, 3, 5, 6, 7)).reshape(
        4, 4, 4, 8 * cin, cout
    )
    # input: (B, T/2, 2, H/2, 2, W/2, 2, C) -> blocks to channels, matching
    # the kernel's (2t, 2h, 2w, C) flatten order
    xb = x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, cin)
    xb = jnp.transpose(xb, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        b, t // 2, h // 2, w // 2, 8 * cin
    )
    out = lax.conv_general_dilated(
        xb.astype(k_s2d.dtype),
        k_s2d,
        window_strides=(1, 1, 1),
        padding=((1, 2), (1, 2), (1, 2)),
        dimension_numbers=_CONV3D_DIMS,
        preferred_element_type=k_s2d.dtype,
    )
    if bias is not None:
        out = out + bias
    return out


def max_pool3d_same(
    x: jax.Array,
    window: Sequence[int],
    strides: Sequence[int],
    impl: str = "reduce_window",
) -> jax.Array:
    """Max pool with the reference's zero-padded SAME (I3D_doubled.py:8-40).

    ``impl='reduce_window'`` (default): explicit zero-pad (matching
    ``F.pad`` + VALID MaxPool3d) + VALID max reduce-window. Its VJP is
    XLA's ``select_and_scatter`` — measured at ~13 GB/s effective on the
    bench chip (scripts/bench_pool.py), the slowest op class in the mask
    search.

    ``impl='shift'``: the same pool as a separable chain of shifted-slice
    ``jnp.maximum`` ops (max over the box == sequential max over dims).
    Identical forward values; the VJP is fused elementwise selects instead
    of select_and_scatter. Gradient ties split 0.5/0.5 per pairwise max
    (JAX ``balanced_eq``) where torch routes to one window element — the
    same documented deviation class as ops/pallas/maxpool3d.py, opt-in via
    the models' ``pool_impl`` knob.

    ``impl='eqbwd'`` / ``impl='argmax'``: custom stencil VJPs for the
    stride-1 (branch) pools — see ``_max_pool3d_same_eqbwd`` /
    ``_max_pool3d_same_argmax``; strided trunk pools (and, for 'argmax',
    non-16-bit dtypes) fall through to the native path. 'argmax' is the
    measured winner on the bench chip (+9% mask-steps/s, PERF.md).

    ``impl='argmax_full'``: 'argmax' extended to the strided trunk pools
    via ``_max_pool3d_same_argmax_strided`` (dilated-pad scatter VJP).
    Kept opt-in: the combined program trips the axon remote compiler
    (HTTP 500) at the production batch, the same failure mode as remat
    at batch 192+ (PERF.md).

    ``impl='argmax_shift'``: argmax VJP on the stride-1 branch pools +
    the shift chain on the strided trunk pools — the mixed combo that
    avoids select_and_scatter everywhere while staying compilable where
    'argmax_full' is not. Same tie-gradient deviation class as its parts.
    """
    if impl == "eqbwd" and tuple(strides) == (1, 1, 1):
        # eq-stencil VJP applies to the stride-1 (branch) pools — where the
        # select_and_scatter cost lives; strided trunk pools fall through
        # to the native path
        return _max_pool3d_same_eqbwd(x, tuple(window), tuple(strides))
    if impl in ("argmax", "argmax_full", "argmax_shift") and x.dtype in (
        jnp.bfloat16,
        jnp.float16,
    ):
        # argmax-index VJP: fewest-byte stencil (uint8 index plane instead
        # of the x/y value planes); 16-bit dtypes only (the packed uint32
        # reduce needs the value in 16 bits) — others fall through native
        if tuple(strides) == (1, 1, 1):
            return _max_pool3d_same_argmax(x, tuple(window), tuple(strides))
        if impl == "argmax_full":
            return _max_pool3d_same_argmax_strided(
                x, tuple(window), tuple(strides), x.shape
            )
    pad = explicit_same_padding(x.shape[1:4], window, strides)
    pad_cfg = ((0, 0),) + tuple(pad) + ((0, 0),)
    x = jnp.pad(x, pad_cfg, mode="constant", constant_values=0.0)
    if impl == "shift" or impl == "argmax_shift":
        # 'argmax_shift': argmax VJP on the stride-1 branch pools (handled
        # above) + the shift chain (elementwise-select VJP instead of
        # select_and_scatter) on the strided trunk pools that fall through
        for d, (w, s) in enumerate(zip(window, strides)):
            axis = d + 1
            n_out = (x.shape[axis] - w) // s + 1
            acc = None
            for k in range(w):
                sl = lax.slice_in_dim(x, k, k + (n_out - 1) * s + 1, s, axis)
                acc = sl if acc is None else jnp.maximum(acc, sl)
            x = acc
        return x
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding="VALID",
    )


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool3d_same_eqbwd(x, window, strides):
    """Identical forward to the default pool; the VJP replaces XLA's
    ``select_and_scatter`` (measured: ~30% of the whole mask-search step on
    the bench chip for the 9 stride-1 branch pools, scripts/bench_ablate.py
    ``poolnograd``) with a fused equality stencil:

        dx[i] = sum over window offsets o of  g[i+o] * (x[i] == y[i+o])

    Tie semantics deviation (documented, opt-in): where several window
    elements equal the max, EVERY tied element receives the full cotangent
    (a valid max subgradient), while torch/select_and_scatter route each
    window's gradient to its first max only. Gradients are identical
    whenever window maxima are unique. Stride-1 windows only.
    """
    return max_pool3d_same(x, window, strides)


def _eqbwd_fwd(x, window, strides):
    y = max_pool3d_same(x, window, strides)
    return y, (x, y)


def _eqbwd_bwd(window, strides, res, g):
    assert tuple(strides) == (1, 1, 1), "eqbwd pool is stride-1 only"
    x, y = res
    lohi = explicit_same_padding(x.shape[1:4], window, strides)
    # output j contributes to input i when o = j - i is in
    # [lo - w + 1, lo]; pad g (zeros) / y (+inf: never equal) so a static
    # w^3 slice loop covers every offset
    cfg = ((0, 0),) + tuple(
        (w - 1 - lo, w - 1 - hi) for (lo, hi), w in zip(lohi, window)
    ) + ((0, 0),)
    gp = jnp.pad(g, cfg, constant_values=0.0)
    yp = jnp.pad(y, cfg, constant_values=jnp.inf)
    nt, nh, nw = x.shape[1:4]
    dx = jnp.zeros(x.shape, g.dtype)
    for kt in range(window[0]):
        for kh in range(window[1]):
            for kw in range(window[2]):
                gs = gp[:, kt : kt + nt, kh : kh + nh, kw : kw + nw, :]
                ys = yp[:, kt : kt + nt, kh : kh + nh, kw : kw + nw, :]
                dx = dx + gs * (x == ys).astype(g.dtype)
    return (dx.astype(x.dtype),)


_max_pool3d_same_eqbwd.defvjp(_eqbwd_fwd, _eqbwd_bwd)


def _monotone_u16(x):
    """Order-preserving bijection 16-bit float -> uint16 (the radix-sort
    flip): positives map above negatives, both monotonically."""
    b = lax.bitcast_convert_type(x, jnp.uint16)
    return jnp.where(b >> 15 == 0, b | jnp.uint16(0x8000), ~b)


def _from_monotone_u16(u, dtype):
    b = jnp.where(u >> 15 == 1, u & jnp.uint16(0x7FFF), ~u)
    return lax.bitcast_convert_type(b, dtype)


def _window_key(shape, window, offsets=(0, 0, 0)):
    """Per-position window-local key: within ANY w-wide window the w
    consecutive coordinates are distinct mod w, so the packed key
    identifies the argmax position unambiguously. ``offsets`` shifts the
    coordinate system (bwd computes keys for unpadded x in padded coords)."""
    kt = (lax.broadcasted_iota(jnp.uint32, shape, 1) + offsets[0]) % window[0]
    kh = (lax.broadcasted_iota(jnp.uint32, shape, 2) + offsets[1]) % window[1]
    kw = (lax.broadcasted_iota(jnp.uint32, shape, 3) + offsets[2]) % window[2]
    return kt * (window[1] * window[2]) + kh * window[2] + kw


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool3d_same_argmax(x, window, strides):
    """Identical forward values to the default pool via a packed
    (value<<k | window_key) uint32 max reduce; the VJP reads only a uint8
    argmax-index plane — the fewest-byte pool backward in this file:

        dx[i] = sum over windows j covering i of  g[j] * (idx[j] == key(i))

    vs the eq-stencil's x/y value reads (~3/8 fewer stencil bytes, and the
    residual is one uint8 plane instead of (x, y)). 16-bit float dtypes,
    stride-1 windows only (dispatch in ``max_pool3d_same``).

    Tie semantics deviation (documented, opt-in like 'eqbwd'): each
    window routes its FULL cotangent to exactly ONE tied element (the
    largest window-key, a valid max subgradient); torch/select_and_scatter
    pick the first max, 'eqbwd' credits every tie. Identical gradients
    whenever window maxima are unique.
    """
    y, _ = _argmax_pool_core(x, window, strides)
    return y


def _argmax_pool_core(x, window, strides):
    pad = explicit_same_padding(x.shape[1:4], window, strides)
    cfg = ((0, 0),) + tuple(pad) + ((0, 0),)
    xp = jnp.pad(x, cfg, mode="constant", constant_values=0.0)
    nbits = (window[0] * window[1] * window[2] - 1).bit_length()
    packed_in = (_monotone_u16(xp).astype(jnp.uint32) << nbits) | _window_key(
        xp.shape, window
    )
    packed = lax.reduce_window(
        packed_in,
        jnp.uint32(0),
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding="VALID",
    )
    y = _from_monotone_u16((packed >> nbits).astype(jnp.uint16), x.dtype)
    idx = (packed & ((1 << nbits) - 1)).astype(jnp.uint8)
    return y, idx


def _argmax_fwd(x, window, strides):
    y, idx = _argmax_pool_core(x, window, strides)
    return y, idx


def _argmax_bwd(window, strides, idx, g):
    assert tuple(strides) == (1, 1, 1), "argmax pool is stride-1 only"
    # stride-1 SAME: output shape == input shape, so the pad geometry is
    # recomputable from g alone and idx is the whole residual
    lohi = explicit_same_padding(g.shape[1:4], window, strides)
    cfg = ((0, 0),) + tuple(
        (w - 1 - lo, w - 1 - hi) for (lo, hi), w in zip(lohi, window)
    ) + ((0, 0),)
    gp = jnp.pad(g, cfg, constant_values=0.0)
    # 255 can never equal a window key (keys < prod(window) <= 27)
    ip = jnp.pad(idx, cfg, constant_values=255)
    # key of each input position in the PADDED coordinate system (matching
    # the forward's keys)
    key = _window_key(
        g.shape, window, offsets=tuple(lo for lo, _ in lohi)
    ).astype(jnp.uint8)
    nt, nh, nw = g.shape[1:4]
    dx = jnp.zeros(g.shape, g.dtype)
    for kt in range(window[0]):
        for kh in range(window[1]):
            for kw in range(window[2]):
                gs = gp[:, kt : kt + nt, kh : kh + nh, kw : kw + nw, :]
                sel = ip[:, kt : kt + nt, kh : kh + nh, kw : kw + nw, :]
                dx = dx + gs * (sel == key).astype(g.dtype)
    return (dx,)


_max_pool3d_same_argmax.defvjp(_argmax_fwd, _argmax_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool3d_same_argmax_strided(x, window, strides, xshape):
    """Strided-window companion of ``_max_pool3d_same_argmax`` (the trunk
    pools). Same packed forward; the backward scatters each in-window
    offset's contribution back to input geometry with an interior-dilated
    ``lax.pad`` instead of a shifted slice (stride-1 is a special case of
    this, kept separate because its slice form needs no dilation).
    ``xshape`` rides as a static arg: strided SAME output shape does not
    determine the input shape."""
    y, _ = _argmax_pool_core(x, window, strides)
    return y


def _argmax_s_fwd(x, window, strides, xshape):
    y, idx = _argmax_pool_core(x, window, strides)
    return y, idx


def _argmax_s_bwd(window, strides, xshape, idx, g):
    lohi = explicit_same_padding(xshape[1:4], window, strides)
    padded = [n + lo + hi for n, (lo, hi) in zip(xshape[1:4], lohi)]
    n_out = g.shape[1:4]
    wt, wh, ww = window
    st, sh, sw = strides
    it = lax.broadcasted_iota(jnp.uint32, g.shape, 1)
    ih = lax.broadcasted_iota(jnp.uint32, g.shape, 2)
    iw = lax.broadcasted_iota(jnp.uint32, g.shape, 3)
    dxp = jnp.zeros((xshape[0], *padded, xshape[4]), g.dtype)
    zero = jnp.zeros((), g.dtype)
    for kt in range(wt):
        for kh in range(wh):
            for kw in range(ww):
                # key of padded input position j*s+k, as a function of the
                # output index j — matches the forward's _window_key
                key = (
                    ((it * st + kt) % wt) * (wh * ww)
                    + ((ih * sh + kh) % wh) * ww
                    + ((iw * sw + kw) % ww)
                ).astype(jnp.uint8)
                contrib = g * (idx == key).astype(g.dtype)
                pad_cfg = [(0, 0, 0)]
                for k, s, p, n in zip(
                    (kt, kh, kw), strides, padded, n_out
                ):
                    pad_cfg.append((k, p - (n - 1) * s - k - 1, s - 1))
                pad_cfg.append((0, 0, 0))
                dxp = dxp + lax.pad(contrib, zero, pad_cfg)
    (t0, _), (h0, _), (w0, _) = lohi
    dx = dxp[
        :,
        t0 : t0 + xshape[1],
        h0 : h0 + xshape[2],
        w0 : w0 + xshape[3],
        :,
    ]
    return (dx,)


_max_pool3d_same_argmax_strided.defvjp(_argmax_s_fwd, _argmax_s_bwd)


def max_pool2d_valid(x: jax.Array, window: Sequence[int]) -> jax.Array:
    """torch ``nn.MaxPool2d(kernel_size)`` — stride=window, VALID, floor mode.

    Used per-timestep in the ConvLSTM stack (convolution_lstm.py:79, 124).
    x: (B, H, W, C).
    """
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *window, 1),
        padding="VALID",
    )


def avg_pool2d_valid(x: jax.Array, window: Sequence[int]) -> jax.Array:
    """Keras ``AveragePooling2D`` / torch AvgPool2d, VALID, stride=window."""
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *window, 1),
        padding="VALID",
    )
    return summed / float(window[0] * window[1])


def avg_pool3d_valid(
    x: jax.Array, window: Sequence[int], strides: Sequence[int] = (1, 1, 1)
) -> jax.Array:
    """torch ``nn.AvgPool3d(kernel, stride)`` with no padding (VALID).

    Matches the I3D Logits-head pool (I3D_doubled.py:310-318).
    """
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding="VALID",
    )
    return summed / float(window[0] * window[1] * window[2])
