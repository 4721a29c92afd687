"""Pallas TPU kernel: fused Inception branch-3 = maxpool3x3x3(s1) + 1x1x1
conv (+bias+ReLU), forward and backward.

The I3D Inception branch 3 (I3D_doubled.py:129-146) is
``Unit3D_1x1(MaxPool3dSamePadding(x))``. Executed by XLA that is four
thunks per block (pad, reduce_window, conv, [fused bias/relu]) in the
forward and two heavy ones (select_and_scatter, conv-transpose) in the
backward, with the pooled tensor — as large as the block input — making a
full HBM round trip in each direction. The ablation sweep
(scripts/bench_ablate.py) measured the nine branch pools at ~33% of the
mask-search step, HBM-bound.

This kernel computes the whole branch per (batch, frame) grid cell in
VMEM: separable 3x3 spatial shift-max, temporal 3-max across the t-1/t/t+1
frames (clamped-index BlockSpecs + border masking reproduce the zero-padded
SAME semantics), then one MXU matmul (HW, Cin) @ (Cin, Cout) with bias+ReLU
in the epilogue. The pooled tensor never leaves VMEM.

Backward (custom VJP, input cotangent): for each temporal neighbor s the
conv cotangent ``gc_s = (g_s * [y_s > 0]) @ W^T`` is one matmul, and the
pool cotangent is the exact 27-term gather of maxpool3d.py — all in one
kernel; the pooled values are recomputed in VMEM from the 5-frame x window
instead of being stored. Weight/bias cotangents are computed outside the
kernel from a recomputed pooled tensor (they are DCE'd entirely in the
mask-search use, which differentiates only w.r.t. the input).

Tie semantics match ops/pallas/maxpool3d.py (cotangent routed to ALL
window maxima, not one) — documented deviation, default-off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ivf_tpu.ops.pallas.maxpool3d import _eq, _gather9, _hw_max9, _shift

_LANES = 128


def _pool3(xp, xc, xn, t, t_dim):
    """Zero-padded-SAME 3x3x3 stride-1 pool of frame t from its 3-frame
    window (each (H, W, C))."""
    c = _hw_max9(xc)
    p = _hw_max9(xp)
    n = _hw_max9(xn)
    zero = jnp.zeros_like(c)
    p = jnp.where(t > 0, p, zero)
    n = jnp.where(t < t_dim - 1, n, zero)
    return jnp.maximum(jnp.maximum(c, p), n)


def _fwd_kernel(xp_ref, xc_ref, xn_ref, w_ref, b_ref, o_ref, *, t_dim, relu):
    t = pl.program_id(1)
    pooled = _pool3(xp_ref[0, 0], xc_ref[0, 0], xn_ref[0, 0], t, t_dim)
    h, wdim, cin = pooled.shape
    y = jnp.dot(
        pooled.reshape(h * wdim, cin),
        w_ref[:],
        preferred_element_type=jnp.float32,
    )
    y = y + b_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0, 0] = y.reshape(h, wdim, -1).astype(o_ref.dtype)


def _bwd_kernel(
    x2p_ref, xp_ref, xc_ref, xn_ref, x2n_ref,
    yp_ref, yc_ref, yn_ref,
    gp_ref, gc_ref, gn_ref,
    wt_ref, o_ref, *, t_dim, relu,
):
    """Input cotangent at frame t for one 128-wide Cin block: sum over
    temporal neighbors s of the 27-term max-gather of
    gc_s = (g_s * relu'(y_s)) @ W^T[:, cin_block] against the recomputed
    pooled_s (pool and gather are per-channel, so Cin blocks are
    independent; the grid's third dim keeps each program under the VMEM
    budget at the widest 28x28x256+ blocks)."""
    t = pl.program_id(1)
    x = xc_ref[0, 0]
    h, wdim, cin = x.shape
    frames = {  # x[t-2] .. x[t+2], border-clamped reads
        -2: x2p_ref[0, 0], -1: xp_ref[0, 0], 0: x,
        1: xn_ref[0, 0], 2: x2n_ref[0, 0],
    }
    outs = {-1: yp_ref[0, 0], 0: yc_ref[0, 0], 1: yn_ref[0, 0]}
    gs = {-1: gp_ref[0, 0], 0: gc_ref[0, 0], 1: gn_ref[0, 0]}
    zero_f = jnp.zeros_like(x)

    acc = jnp.zeros((h, wdim, cin), jnp.float32)
    for s in (-1, 0, 1):
        g = gs[s].astype(jnp.float32)
        if relu:
            y = outs[s]
            g = jnp.where(_eq(y, jnp.zeros_like(y)), 0.0, g)
        co = g.shape[-1]
        gc = jnp.dot(
            g.reshape(h * wdim, co),
            wt_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(h, wdim, cin)
        # pooled_s from the x window (zero beyond borders)
        xm = jnp.where(t + s - 1 >= 0, frames[s - 1], zero_f)
        xz = jnp.where((t + s >= 0) & (t + s <= t_dim - 1), frames[s], zero_f)
        xq = jnp.where(t + s + 1 <= t_dim - 1, frames[s + 1], zero_f)
        pooled_s = _pool3(xm, xz, xq, t + s, t_dim)
        term = _gather9(
            x.astype(jnp.float32),
            pooled_s.astype(jnp.float32),
            gc,
        )
        acc = acc + jnp.where((t + s >= 0) & (t + s <= t_dim - 1), term, 0.0)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _pad_lanes(a: jax.Array, axis: int):
    c = a.shape[axis]
    cp = -(-c // _LANES) * _LANES
    if cp != c:
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, cp - c)
        a = jnp.pad(a, pads)
    return a, c, cp


def _frame_spec(h, w, t_dim, dt, lanes):
    def index_map(b, t):
        return (b, jnp.clip(t + dt, 0, t_dim - 1), 0, 0, 0)

    return pl.BlockSpec((1, 1, h, w, lanes), index_map, memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(
        shape, lambda *grid: (0,) * len(shape), memory_space=pltpu.VMEM
    )


def _run_fwd(x, w, b, relu):
    xp, cin, cinp = _pad_lanes(x, -1)
    wp, _, _ = _pad_lanes(w, 0)
    wp, co, cop = _pad_lanes(wp, 1)
    bp = jnp.pad(b, (0, cop - co)) if cop != co else b
    bsz, t, h, wd, _ = xp.shape
    y = pl.pallas_call(
        partial(_fwd_kernel, t_dim=t, relu=relu),
        grid=(bsz, t),
        in_specs=[
            _frame_spec(h, wd, t, -1, cinp),
            _frame_spec(h, wd, t, 0, cinp),
            _frame_spec(h, wd, t, 1, cinp),
            _full_spec((cinp, cop)),
            _full_spec((cop,)),
        ],
        out_specs=_frame_spec(h, wd, t, 0, cop),
        out_shape=jax.ShapeDtypeStruct((bsz, t, h, wd, cop), x.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xp, xp, xp, wp, bp)
    return y[..., :co] if cop != co else y


def _cblock_frame_spec(h, w, t_dim, dt):
    """Frame slice over one 128-channel block (third grid dim)."""

    def index_map(b, t, cb):
        return (b, jnp.clip(t + dt, 0, t_dim - 1), 0, 0, cb)

    return pl.BlockSpec(
        (1, 1, h, w, _LANES), index_map, memory_space=pltpu.VMEM
    )


def _co_frame_spec(h, w, t_dim, dt, cop):
    """Frame slice carrying the full (padded) Cout — independent of cb."""

    def index_map(b, t, cb):
        return (b, jnp.clip(t + dt, 0, t_dim - 1), 0, 0, 0)

    return pl.BlockSpec((1, 1, h, w, cop), index_map, memory_space=pltpu.VMEM)


def _run_bwd(x, y, g, w, relu):
    xp, cin, cinp = _pad_lanes(x, -1)
    ypd, co, cop = _pad_lanes(y, -1)
    gpd, _, _ = _pad_lanes(g, -1)
    wt = jnp.swapaxes(w, 0, 1)  # (Co, Cin)
    wt, _, _ = _pad_lanes(wt, 0)
    wt, _, _ = _pad_lanes(wt, 1)
    bsz, t, h, wd, _ = xp.shape
    x_specs = [_cblock_frame_spec(h, wd, t, d) for d in (-2, -1, 0, 1, 2)]
    y_specs = [_co_frame_spec(h, wd, t, d, cop) for d in (-1, 0, 1)]
    g_specs = [_co_frame_spec(h, wd, t, d, cop) for d in (-1, 0, 1)]
    wt_spec = pl.BlockSpec(
        (cop, _LANES), lambda b, t, cb: (0, cb), memory_space=pltpu.VMEM
    )
    gi = pl.pallas_call(
        partial(_bwd_kernel, t_dim=t, relu=relu),
        grid=(bsz, t, cinp // _LANES),
        in_specs=x_specs + y_specs + g_specs + [wt_spec],
        out_specs=_cblock_frame_spec(h, wd, t, 0),
        out_shape=jax.ShapeDtypeStruct(xp.shape, g.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xp, xp, xp, xp, xp, ypd, ypd, ypd, gpd, gpd, gpd, wt)
    return gi[..., :cin] if cinp != cin else gi


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_pool_conv(x, w, b, relu=True):
    """maxpool3x3x3(stride 1, zero-padded SAME) -> 1x1x1 conv -> bias
    [-> ReLU], one Pallas kernel. x: (B, T, H, W, Cin); w: (Cin, Cout);
    b: (Cout,)."""
    return _run_fwd(x, w, b, relu)


def _vjp_fwd(x, w, b, relu):
    y = _run_fwd(x, w, b, relu)
    # residuals must be JAX types — carry the (tiny) bias itself, not its
    # dtype object, to recover the primal dtype for the db cotangent
    return y, (x, y, w, b)


def _vjp_bwd(relu, res, g):
    x, y, w, b = res
    b_dtype = b.dtype
    dx = _run_bwd(x, y, g, w, relu)
    # weight/bias cotangents via a recomputed pooled tensor (XLA path);
    # dead code under the mask search (no grads w.r.t. variables requested)
    from ivf_tpu.ops.conv import max_pool3d_same

    pooled = max_pool3d_same(x, (3, 3, 3), (1, 1, 1))
    ge = g
    if relu:
        ge = jnp.where(y > 0, g, jnp.zeros_like(g))
    dw = jnp.einsum(
        "bthwi,bthwo->io",
        pooled.astype(jnp.float32),
        ge.astype(jnp.float32),
    ).astype(w.dtype)
    db = jnp.sum(ge.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(
        b_dtype  # cotangent dtype must match the bias primal, not w/g
    )
    return dx, dw, db


fused_pool_conv.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Whole-T frame-block variant (round 5). The per-(b, t) grid above reads
# each input frame 3x in the forward (t-1/t/t+1 BlockSpecs) and 5x in the
# backward; the round-5 isolation probe (scripts/bench_branch3_probe.py)
# showed the re-reads — not the kernel body — are the gap to XLA. After the
# I3D stem every branch-3 site has T <= 8 and H, W <= 28 (I3D_doubled.py
# trunk geometry), so a WHOLE (T, H, W, C) sample is <= 3.2 MB — it fits in
# VMEM outright. This variant grids over (B,) forward / (B, Cin-block)
# backward and reads x / y / g exactly ONCE each; temporal zero-padded SAME
# falls out of `_shift`'s zero fill, no border masking needed.
# ---------------------------------------------------------------------------


def _thw_pool(x):
    """Zero-padded SAME 3x3x3 stride-1 maxpool of a whole (T, H, W, C)
    block: separable shift-max on H/W then the temporal 3-max. Zero fill
    at every border IS the zero-padding semantics (F.pad + MaxPool3d,
    I3D_doubled.py:18-38)."""
    v = x
    for axis in (1, 2, 0):
        v = jnp.maximum(
            jnp.maximum(v, _shift(v, 1, axis)), _shift(v, -1, axis)
        )
    return v


def _fwd_kernel_tb(x_ref, w_ref, b_ref, o_ref, *, relu):
    p = _thw_pool(x_ref[0])
    t, h, wd, cin = p.shape
    y = jnp.dot(
        p.reshape(t * h * wd, cin),
        w_ref[:],
        preferred_element_type=jnp.float32,
    )
    y = y + b_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.reshape(t, h, wd, -1).astype(o_ref.dtype)


def _sample_spec(t, h, w, lanes, cb_grid=False):
    if cb_grid:
        return pl.BlockSpec(
            (1, t, h, w, lanes),
            lambda b, cb: (b, 0, 0, 0, cb),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, t, h, w, lanes), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _run_fwd_tb(x, w, b, relu):
    xp, cin, cinp = _pad_lanes(x, -1)
    wp, _, _ = _pad_lanes(w, 0)
    wp, co, cop = _pad_lanes(wp, 1)
    bp = jnp.pad(b, (0, cop - co)) if cop != co else b
    bsz, t, h, wd, _ = xp.shape
    y = pl.pallas_call(
        partial(_fwd_kernel_tb, relu=relu),
        grid=(bsz,),
        in_specs=[
            _sample_spec(t, h, wd, cinp),
            _full_spec((cinp, cop)),
            _full_spec((cop,)),
        ],
        out_specs=_sample_spec(t, h, wd, cop),
        out_shape=jax.ShapeDtypeStruct((bsz, t, h, wd, cop), x.dtype),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xp, wp, bp)
    return y[..., :co] if cop != co else y


def _bwd_kernel_tb(
    x_ref, y_ref, g_ref, wt_ref, o_ref, gc_ref, pool_ref, acc_ref, *, relu
):
    """Input cotangent for one whole sample x one 128-wide Cin block.
    gc = (g * relu'(y)) @ W^T[:, cin_block] in one matmul, then the exact
    27-term max-gather against the recomputed pooled block — temporal and
    spatial shifts both zero-filled (out-of-range terms contribute 0
    because the shifted g is 0 wherever the shifted pooled is).

    The 27 gather terms are split over the grid's third dim (one temporal
    offset per step): all in/out block indices are dt-independent, so the
    blocks stay VMEM-resident across the three steps — the split costs no
    HBM traffic, it only bounds the kernel's peak live temporaries (the
    flat 27-term unroll hit a 75.6 MB Mosaic stack frame vs the 64 MB
    scoped-VMEM ceiling at the Mixed_3c geometry). gc / pooled / the f32
    accumulator persist in VMEM scratch between the steps."""
    dt = pl.program_id(2)
    x = x_ref[0]
    t, h, wd, cin = x.shape

    @pl.when(dt == 0)
    def _prep():
        g = g_ref[0].astype(jnp.float32)
        if relu:
            y = y_ref[0]
            g = jnp.where(_eq(y, jnp.zeros_like(y)), 0.0, g)
        co = g.shape[-1]
        gc_ref[...] = jnp.dot(
            g.reshape(t * h * wd, co),
            wt_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(t, h, wd, cin)
        pool_ref[...] = _thw_pool(x.astype(jnp.float32))

    xf = x.astype(jnp.float32)

    def _term(d):
        pooled, gc = pool_ref[...], gc_ref[...]
        yt = _shift(pooled, d, 0) if d else pooled
        gt = _shift(gc, d, 0) if d else gc
        s = jnp.zeros((t, h, wd, cin), jnp.float32)
        for dh in (-1, 0, 1):
            yh = _shift(yt, dh, 1) if dh else yt
            gh = _shift(gt, dh, 1) if dh else gt
            for dw in (-1, 0, 1):
                ys = _shift(yh, dw, 2) if dw else yh
                gs = _shift(gh, dw, 2) if dw else gh
                s = s + jnp.where(xf == ys, gs, 0.0)
        return s

    for i, d in enumerate((-1, 0, 1)):

        @pl.when(dt == i)
        def _accum(d=d, first=i == 0):
            term = _term(d)
            acc_ref[...] = term if first else acc_ref[...] + term

    @pl.when(dt == 2)
    def _flush():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _run_bwd_tb(x, y, g, w, relu):
    xp, cin, cinp = _pad_lanes(x, -1)
    ypd, co, cop = _pad_lanes(y, -1)
    gpd, _, _ = _pad_lanes(g, -1)
    wt = jnp.swapaxes(w, 0, 1)  # (Co, Cin)
    wt, _, _ = _pad_lanes(wt, 0)
    wt, _, _ = _pad_lanes(wt, 1)
    bsz, t, h, wd, _ = xp.shape
    wt_spec = pl.BlockSpec(
        (cop, _LANES), lambda b, cb, dt: (0, cb), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec(
        (1, t, h, wd, _LANES), lambda b, cb, dt: (b, 0, 0, 0, cb),
        memory_space=pltpu.VMEM,
    )
    yg_spec = pl.BlockSpec(
        (1, t, h, wd, cop), lambda b, cb, dt: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gi = pl.pallas_call(
        partial(_bwd_kernel_tb, relu=relu),
        # dt fastest (temporal-offset split, indices dt-independent ->
        # blocks resident), then cb (y/g/wt indices cb-independent ->
        # resident for a given b): x/y/g each stream through VMEM once
        grid=(bsz, cinp // _LANES, 3),
        in_specs=[x_spec, yg_spec, yg_spec, wt_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(xp.shape, g.dtype),
        scratch_shapes=[
            pltpu.VMEM((t, h, wd, _LANES), jnp.float32),  # gc
            pltpu.VMEM((t, h, wd, _LANES), jnp.float32),  # pooled
            pltpu.VMEM((t, h, wd, _LANES), jnp.float32),  # accumulator
        ],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xp, ypd, gpd, wt)
    return gi[..., :cin] if cinp != cin else gi


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_pool_conv_tblock(x, w, b, relu=True):
    """Whole-T frame-block fused branch 3 (same math as
    ``fused_pool_conv``, same tie semantics): maxpool3x3x3(s1, zero-padded
    SAME) -> 1x1x1 conv -> bias [-> ReLU]. x: (B, T, H, W, Cin);
    w: (Cin, Cout); b: (Cout,)."""
    return _run_fwd_tb(x, w, b, relu)


def _vjp_fwd_tb(x, w, b, relu):
    y = _run_fwd_tb(x, w, b, relu)
    return y, (x, y, w, b)


def _vjp_bwd_tb(relu, res, g):
    x, y, w, b = res
    b_dtype = b.dtype
    dx = _run_bwd_tb(x, y, g, w, relu)
    from ivf_tpu.ops.conv import max_pool3d_same

    pooled = max_pool3d_same(x, (3, 3, 3), (1, 1, 1))
    ge = g
    if relu:
        ge = jnp.where(y > 0, g, jnp.zeros_like(g))
    dw = jnp.einsum(
        "bthwi,bthwo->io",
        pooled.astype(jnp.float32),
        ge.astype(jnp.float32),
    ).astype(w.dtype)
    db = jnp.sum(ge.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(b_dtype)
    return dx, dw, db


fused_pool_conv_tblock.defvjp(_vjp_fwd_tb, _vjp_bwd_tb)
