"""Kill-or-proceed probe for the round-5 in-segment candidate (VERDICT r4
#6): fuse the Inception branch-3 pool output into the following 1x1x1
conv's operand to save one HBM round trip of the block-sized tensor.

The existing Pallas kernel (ops/pallas/fused_branch3.py) measured -43% on
the full search step (PERF.md round 3: per-(b,t) halo BlockSpecs re-read
each frame 3x fwd / 5x bwd). A frame-BLOCK restructure would cut the
re-read to ~1.25x fwd / ~1.4x bwd. This probe decides whether that
rewrite can possibly win BEFORE paying for it, by timing the pieces in
isolation on the chip:

  xla_fwd   pad+reduce_window+1x1conv+bias+relu, XLA thunks (production)
  fus_fwd   the existing fused kernel, forward only
  xla_fb    forward + input-cotangent backward, XLA
  fus_fb    same through the fused kernel's custom VJP

Pre-committed kill criterion: the restructure saves at most 58% of the
fused kernel's fwd read bytes (3x -> 1.25x) and ~70% of its bwd read
bytes (5x -> 1.4x). If fus_fwd > 2.2 * xla_fwd or fus_fb > 3.0 * xla_fb,
even a zero-overhead restructure cannot reach parity -> record the
negative in PERF.md and formally retire the in-segment hunt (the
alternative outcome: proceed with the frame-block kernel).

Branch-3 shapes from I3D_doubled.py:129-146 trunk geometry at the
production mask-search clip (16 frames, 224^2).
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ivf_tpu.ops.conv import max_pool3d_same
from ivf_tpu.ops.pallas.fused_branch3 import (
    fused_pool_conv,
    fused_pool_conv_tblock,
)


def xla_branch3(x, w, b, relu=True):
    """The production XLA path: zero-padded SAME 3x3x3 s1 pool then the
    folded-BN 1x1x1 conv as a channel matmul (+bias+ReLU) — what
    models/layers.py emits for branch 3 under fold_bn/fuse_1x1."""
    p = max_pool3d_same(x, (3, 3, 3), (1, 1, 1))
    y = jnp.einsum("bthwi,io->bthwo", p, w) + b
    return jnp.maximum(y, 0) if relu else y


def bench(fn, args, iters=4, vmem_kib=0):
    """min-of-2 per-launch seconds; salt defeats the tunnel memoizer.
    ``vmem_kib`` raises the scoped-VMEM limit (the tblock kernel's whole-T
    frame needs ~21-30 MB against the 16 MB default)."""
    opts = (
        {"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)} if vmem_kib else None
    )

    @partial(jax.jit, compiler_options=opts)
    def run(salt, *args):
        def body(c, i):
            x = args[0] + ((i + salt) * 1e-6).astype(args[0].dtype)
            return c + jnp.sum(fn(x, *args[1:]).astype(jnp.float32)), None

        acc, _ = lax.scan(body, 0.0, jnp.arange(iters, dtype=jnp.float32))
        return acc

    float(run(jnp.float32(0), *args))  # compile+warm
    t0 = time.time()
    float(run(jnp.float32(1), *args))
    dt = time.time() - t0
    t0 = time.time()
    float(run(jnp.float32(2), *args))
    return min(dt, time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    # (B, T, H, W, Cin) -> Cout, the two biggest-traffic branch-3 sites
    shapes = [
        ((64, 8, 28, 28, 256), 64),   # Mixed_3c
        ((64, 4, 14, 14, 528), 128),  # Mixed_4f
    ]
    for (b, t, h, w, cin), cout in shapes:
        kx, kw = jax.random.split(key)
        x = jnp.maximum(
            jax.random.normal(kx, (b, t, h, w, cin), jnp.bfloat16), 0
        )
        wgt = (
            jax.random.normal(kw, (cin, cout), jnp.bfloat16)
            * (1.0 / np.sqrt(cin))
        ).astype(jnp.bfloat16)
        bias = jnp.zeros((cout,), jnp.bfloat16)

        # parity first (fwd + input grad on a slice)
        ref = xla_branch3(x[:2], wgt, bias)
        for fn in (fused_pool_conv, fused_pool_conv_tblock):
            np.testing.assert_allclose(
                np.asarray(ref, np.float32),
                np.asarray(fn(x[:2], wgt, bias), np.float32),
                rtol=0, atol=2e-2,
            )

        fwd_xla = bench(lambda a, w_, b_: xla_branch3(a, w_, b_), (x, wgt, bias))
        fwd_fus = bench(lambda a, w_, b_: fused_pool_conv(a, w_, b_), (x, wgt, bias))
        fwd_tb = bench(
            lambda a, w_, b_: fused_pool_conv_tblock(a, w_, b_), (x, wgt, bias),
            vmem_kib=65536,
        )

        def grad_of(fn):
            g = jax.grad(
                lambda a, w_, b_: jnp.sum(fn(a, w_, b_).astype(jnp.float32))
            )
            return lambda a, w_, b_: g(a, w_, b_)

        fb_xla = bench(grad_of(xla_branch3), (x, wgt, bias))
        fb_fus = bench(grad_of(fused_pool_conv), (x, wgt, bias))
        fb_tb = bench(
            grad_of(fused_pool_conv_tblock), (x, wgt, bias), vmem_kib=65536
        )

        gb = x.size * 2 / 1e9
        print(
            f"{b}x{t}x{h}x{w}x{cin}->{cout}: "
            f"fwd xla {fwd_xla*1e3:.1f}ms ({gb/fwd_xla:.0f}GB/s-in) "
            f"fused {fwd_fus*1e3:.1f}ms (ratio {fwd_fus/fwd_xla:.2f}; "
            f"kill>2.2) tblock {fwd_tb*1e3:.1f}ms "
            f"(ratio {fwd_tb/fwd_xla:.2f}) | fwd+bwd xla {fb_xla*1e3:.1f}ms "
            f"fused {fb_fus*1e3:.1f}ms (ratio {fb_fus/fb_xla:.2f}; kill>3.0) "
            f"tblock {fb_tb*1e3:.1f}ms (ratio {fb_tb/fb_xla:.2f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
