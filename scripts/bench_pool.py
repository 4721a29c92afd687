"""Microbench: maxpool3d backward — reduce_window VJP (select_and_scatter)
vs a separable elementwise shift-max formulation whose VJP is plain selects.

The I3D Inception branch-3 pool (3x3x3, stride 1, zero-padded SAME) appears
9 times; its backward is the classic TPU select_and_scatter trap.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from ivf_tpu.ops.conv import max_pool3d_same


def shiftmax_pool3_s1(x):
    """3x3x3 stride-1 zero-padded SAME maxpool as separable shift-maxes.

    Zero padding (not -inf) matches the reference's F.pad+MaxPool3d
    (I3D_doubled.py:8-40); with post-ReLU inputs >= 0 the clamp at 0 is
    exactly the zero-pad semantics.
    """
    for axis in (1, 2, 3):
        lo = lax.pad(
            lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
            jnp.asarray(0, x.dtype),
            [(0, 1, 0) if a == axis else (0, 0, 0) for a in range(x.ndim)],
        )
        hi = lax.pad(
            lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis),
            jnp.asarray(0, x.dtype),
            [(1, 0, 0) if a == axis else (0, 0, 0) for a in range(x.ndim)],
        )
        x = jnp.maximum(jnp.maximum(x, lo), hi)
    return x


def separable_rw_pool3_s1(x):
    """Three per-axis reduce_windows (zero-padded SAME, stride 1)."""
    for axis in (1, 2, 3):
        win = [1] * x.ndim
        win[axis] = 3
        x = lax.reduce_window(
            x,
            jnp.asarray(0, x.dtype),  # zero pad (post-ReLU inputs >= 0)
            lax.max,
            window_dimensions=tuple(win),
            window_strides=(1,) * x.ndim,
            padding=[(0, 0) if w == 1 else (1, 1) for w in win],
        )
    return x


def bench_grad(fn, x, iters=6):
    g = jax.grad(lambda a: jnp.sum(fn(a).astype(jnp.float32)))

    @jax.jit
    def run(x, salt):
        def body(c, i):
            gx = g(x + ((i + salt) * 1e-6).astype(x.dtype))
            return c + jnp.sum(gx.astype(jnp.float32)), None
        acc, _ = lax.scan(body, 0.0, jnp.arange(iters, dtype=jnp.float32))
        return acc

    float(run(x, jnp.float32(0)))
    t0 = time.time()
    float(run(x, jnp.float32(1)))
    dt = time.time() - t0
    t0 = time.time()
    float(run(x, jnp.float32(2)))
    return min(dt, time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    for (b, t, h, w, c) in [(128, 8, 28, 28, 480), (128, 4, 14, 14, 832)]:
        x = jnp.maximum(jax.random.normal(key, (b, t, h, w, c), jnp.bfloat16), 0)
        # correctness (fwd + grad)
        y1 = max_pool3d_same(x[:2], (3, 3, 3), (1, 1, 1))
        y2 = shiftmax_pool3_s1(x[:2])
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        y3 = separable_rw_pool3_s1(x[:2])
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))
        dt_rw = bench_grad(lambda a: max_pool3d_same(a, (3, 3, 3), (1, 1, 1)), x)
        dt_sm = bench_grad(shiftmax_pool3_s1, x)
        dt_sep = bench_grad(separable_rw_pool3_s1, x)
        gb = x.size * 2 / 1e9
        print(
            f"{b}x{t}x{h}x{w}x{c}: reduce_window bwd {dt_rw*1e3:.1f}ms "
            f"({gb/dt_rw:.0f}GB/s-in)  shiftmax bwd {dt_sm*1e3:.1f}ms "
            f"sep-rw bwd {dt_sep*1e3:.1f}ms ({gb/dt_sep:.0f}GB/s-in)  "
            f"best-speedup {dt_rw/min(dt_sm, dt_sep):.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
