"""Roofline microbenches for the bench chip: effective HBM streaming rate
and per-op dispatch cost inside one compiled program.

Decides where the mask-search step's non-FLOP time goes (the no3x3
ablation proved FLOPs are free): if step time ~= bytes/stream_rate the
workload is at the memory roofline and op merging won't help; if the
dependent-chain op cost dominates, fewer-bigger ops is the lever.

Axon rules: one jit, salted inputs, scalar fetch, min of 2 runs.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")


def timed(fn, *args):
    float(fn(*args, jnp.float32(0)))
    t0 = time.time()
    float(fn(*args, jnp.float32(1)))
    dt = time.time() - t0
    t0 = time.time()
    float(fn(*args, jnp.float32(2)))
    return min(dt, time.time() - t0)


def stream_rate(mb=256, iters=8, dtype=jnp.bfloat16):
    """Elementwise read+write of a large buffer, scan-amortized: GB/s."""
    n = mb * 1024 * 1024 // np.dtype(dtype).itemsize
    x = jnp.arange(n, dtype=jnp.float32).astype(dtype).reshape(-1, 1024)

    @jax.jit
    def run(x, salt):
        def body(c, i):
            c = c * jnp.asarray(1.0001, dtype) + (i + salt).astype(dtype)
            return c, None

        y, _ = lax.scan(body, x, jnp.arange(iters, dtype=jnp.float32))
        return jnp.sum(y.astype(jnp.float32))

    dt = timed(run, x)
    gb = 2 * mb * iters / 1024  # read + write per iteration
    return gb / dt


def dispatch_cost(n_ops=200, size=128):
    """Dependent chain of tiny elementwise+reduce pairs (unfusable across
    iterations by data dependency): seconds per op."""
    x = jnp.ones((size, size), jnp.float32)

    @jax.jit
    def run(x, salt):
        def body(c, i):
            # reduce->broadcast forces a new kernel per iteration
            s = jnp.sum(c) * 1e-9 + salt * 1e-9
            return jnp.tanh(c + s), None

        y, _ = lax.scan(body, x, jnp.arange(n_ops, dtype=jnp.float32))
        return jnp.sum(y)

    dt = timed(run, x)
    return dt / n_ops


def big_matmul_rate(m=4096, iters=8):
    a = jnp.ones((m, m), jnp.bfloat16)

    @jax.jit
    def run(a, salt):
        def body(c, i):
            c = jnp.dot(
                c, a, preferred_element_type=jnp.bfloat16
            ) * jnp.asarray(1e-3, jnp.bfloat16) + (i + salt).astype(jnp.bfloat16) * 0
            return c, None

        y, _ = lax.scan(body, a, jnp.arange(iters, dtype=jnp.float32))
        return jnp.sum(y.astype(jnp.float32))

    dt = timed(run, a)
    return 2 * m**3 * iters / dt / 1e12


def main():
    print(f"stream (bf16, 256MB x8): {stream_rate():.0f} GB/s", flush=True)
    print(f"stream (f32, 256MB x8): {stream_rate(dtype=jnp.float32):.0f} GB/s", flush=True)
    print(
        f"dependent tiny-op chain: {dispatch_cost()*1e6:.0f} us/op", flush=True
    )
    print(f"big matmul: {big_matmul_rate():.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
