"""Microbench: XLA conv3d vs sum-of-kT-conv2d reformulation on the TPU.

conv3d(k=(3,3,3)) == sum_dt conv2d(x_shifted[dt], k[dt]) with the (B,T)
axes merged into one big 2D-conv batch. If TPU lowers 3-spatial-dim convs
suboptimally, the 2D form should be significantly faster at equal math.
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

DIMS3D = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))
DIMS2D = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv3d(x, k, stride=(1, 1, 1)):
    return lax.conv_general_dilated(
        x, k, stride, "SAME", dimension_numbers=DIMS3D,
        preferred_element_type=k.dtype)


def conv3d_as_2d(x, k, stride_t=1, stride_hw=1):
    """x (B,T,H,W,C), k (kt,kh,kw,Ci,Co), SAME on all dims."""
    b, t, h, w, c = x.shape
    kt = k.shape[0]
    pt = (kt - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pt, kt - 1 - pt), (0, 0), (0, 0), (0, 0)))
    to = -(-t // stride_t)
    out = None
    for dt in range(kt):
        xs = lax.slice_in_dim(xp, dt, dt + t, axis=1)
        if stride_t > 1:
            xs = xs[:, ::stride_t]
        xs2 = xs.reshape(b * to, h, w, c)
        y = lax.conv_general_dilated(
            xs2, k[dt], (stride_hw, stride_hw), "SAME",
            dimension_numbers=DIMS2D, preferred_element_type=k.dtype)
        out = y if out is None else out + y
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(b, to, ho, wo, -1)


def bench(fn, x, k, iters=8):
    @jax.jit
    def run(x, k, salt):
        def body(c, i):
            y = fn(x + ((i + salt) * 1e-6).astype(x.dtype), k)
            return c + jnp.sum(y.astype(jnp.float32)), None
        acc, _ = lax.scan(body, 0.0, jnp.arange(iters, dtype=jnp.float32))
        return acc

    float(run(x, k, jnp.float32(0)))  # compile+warm
    t0 = time.time()
    float(run(x, k, jnp.float32(1)))
    dt1 = time.time() - t0
    t0 = time.time()
    float(run(x, k, jnp.float32(2)))
    return min(dt1, time.time() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        # (B, T, H, W, Cin, Cout, stride_t, stride_hw)
        (128, 8, 28, 28, 256, 320, 1, 1),
        (128, 8, 14, 14, 512, 512, 1, 1),
        (128, 8, 56, 56, 64, 192, 1, 1),
        (32, 16, 56, 56, 64, 192, 1, 1),
    ]
    for b, t, h, w, ci, co, st, sh in shapes:
        x = jax.random.normal(key, (b, t, h, w, ci), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 3, ci, co), jnp.bfloat16) * 0.05
        flops = 2 * b * (t // st) * (h // sh) * (w // sh) * 27 * ci * co
        # correctness
        y3 = conv3d(x[:4], k, (st, sh, sh))
        y2 = conv3d_as_2d(x[:4], k, st, sh)
        err = float(jnp.max(jnp.abs(y3.astype(jnp.float32) - y2.astype(jnp.float32))))
        dt3 = bench(lambda a, kk: conv3d(a, kk, (st, sh, sh)), x, k)
        dt2 = bench(lambda a, kk: conv3d_as_2d(a, kk, st, sh), x, k)
        print(
            f"B{b} T{t} {h}x{w} {ci}->{co}: conv3d {dt3*1e3:.1f}ms "
            f"({flops/dt3/1e12:.0f} TF/s)  as2d {dt2*1e3:.1f}ms "
            f"({flops/dt2/1e12:.0f} TF/s)  speedup {dt3/dt2:.2f}x  err {err:.3g}",
            flush=True,
        )


if __name__ == "__main__":
    main()
