"""Decompose the mask-search step cost: fwd vs fwd+bwd, and cumulative
per-endpoint cost via final_endpoint truncation. Axon rules: scan inside
one jit, salted inputs, scalar fetch."""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from ivf_tpu.models import i3d_smth
from ivf_tpu.models.i3d import TRUNK_ENDPOINTS


def timer(make_out, x, variables, iters=6):
    @jax.jit
    def run(x, salt):
        def body(c, i):
            o = make_out(x + ((i + salt) * 1e-6).astype(x.dtype))
            return c + o, None
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
    batch = 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 16, 224, 224, 3), jnp.float32)

    def bf16(v):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v
        )

    which = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"

    if which == "endpoints":
        prev = 0.0
        for ep in TRUNK_ENDPOINTS:
            m = i3d_smth(num_classes=174, dropout_rate=0.0, final_endpoint=ep)
            v = bf16(jax.jit(m.init)(key, x[:1]))
            fwd = lambda a: jnp.sum(m.apply(v, a, train=False).astype(jnp.float32))
            dt = timer(fwd, x, v)
            print(f"{ep}: cum {dt*1e3:.0f}ms (+{(dt-prev)*1e3:.0f}ms)", flush=True)
            prev = dt
        return

    m = i3d_smth(num_classes=174, dropout_rate=0.0, softmax=True)
    v = bf16(jax.jit(m.init)(key, x[:1]))
    fwd = lambda a: jnp.sum(m.apply(v, a, train=False).astype(jnp.float32))
    dt_f = timer(fwd, x, v)

    gradfn = jax.grad(lambda a: jnp.sum(m.apply(v, a, train=False).astype(jnp.float32)))
    fb = lambda a: jnp.sum(gradfn(a).astype(jnp.float32))
    dt_fb = timer(fb, x, v)
    print(
        f"batch {batch}: fwd {dt_f*1e3:.0f}ms  fwd+bwd {dt_fb*1e3:.0f}ms "
        f"(ratio {dt_fb/dt_f:.2f})  -> step rate {batch/dt_fb:.0f} steps/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
