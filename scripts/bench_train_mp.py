"""Mixed-precision training throughput on the real TPU: f32 vs bf16.

`make_train_step(compute_dtype='bfloat16')` runs the forward/backward on
bf16 casts of params+clips while master params / optimizer state / BN stats
stay f32 (train/loop.py). This measures what that buys at the reference
training shapes:

  * I3D smth: 16x224x224, 174 classes (configs/config_i3d_smth.py bs=16)
  * ConvLSTM KTH: 32x120x160, 6 classes (config_train_kth_clstm.py bs=24)

Axon timing rules: steps inside one jit via lax.scan over salted inputs,
scalar fetch, min of two timed runs after the compile+warm run.

Usage: python scripts/bench_train_mp.py [variant ...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from ivf_tpu.train import build_optimizer, create_train_state, make_train_step


def build(family, batch, dtype, n_iters=5, **model_kw):
    if family == "i3d":
        from ivf_tpu.models import i3d_smth

        model = i3d_smth(num_classes=174, dropout_rate=0.0, **model_kw)
        shape, n_classes = (batch, 16, 224, 224, 3), 174
    else:
        from ivf_tpu.models import ConvLSTMClassifier

        model = ConvLSTMClassifier(
            num_classes=6,
            nb_lstm_units=32,
            lstm_layers=2,
            conv_stride=2,
            effective_steps=(7, 15, 23, 31),
            use_scan=False,
            **model_kw,
        )
        shape, n_classes = (batch, 32, 120, 160, 3), 6
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, shape, jnp.float32)
    labels = jnp.arange(batch, dtype=jnp.int32) % n_classes
    state = create_train_state(
        model, rng, clips[:1], build_optimizer("adam", 1e-3)
    )
    step = make_train_step(compute_dtype=dtype)

    @jax.jit
    def run(state, clips, labels, salt):
        def body(carry, i):
            st, acc = carry
            st, metrics = step(st, clips + (i + salt) * 1e-6, labels, rng)
            return (st, acc + metrics["loss"]), None

        (state, acc), _ = lax.scan(
            body, (state, 0.0), jnp.arange(n_iters, dtype=jnp.float32)
        )
        return acc

    return run, (state, clips, labels), batch * n_iters


def timed(run, args, salt):
    t0 = time.time()
    out = float(run(*args, jnp.float32(salt)))
    assert np.isfinite(out), out
    return time.time() - t0


VARIANTS = {
    "i3d_f32_16": dict(family="i3d", batch=16, dtype="float32"),
    "i3d_bf16_16": dict(family="i3d", batch=16, dtype="bfloat16"),
    # bf16 activations halve residual bytes -> bigger batches fit
    "i3d_bf16_32": dict(family="i3d", batch=32, dtype="bfloat16"),
    "i3d_bf16_64": dict(family="i3d", batch=64, dtype="bfloat16"),
    "i3d_f32_32": dict(family="i3d", batch=32, dtype="float32"),
    # the argmax pool VJP engages on bf16 activations (ops/conv.py)
    "i3d_bf16_16_argmax": dict(
        family="i3d", batch=16, dtype="bfloat16", pool_impl="argmax"
    ),
    "i3d_bf16_32_argmax": dict(
        family="i3d", batch=32, dtype="bfloat16", pool_impl="argmax"
    ),
    "clstm_f32_24": dict(family="clstm", batch=24, dtype="float32"),
    "clstm_bf16_24": dict(family="clstm", batch=24, dtype="bfloat16"),
    "clstm_bf16_48": dict(family="clstm", batch=48, dtype="bfloat16"),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            t_b = time.time()
            run, args, clips_per_run = build(**VARIANTS[name])
            dt0 = timed(run, args, 0.0)
            dt = min(timed(run, args, 1.0), timed(run, args, 2.0))
            print(
                f"{name}: {clips_per_run/dt:.0f} train clips/s "
                f"({dt:.2f}s/run, compile+warm {dt0:.0f}s, "
                f"build {time.time()-t_b-dt0-2*dt:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
