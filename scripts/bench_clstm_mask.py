"""ConvLSTM mask-search throughput — the TF drivers' actual workload
(/root/reference/video_features_tf/mask/find_mask_kth.py:314-374: in-graph
freeze perturbation + Adam on the mask variable, ConvLSTM score model, KTH
shape 32x120x160, N=100 steps).

Batch-swept mask-steps/s/chip on the real TPU (VERDICT r2 #4). One step =
one ConvLSTM fwd+bwd on a 32-frame clip + Adam update of the mask logits.

Usage: python scripts/bench_clstm_mask.py [--batches 16,32,64,128]
       [--steps 50] [--dtype bfloat16]
"""

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def build(batch_size, n_steps, dtype="bfloat16", use_scan=True,
          mode="search"):
    from ivf_tpu.interpret.mask_opt import find_mask
    from ivf_tpu.models import ConvLSTMClassifier

    # the TF KTH mask driver's model: layers [32,32], kernel (3,5),
    # stride 2, per-block BN (block_order='tf'), softmax scores
    model = ConvLSTMClassifier(
        num_classes=6,
        nb_lstm_units=32,
        lstm_layers=2,
        conv_kernel_size=(3, 5),
        conv_stride=2,
        effective_steps=(7, 15, 23, 31),
        block_order="tf",
        add_softmax=True,
        use_scan=use_scan,
    )
    key = jax.random.PRNGKey(0)
    t, h, w = 32, 120, 160
    clips = jax.random.normal(key, (batch_size, t, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(key, clips[:1])
    if dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)

    targets = jnp.arange(batch_size, dtype=jnp.int32) % 6
    inits = jnp.tile(
        jnp.where(jnp.arange(t) % 2 == 0, 1.0, -1.0)[None], (batch_size, 1)
    )

    if mode != "search":
        # batch-64-cliff isolation probes (VERDICT r3 #6): the same
        # n_steps-amortized loop with (a) the plain batched forward or
        # (b) forward+backward w.r.t. the mask logits but no Adam/perturb —
        # whichever of these reproduces the cliff names the component
        import jax.lax as lax

        fwd = lambda c: model.apply(variables, c, train=False)

        def run(clips, targets, inits, salt):
            def body(acc, i):
                x = clips + (salt + i) * 1e-6
                if mode == "fwd":
                    return acc + jnp.sum(fwd(x).astype(jnp.float32)), None

                def loss_fn(m):  # per-row masks, like the vmapped search
                    xm = x * jax.nn.sigmoid(m)[:, :, None, None, None]
                    return jnp.sum(fwd(xm).astype(jnp.float32))

                g = jax.grad(loss_fn)(inits + acc * 0)
                return acc + jnp.sum(g), None

            acc, _ = lax.scan(
                body, 0.0, jnp.arange(n_steps, dtype=jnp.float32)
            )
            return acc

        return jax.jit(run), (clips, targets, inits)

    # TF driver hyperparams: lam1 .02 lam2 .04, Adam lr 0.001
    # (find_mask_kth.py:97-105); lr does not change the step cost
    searcher = jax.vmap(
        partial(find_mask, score_fn, n_steps=n_steps, lam1=0.02, lam2=0.04)
    )

    def run(clips, targets, inits, salt):
        res = searcher(clips + salt * 1e-6, targets, inits)
        return jnp.sum(res.mask) + jnp.sum(res.loss)

    return jax.jit(run), (clips, targets, inits)


def timed(run, args, salt):
    t0 = time.time()
    out = float(run(*args, jnp.float32(salt)))
    assert np.isfinite(out)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64,128")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--unrolled", action="store_true")
    ap.add_argument(
        "--mode", default="search", choices=("search", "fwd", "fwdbwd"),
        help="'fwd'/'fwdbwd' are cliff-isolation probes (no Adam/perturb)",
    )
    args = ap.parse_args()

    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        try:
            t0 = time.time()
            run, rargs = build(
                b, args.steps, args.dtype, use_scan=not args.unrolled,
                mode=args.mode,
            )
            timed(run, rargs, 0.0)  # compile+warm
            compile_s = time.time() - t0
            dts = [timed(run, rargs, s) for s in (1.0, 2.0, 3.0)]
            sps_min = b * args.steps / min(dts)
            sps_med = b * args.steps / sorted(dts)[1]
            results[b] = {
                "steps_per_sec": round(sps_min, 1),
                "steps_per_sec_median": round(sps_med, 1),
                "sec_per_clip_100steps": round(100.0 / (sps_min / b), 2),
                "compile_s": round(compile_s, 1),
            }
            print(f"batch {b}: {results[b]}", flush=True)
        except Exception as e:  # noqa: BLE001
            results[b] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"batch {b}: FAILED {results[b]['error']}", flush=True)
    print(json.dumps({"clstm_mask_search": results}))


if __name__ == "__main__":
    main()
