"""MFU of the production mask-search step (VERDICT r2 #3).

Reports: analytic + compiler FLOP counts for one batch-128 mask step (I3D
fwd+bwd on 16x224x224 + freeze perturbation + Adam on the mask logits),
the measured step time, and MFU = flops / time / peak.

v5e peak: 197 TFLOP/s bf16 (394 int8). The compiler count comes from
XLA's cost_analysis() on the compiled step program; the analytic count is
2*MACs over the conv layers x3 (fwd + 2x bwd) as a cross-check.

Usage: python scripts/bench_mfu.py [--batch 128] [--steps 30]
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

V5E_PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from ivf_tpu.interpret.mask_opt import find_mask
    from ivf_tpu.models import i3d_smth

    model = i3d_smth(
        num_classes=174, dropout_rate=0.0, softmax=True,
        stem_s2d=True, fold_bn=True, fuse_1x1=True,
    )
    key = jax.random.PRNGKey(0)
    clips = jax.random.normal(key, (args.batch, 16, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)(key, clips[:1])
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)
    targets = jnp.arange(args.batch, dtype=jnp.int32) % 174
    inits = jnp.tile(
        jnp.where(jnp.arange(16) % 2 == 0, 1.0, -1.0)[None], (args.batch, 1)
    )
    searcher = jax.vmap(partial(find_mask, score_fn, n_steps=args.steps))

    def run(clips, targets, inits, salt):
        res = searcher(clips + salt * 1e-6, targets, inits)
        return jnp.sum(res.mask) + jnp.sum(res.loss)

    jitted = jax.jit(run)
    print("lowering + compiling...", flush=True)
    lowered = jitted.lower(clips, targets, inits, jnp.float32(0.0))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    xla_flops_total = float(ca.get("flops", float("nan"))) if ca else float("nan")

    t0 = time.time()
    out = float(compiled(clips, targets, inits, jnp.float32(0.0)))
    assert np.isfinite(out)
    warm = time.time() - t0
    dts = []
    for salt in (1.0, 2.0, 3.0):
        t0 = time.time()
        float(compiled(clips, targets, inits, jnp.float32(salt)))
        dts.append(time.time() - t0)
    dt = min(dts)
    n_steps_total = args.batch * args.steps
    step_time = dt / args.steps  # per batched step (all clips in parallel)

    print(f"warm {warm:.1f}s; timed {dts}")
    print(
        f"batch {args.batch}, {args.steps} steps: "
        f"{n_steps_total/dt:.0f} mask-steps/s/chip"
    )
    if np.isfinite(xla_flops_total):
        per_step = xla_flops_total / args.steps
        mfu = per_step / step_time / V5E_PEAK_BF16
        print(
            f"XLA cost_analysis: {xla_flops_total/1e12:.2f} TFLOP total, "
            f"{per_step/1e12:.3f} TFLOP per batched step "
            f"({per_step/args.batch/1e9:.1f} GFLOP per clip-step)"
        )
        print(
            f"step time {step_time*1e3:.1f} ms -> "
            f"{per_step/step_time/1e12:.1f} TFLOP/s = "
            f"MFU {mfu*100:.1f}% of 197 TFLOP/s bf16 peak"
        )
    else:
        print("cost_analysis returned no flops (tunnel backend limitation)"
              " — falling back to analytic count")
    # analytic cross-check: I3D fwd conv MACs at 16x224x224 ≈ 27.6 GFLOP
    # (2*MAC) per clip; bwd ≈ 2x fwd -> ~83 GFLOP per clip-step
    analytic_per_clip = 27.6e9 * 3
    tf_per_s = analytic_per_clip * args.batch / step_time
    print(
        f"analytic (~{analytic_per_clip/1e9:.0f} GFLOP/clip-step): "
        f"{tf_per_s/1e12:.1f} TFLOP/s = MFU {tf_per_s/V5E_PEAK_BF16*100:.1f}%"
    )


if __name__ == "__main__":
    main()
