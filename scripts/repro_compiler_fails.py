"""Reproducers for the axon-tunnel remote-compiler failures (HTTP 500).

Four program families reproducibly fail to compile through this
environment's remote TPU compiler (``tpu_compile_helper subprocess exit
code 1`` behind an HTTP 500), across rounds 1-4 (PERF.md). Each is a
legitimate program that CPU-compiles and that real (untunneled) TPU
toolchains are expected to handle; on such hardware the fast variants
behind these programs are worth re-testing (argmax_full removes the
remaining trunk-pool select_and_scatter bytes; plain scan removes the
remat recompute from the ConvLSTM recurrence):

  1. ``clstm_scan_grad``  — grad-of-``nn.scan`` ConvLSTM (no remat) at the
     production train/mask shapes: the full carried-activation stack is
     what the remote compiler chokes on (batch >=32 for the mask search;
     ANY batch at the train shape).
  2. ``argmax_full``      — mask-search step with ``pool_impl='argmax_full'``
     (strided trunk pools via the dilated-pad scatter VJP) at batch >=64.
  3. ``remat_192``        — ``nn.remat`` I3D mask search at batch >=192.
  4. ``argmax_144``       — ``pool_impl='argmax'`` at batch 144 (the same
     program that compiles fine at 128 and 160).

Usage:
  python scripts/repro_compiler_fails.py            # run all, report
  python scripts/repro_compiler_fails.py --expect-good
      # assert every case COMPILES — run this on untunneled TPU hardware;
      # exits nonzero listing any case that still fails there

Compile-only (``jit(...).lower(...).compile()``): no execution, so each
case is bounded by compile time alone.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _compile(fn, *args):
    jax.jit(fn).lower(*args).compile()


def case_clstm_scan_grad():
    from functools import partial

    from ivf_tpu.interpret.mask_opt import find_mask
    from ivf_tpu.models import ConvLSTMClassifier

    model = ConvLSTMClassifier(
        num_classes=6, nb_lstm_units=32, lstm_layers=2,
        conv_kernel_size=(3, 5), conv_stride=2,
        effective_steps=(7, 15, 23, 31), block_order="tf",
        add_softmax=True, use_scan=True,
    )
    b, t, h, w = 32, 32, 120, 160
    clips = jnp.zeros((b, t, h, w, 3), jnp.bfloat16)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), clips[:1])
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)
    searcher = jax.vmap(partial(find_mask, score_fn, n_steps=2))
    targets = jnp.zeros((b,), jnp.int32)
    inits = jnp.zeros((b, t), jnp.float32)
    _compile(
        lambda c, tg, i: jnp.sum(searcher(c, tg, i).mask), clips, targets,
        inits,
    )


def _i3d_search(batch, pool_impl="argmax", remat=False):
    from functools import partial

    from ivf_tpu.interpret.mask_opt import find_mask
    from ivf_tpu.models import i3d_smth

    model = i3d_smth(
        num_classes=174, dropout_rate=0.0, softmax=True, stem_s2d=True,
        fold_bn=True, fuse_1x1=True, pool_impl=pool_impl, remat=remat,
    )
    clips = jnp.zeros((batch, 16, 224, 224, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), clips[:1])
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype),
        variables,
    )
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)
    searcher = jax.vmap(partial(find_mask, score_fn, n_steps=2))
    targets = jnp.zeros((batch,), jnp.int32)
    inits = jnp.zeros((batch, 16), jnp.float32)
    _compile(
        lambda c, tg, i: jnp.sum(searcher(c, tg, i).mask), clips, targets,
        inits,
    )


CASES = {
    "clstm_scan_grad": case_clstm_scan_grad,
    "argmax_full": lambda: _i3d_search(64, pool_impl="argmax_full"),
    "remat_192": lambda: _i3d_search(192, remat=True),
    "argmax_144": lambda: _i3d_search(144),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--expect-good", action="store_true")
    ap.add_argument("cases", nargs="*", default=list(CASES))
    args = ap.parse_args()
    failed = []
    for name in args.cases or list(CASES):
        t0 = time.time()
        try:
            CASES[name]()
            print(f"{name}: COMPILES ({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(
                f"{name}: COMPILE FAIL {type(e).__name__}: {str(e)[:160]}",
                flush=True,
            )
    if args.expect_good and failed:
        print(f"EXPECTED-GOOD VIOLATIONS: {failed}")
        sys.exit(1)


if __name__ == "__main__":
    main()
