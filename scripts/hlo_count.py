"""Count executed-HLO-level ops in the compiled mask-search step.

Evidence metric for the op-overhead diagnosis (PERF.md): on the axon
tunnel each non-fused HLO costs ~270-560us regardless of size, so the
bench number tracks op count as much as FLOPs. This script compiles ONE
mask-optimization step (I3D fwd+bwd + Adam) and reports instruction
counts by opcode for any set of model configs.

Runs on CPU by default (op mix is backend-independent at the optimized-HLO
level modulo fusion differences; pass --tpu to compile for the real chip).
"""

import argparse
import collections
import re
import sys
from functools import partial

sys.path.insert(0, "/root/repo")


def build_step(batch=8, t=16, hw=224, **model_kw):
    import jax
    import jax.numpy as jnp

    from ivf_tpu.interpret.mask_opt import find_mask
    from ivf_tpu.models import i3d_smth

    model = i3d_smth(
        num_classes=174, dropout_rate=0.0, softmax=True, **model_kw
    )
    key = jax.random.PRNGKey(0)
    clips = jnp.zeros((batch, t, hw, hw, 3), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(key, clips[:1].astype(jnp.float32)))
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        variables,
    )
    score_fn = lambda c: model.apply(variables, c[None], train=False)[0].astype(jnp.float32)
    targets = jnp.zeros((batch,), jnp.int32)
    inits = jnp.zeros((batch, t), jnp.float32)
    fn = jax.vmap(partial(find_mask, score_fn, n_steps=1))
    return jax.jit(fn), (clips, targets, inits)


_SKIP = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "copy", "copy-start", "copy-done", "after-all",
}


def count_ops(hlo_text: str) -> collections.Counter:
    """Opcode histogram of non-fusion-body computations' instructions
    (fusions count once — they execute as one kernel; instructions inside
    %fused_computation bodies are NOT re-counted, and tuple-typed
    instructions like the scan `while` are included)."""
    # computations that execute instruction-by-instruction: the entry and
    # every while body/condition (transitively); fusion bodies and reduce/
    # scatter combiners execute as part of their parent kernel
    loop_comps = set()
    for m in re.finditer(r"(?:body|condition)=%?([\w.\-]+)", hlo_text):
        loop_comps.add(m.group(1))

    counts = collections.Counter()
    counting = False
    for line in hlo_text.splitlines():
        comp = re.match(r"\s*(ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->", line)
        if comp and line.rstrip().endswith("{"):
            counting = bool(comp.group(1)) or comp.group(2) in loop_comps
            continue
        if not counting:
            continue
        lhs_rhs = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.+)", line)
        if not lhs_rhs:
            continue
        # first lowercase token directly followed by '(' is the opcode
        # (works for tuple-typed results too: '(f32[..], ..) while(...)')
        m = re.search(r"([a-z][a-z0-9\-]*)\(", lhs_rhs.group(1))
        if not m:
            continue
        op = m.group(1)
        if op in _SKIP:
            continue
        counts[op] += 1
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("configs", nargs="*", default=["naive", "optimized"])
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    CONFIGS = {
        "naive": dict(stem_s2d=False, fold_bn=False, fuse_1x1=False),
        "optimized": dict(stem_s2d=True, fold_bn=True, fuse_1x1=True),
        "fuse3x3": dict(stem_s2d=True, fold_bn=True, fuse_1x1=True, fuse_3x3=True),
        "remat": dict(stem_s2d=True, fold_bn=True, fuse_1x1=True, remat=True),
        "pallas": dict(
            stem_s2d=True, fold_bn=True, fuse_1x1=True, use_pallas=True,
            pallas_pool=True,
        ),
    }
    for name in args.configs:
        fn, fargs = build_step(batch=args.batch, hw=args.hw, **CONFIGS[name])
        compiled = fn.lower(*fargs).compile()
        text = compiled.as_text()
        counts = count_ops(text)
        total = sum(counts.values())
        top = ", ".join(f"{k}:{v}" for k, v in counts.most_common(12))
        print(f"{name}: {total} ops total | {top}", flush=True)


if __name__ == "__main__":
    main()
