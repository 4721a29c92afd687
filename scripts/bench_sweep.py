"""Round-2 perf sweep for the mask-search hot loop on the real TPU chip.

Each variant runs the vmapped find_mask scan (n_steps inside one jit) and
reports mask-steps/s/chip. Axon timing rules apply: salt the inputs, fetch
a scalar, take the min of two timed runs after a warm run.

Usage: python scripts/bench_sweep.py [variant ...]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def build(batch, n_steps, *, dtype="bfloat16", remat=False, fuse_3x3=False,
          clip_bf16=False, use_pallas=False, pallas_pool=False,
          fuse_pool_conv=False, pool_impl="reduce_window", ckpt_score=False,
          hot=False, vmem_kib=0, t=16, hw=224):
    from ivf_tpu.interpret.mask_opt import find_mask
    from ivf_tpu.models import i3d_smth

    model = i3d_smth(
        num_classes=174, dropout_rate=0.0, softmax=True,
        stem_s2d=True, fold_bn=True, fuse_1x1=True,
        fuse_3x3=fuse_3x3, remat=remat,
        use_pallas=use_pallas, pallas_pool=pallas_pool,
        fuse_pool_conv=fuse_pool_conv, pool_impl=pool_impl,
    )
    key = jax.random.PRNGKey(0)
    clips = jax.random.normal(key, (batch, t, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init)(key, clips[:1])
    if dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
    if clip_bf16:
        clips = clips.astype(jnp.bfloat16)
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[0].astype(jnp.float32)
    if ckpt_score:
        # full-recompute checkpointing: backward re-runs the forward instead
        # of loading residuals -> activation memory ~O(1), bigger batches fit
        score_fn = jax.checkpoint(score_fn)
    targets = jnp.arange(batch, dtype=jnp.int32) % 174
    inits = jnp.tile(jnp.where(jnp.arange(t) % 2 == 0, 1.0, -1.0)[None], (batch, 1))
    searcher = jax.vmap(partial(find_mask, score_fn, n_steps=n_steps))

    if hot:
        # the production find_masks compile path (utils/compile.py::hot_jit,
        # scoped-VMEM fusion budget = the full 128 MB). Bypasses the axon
        # compile server's cache, so expect 8-15 min compile variance.
        from ivf_tpu.utils.compile import hot_jit as _jit
    elif vmem_kib:
        # the tblock fused-branch3 kernel's Mosaic stack frame needs more
        # than the 16 MB scoped-VMEM default (see ops/pallas/fused_branch3)
        _jit = partial(
            jax.jit,
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)},
        )
    else:
        _jit = jax.jit

    @_jit
    def run(clips, targets, inits, salt):
        res = searcher(clips + (salt * 1e-6).astype(clips.dtype), targets, inits)
        return jnp.sum(res.mask) + jnp.sum(res.loss.astype(jnp.float32))

    return run, (clips, targets, inits)


def timed(run, args, salt):
    t0 = time.time()
    out = float(run(*args, jnp.float32(salt)))
    assert np.isfinite(out), out
    return time.time() - t0


VARIANTS = {
    "base32": dict(batch=32),
    "base64": dict(batch=64),
    "base96": dict(batch=96),
    "base128b": dict(batch=128),
    "base144": dict(batch=144),
    "base128": dict(batch=128),
    "remat128": dict(batch=128, remat=True),
    "remat192": dict(batch=192, remat=True),
    "remat256": dict(batch=256, remat=True),
    "fuse3x3_128": dict(batch=128, fuse_3x3=True),
    "clipbf16_128": dict(batch=128, clip_bf16=True),
    "base160": dict(batch=160),
    "clipbf16_remat256": dict(batch=256, remat=True, clip_bf16=True),
    "clipbf16_192": dict(batch=192, clip_bf16=True),
    "pallas1x1_128": dict(batch=128, use_pallas=True),
    "pallaspool_128": dict(batch=128, pallas_pool=True),
    "pallasboth_128": dict(batch=128, use_pallas=True, pallas_pool=True),
    "ckpt128": dict(batch=128, ckpt_score=True),
    "ckpt192": dict(batch=192, ckpt_score=True),
    "ckpt256": dict(batch=256, ckpt_score=True),
    "ckpt384": dict(batch=384, ckpt_score=True),
    # combined: bf16 clip storage frees the f32 clip residency so the
    # checkpoint/remat memory savings translate into bigger batches
    "ckptbf16_256": dict(batch=256, ckpt_score=True, clip_bf16=True),
    "ckptbf16_384": dict(batch=384, ckpt_score=True, clip_bf16=True),
    "ckptbf16_512": dict(batch=512, ckpt_score=True, clip_bf16=True),
    "rematbf16_192": dict(batch=192, remat=True, clip_bf16=True),
    "rematbf16_256": dict(batch=256, remat=True, clip_bf16=True),
    "rematbf16_384": dict(batch=384, remat=True, clip_bf16=True),
    "clipbf16_256": dict(batch=256, clip_bf16=True),
    # fused branch-3 (pool + 1x1 conv) Pallas kernel
    "fusedpool_128": dict(batch=128, fuse_pool_conv=True),
    # round 5: whole-T frame-block fused branch 3 (each frame read once
    # instead of 3x fwd / 5x bwd). Compares head-to-head against
    # argmaxpool_128 (the production winner): both replace ONLY the
    # stride-1 branch pools, so they are alternatives, not composable
    "fusedtblock_128": dict(
        batch=128, fuse_pool_conv="tblock", vmem_kib=65536
    ),
    "fusedpool_bf16_128": dict(batch=128, fuse_pool_conv=True, clip_bf16=True),
    "fusedpool_64": dict(batch=64, fuse_pool_conv=True),
    "fusedpool_f3_128": dict(batch=128, fuse_pool_conv=True, fuse_3x3=True),
    # separable shifted-slice max pools: elementwise-select VJP, no
    # select_and_scatter anywhere in the step
    "shiftpool_128": dict(batch=128, pool_impl="shift"),
    "shiftpool_bf16_128": dict(batch=128, pool_impl="shift", clip_bf16=True),
    "shiftpool_f3_128": dict(batch=128, pool_impl="shift", fuse_3x3=True),
    "shiftpool_96": dict(batch=96, pool_impl="shift"),
    "shiftpool_160": dict(batch=160, pool_impl="shift", clip_bf16=True),
    # argmax-index pool VJP: uint8 index plane replaces the x/y value
    # reads in the branch-pool backward stencil (fewest-byte pool bwd).
    # 'argmax' = stride-1 branch pools only (+9% measured); 'argmax_full'
    # adds the strided trunk pools (dilated-pad scatter) — trips the
    # remote compiler (HTTP 500) at batch 128, kept for re-testing.
    "argmaxpool_128": dict(batch=128, pool_impl="argmax"),
    "argmaxpool_f3_128": dict(batch=128, pool_impl="argmax", fuse_3x3=True),
    "argmaxfull_128": dict(batch=128, pool_impl="argmax_full"),
    "argmaxfull_96": dict(batch=96, pool_impl="argmax_full"),
    "argmaxfull_64": dict(batch=64, pool_impl="argmax_full"),
    "argmaxfull_32": dict(batch=32, pool_impl="argmax_full"),
    "argmaxpool_144": dict(batch=144, pool_impl="argmax"),
    # argmax branch pools + shift-chain trunk pools: kills the remaining
    # select_and_scatter on the strided pools without the argmax_full
    # scatter program that 500s the remote compiler
    "argmaxshift_128": dict(batch=128, pool_impl="argmax_shift"),
    "argmaxpool_160": dict(batch=160, pool_impl="argmax"),
    # the production compile path: argmax pools + hot_jit's scoped-VMEM
    # fusion budget (vmem alone measured +1.8% pre-argmax)
    "argmaxpool_vmem_128": dict(batch=128, pool_impl="argmax", hot=True),
    "eqbwdpool_128": dict(batch=128, pool_impl="eqbwd"),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    n_steps = 30
    for name in names:
        kw = dict(VARIANTS[name])
        batch = kw.pop("batch")
        try:
            t_build = time.time()
            run, args = build(batch, n_steps, **kw)
            dt0 = timed(run, args, 0.0)  # compile + warm
            dt = min(timed(run, args, 1.0), timed(run, args, 2.0))
            sps = batch * n_steps / dt
            print(
                f"{name}: {sps:.0f} mask-steps/s  "
                f"(batch {batch}, {dt:.2f}s/run, compile+warm {dt0:.0f}s, "
                f"build {time.time()-t_build-dt0-2*dt:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
