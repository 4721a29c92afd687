"""Ablation: how much of the mask-search step is the Inception branch-3
maxpool (and other pieces)? Replaces ops with identity (WRONG MATH — timing
only) and re-times the full fwd+bwd step."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

import ivf_tpu.ops.conv as conv_mod
import ivf_tpu.models.layers as layers_mod
import ivf_tpu.models.i3d as i3d_mod
from ivf_tpu.interpret.mask_opt import find_mask
from ivf_tpu.models import i3d_smth

# PATCH TARGETS (round-2 fix — the original probes patched only
# ivf_tpu.ops.conv, but models/layers.py:21 and models/i3d.py:37 bind
# conv3d_same / max_pool3d_same BY VALUE at import, so conv patches and the
# trunk-pool patch never reached the model; only the branch-3 pool resolves
# through a call-time local import):
#   conv3d_same      -> patch layers_mod.conv3d_same
#   branch-3 pools   -> patch conv_mod.max_pool3d_same (call-time import)
#   trunk pools      -> patch i3d_mod.max_pool3d_same


def build_run(batch=128, n_steps=10):
    model = i3d_smth(num_classes=174, dropout_rate=0.0, softmax=True)
    key = jax.random.PRNGKey(0)
    clips = jax.random.normal(key, (batch, 16, 224, 224, 3), jnp.float32)
    variables = jax.jit(model.init)(key, clips[:1])
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )
    score_fn = lambda c: model.apply(variables, c[None], train=False)[0].astype(jnp.float32)
    targets = jnp.arange(batch, dtype=jnp.int32) % 174
    inits = jnp.tile(jnp.where(jnp.arange(16) % 2 == 0, 1.0, -1.0)[None], (batch, 1))
    searcher = jax.vmap(partial(find_mask, score_fn, n_steps=n_steps))

    @jax.jit
    def run(clips, salt):
        res = searcher(clips + salt * 1e-6, targets, inits)
        return jnp.sum(res.mask) + jnp.sum(res.loss)

    return run, clips, batch * n_steps


def timed(run, clips):
    float(run(clips, jnp.float32(0)))
    t0 = time.time()
    float(run(clips, jnp.float32(1)))
    dt = time.time() - t0
    t0 = time.time()
    float(run(clips, jnp.float32(2)))
    return min(dt, time.time() - t0)


def main():
    which = sys.argv[1:] or ["base", "nopool", "no3x3"]
    orig_pool = conv_mod.max_pool3d_same
    orig = {}

    if "base" in which:
        run, clips, steps = build_run()
        print(f"base: {steps/timed(run, clips):.0f} steps/s", flush=True)

    if "nopool" in which:
        def fake_pool(x, window, stride, *a, **k):
            if tuple(stride) == (1, 1, 1):
                return x  # identity for the 9 branch pools (timing only)
            return orig_pool(x, window, stride, *a, **k)

        conv_mod.max_pool3d_same = fake_pool
        try:
            run, clips, steps = build_run()
            print(f"nopool(branch): {steps/timed(run, clips):.0f} steps/s", flush=True)
        finally:
            conv_mod.max_pool3d_same = orig_pool

    if "nopert" in which:
        import ivf_tpu.interpret.mask_opt as mo

        orig_pert = mo.perturb_sequence
        # keep the model backward alive (class score must depend on the
        # mask) without constant-foldable zeros
        mo.perturb_sequence = lambda seq, m, *a, **k: seq + 1e-30 * jnp.sum(m)
        try:
            run, clips, steps = build_run()
            print(f"nopert: {steps/timed(run, clips):.0f} steps/s", flush=True)
        finally:
            mo.perturb_sequence = orig_pert

    if "poolnograd" in which:
        # keep the pool forward, replace its VJP with identity: isolates the
        # select_and_scatter backward share (timing only, wrong gradients)
        import jax as _jax

        @_jax.custom_vjp
        def pool_id_bwd(x):  # geometry closed over: custom_vjp args trace
            return orig_pool(x, (3, 3, 3), (1, 1, 1))

        def _f(x):
            return orig_pool(x, (3, 3, 3), (1, 1, 1)), None

        def _b(_, g):
            return (g,)

        pool_id_bwd.defvjp(_f, _b)

        def fake_pool3(x, window, stride, *a, **k):
            if tuple(stride) == (1, 1, 1) and tuple(window) == (3, 3, 3):
                return pool_id_bwd(x)
            return orig_pool(x, window, stride, *a, **k)

        conv_mod.max_pool3d_same = fake_pool3
        try:
            run, clips, steps = build_run()
            print(f"poolnograd(branch): {steps/timed(run, clips):.0f} steps/s", flush=True)
        finally:
            conv_mod.max_pool3d_same = orig_pool

    if "no3x3" in which:
        # center-tap the 3x3x3 convs (1/27 the FLOPs, same shapes) to
        # measure the share of the big Inception branch convs (timing only)
        orig_conv = layers_mod.conv3d_same

        def center_tap(x, kernel, strides=(1, 1, 1), bias=None, **k):
            if kernel.shape[:3] == (3, 3, 3):
                kernel = kernel[1:2, 1:2, 1:2]
            return orig_conv(x, kernel, strides, bias, **k)

        layers_mod.conv3d_same = center_tap
        try:
            run, clips, steps = build_run()
            print(f"no3x3(center-tap): {steps/timed(run, clips):.0f} steps/s", flush=True)
        finally:
            layers_mod.conv3d_same = orig_conv

    if "nostem" in which:
        # center-tap the 7x7x7 stem: i3d_smth defaults stem_s2d=True and its
        # conv3d_stem_s2d entry is a call-time import from ops.conv, so the
        # patch point is conv_mod.conv3d_stem_s2d (1/343 the stem FLOPs,
        # identical output shape via a 1x1x1 stride-2 conv)
        orig_s2d = conv_mod.conv3d_stem_s2d

        def fake_stem(x, kernel, bias=None):
            return conv_mod.conv3d_same(
                x, kernel[3:4, 3:4, 3:4], (2, 2, 2), bias
            )

        conv_mod.conv3d_stem_s2d = fake_stem
        try:
            run, clips, steps = build_run()
            print(f"nostem: {steps/timed(run, clips):.0f} steps/s", flush=True)
        finally:
            conv_mod.conv3d_stem_s2d = orig_s2d

    if "nopoolall" in which:
        def fake_pool2(x, window, stride, *a, **k):
            st = tuple(stride)
            if st == (1, 1, 1):
                return x
            # strided: replace with strided slice (timing only)
            return x[:, :: st[0], :: st[1], :: st[2]]

        conv_mod.max_pool3d_same = fake_pool2  # branch pools (call-time import)
        i3d_mod.max_pool3d_same = fake_pool2  # trunk pools (import-bound)
        try:
            run, clips, steps = build_run()
            print(f"nopool(all): {steps/timed(run, clips):.0f} steps/s", flush=True)
        finally:
            conv_mod.max_pool3d_same = orig_pool
            i3d_mod.max_pool3d_same = orig_pool


if __name__ == "__main__":
    main()
