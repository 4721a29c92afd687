"""Quantify early-stop (the reference's INTENDED semantics) on the chip.

The reference's per-clip early stop ``abs(oldLoss - loss) < eta`` is dead
code in every driver (``oldLoss`` is never updated —
FindMasksComparison_I3D_smth.py:193-214), but it is the *intended*
semantics and the only identified lever under the <10-min north star
(VERDICT r3 #1). This script measures, at the production config (I3D smth
174, importer-synced weights, batch 128, bf16, central init, lam1=0.01
lam2=0.02 lr=0.2 — FindMasksComparison_I3D_smth.py:106-113,163-164,191):

  * ``trace``: ONE chip run records the full per-step (loss, class-score,
    mask) trajectory of a fixed-300-step search for N clips (chunked into
    tunnel-safe segments, exact production step math via
    ``mask_opt._search_pieces`` with early_stop=False). From that single
    run, host-side analysis derives — for a whole GRID of eta values —
    the one-shot stop-step distribution (the step where the reference's
    ``abs(oldLoss-loss)<eta`` first fires and the row freezes), the
    mask / final-loss / freeze-score deviation of stopping there vs
    running all 300 steps, the realized segment-quantized saving of the
    production chunked driver (a batch skips remaining segments only once
    EVERY row froze), and the continuous-refill upper bound
    (300 / mean stop step). Per-row analysis is exact because early-stop
    freezing couples no rows.
  * ``e2e``: the production ``api.find_masks`` driver wall-clock with
    ``early_stop=True`` vs ``False`` on the same clips (masks/min, the
    segments_launched counter, and the artifact deviation between modes).

Usage:
  python scripts/bench_early_stop.py trace  [--clips 256] [--batch 128]
         [--out earlystop_trace.npz]
  python scripts/bench_early_stop.py analyze [--trace earlystop_trace.npz]
  python scripts/bench_early_stop.py e2e    [--clips 256] [--batch 128]
         [--eta 1e-5] [--chunk 0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference/video_features_pytorch")

import numpy as np

LAM1, LAM2, LR, T, HW, NC = 0.01, 0.02, 0.2, 16, 224, 174
ETAS = (1e-2, 1e-3, 1e-4, 1e-5, 1e-6)


def _importer_variables():
    """f32 importer-synced I3D smth variables (torch init distributions,
    identical weights to the reference's Model)."""
    import importlib

    import torch

    torch.manual_seed(0)
    ref_mod = importlib.import_module("models.I3D_doubled")
    ref = ref_mod.Model(
        num_classes=NC, dropout_keep_prob=0.0, stride_mod_layers="",
        softMax=True,
    )
    ref.eval()
    from ivf_tpu.utils.import_torch import i3d_state_dict_to_variables

    return i3d_state_dict_to_variables(ref.state_dict())


def _bf16_variables(variables):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )


def _pool_shape(hw):
    """None = the exact smth production head (2,7,7) at hw=224; smaller
    hw (CPU smoke only) shrinks the logits avg-pool to the feature map."""
    return None if hw == HW else (2, max(1, hw // 32), max(1, hw // 32))


def _production_model(hw=HW):
    from ivf_tpu.models import i3d_smth

    return i3d_smth(
        num_classes=NC, dropout_rate=0.0, softmax=True,
        stem_s2d=True, fold_bn=True, fuse_1x1=True, pool_impl="argmax",
        pool_shape=_pool_shape(hw),
    )


def build_model_and_vars():
    """Importer-synced I3D smth with the production optimization flags —
    the flags are runtime transforms, same variable structure; weights in
    bf16 exactly as api.find_masks casts them."""
    return _production_model(), _bf16_variables(_importer_variables())


def _fam_geom(args):
    """(t, h, w, nc) for ``--family``. The ConvLSTM family uses the TF KTH
    mask driver's geometry (find_mask_kth.py: 32x120x160); ``--hw`` below
    the production 224 scales it down keeping the 3:4 aspect (CPU smoke),
    and ``--t`` overrides the clip length. Flash labels are frame indices
    1..t-1, so nc = t for the ConvLSTM flash head."""
    if args.family == "i3d":
        return (args.t or T), args.hw, args.hw, NC
    t = args.t or 32
    h, w = (120, 160) if args.hw == HW else (args.hw, args.hw * 4 // 3)
    return t, h, w, t


def _clstm_flash_cfg(args, outdir):
    """The production TF-family KTH ConvLSTM config (the repo's own
    config_clstm_kth_records.py preset = the reference TF flag config:
    layers [32,32] kernel (3,5) stride 2, valid padding, block_order='tf'
    hard-sigmoid Keras cell, lam1 0.02 lam2 0.04, optIter 100, min_score
    0.1) with the flash-task head (num_classes = clip length) on top."""
    import importlib.util

    from ivf_tpu.config import Config

    spec = importlib.util.spec_from_file_location(
        "_cfg_clstm_kth_records",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs",
            "config_clstm_kth_records.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    t, h, w, nc = _fam_geom(args)
    d = dict(mod.config)
    d.update(
        model_name="bench_earlystop_clstm",
        output_dir=outdir,
        num_classes=nc,
        batch_size=args.batch,
        clip_size=t,
        input_spatial_size=(h, w),
        dropout=0.0,
    )
    if t != 32:  # CPU smoke at short t: clip-quarter effective steps
        d["effective_steps"] = tuple(t // 4 * i - 1 for i in range(1, 5))
    cfg = Config.from_dict(d)
    cfg.model.compute_dtype = "bfloat16"
    cfg.mask.opt_iter = args.steps
    return cfg


def make_clips(n, batch, seed=0):
    """Uncorrelated uint8 clips + round-robin labels, production cast."""
    from ivf_tpu.data.synthetic import SyntheticClips

    ds = SyntheticClips(n, t=T, hw=HW, num_classes=NC, seed=seed, lazy=False)
    clips = np.stack([ds[i][0] for i in range(n)])
    labels = np.asarray([ds[i][1] for i in range(n)], np.int32)
    return clips, labels


def make_flash_clips(n, hw=HW, seed=0, t=0, h=0, w=0):
    """Temporally STRUCTURED clips: uniform noise plus one bright square
    'flash' in exactly one frame t*; the label IS t*. This gives the mask
    search a real, temporally localized class signal (the freeze
    perturbation erases the flash by copying frame t*-1 over it), so a
    model trained on this task reproduces the high-class-score regime the
    importer-weights trace can't reach. t* is drawn from 1..T-1 — frame 0
    cannot be frozen away (the freeze recursion keeps u_0 = v_0,
    interpret/perturb.py), so label 0 would be degenerate. ``t``/``h``/``w``
    generalize to the non-square ConvLSTM/KTH geometry (h=w=hw default
    keeps the I3D clips bit-identical to the round-4 ones)."""
    rng = np.random.default_rng(seed)
    t, h, w = t or T, h or hw, w or hw
    clips = rng.integers(0, 256, (n, t, h, w, 3), dtype=np.uint8)
    labels = rng.integers(1, t, n, dtype=np.int32)
    side = min(h, w) // 3
    r0, c0 = h // 2 - h // 6, w // 2 - w // 6
    for i in range(n):
        clips[i, labels[i], r0 : r0 + side, c0 : c0 + side, :] = 255
    return clips, labels


def train_flash_model(args, log=print):
    """Train the importer-initialized I3D on the flash task on the chip.

    Returns f32 trained variables + the held-out top-1. The trainer is a
    scan of ``--train-chunk`` steps per launch over a device-resident
    uint8 training set (the tunnel kills single executions >~1 min and
    charges ~24ms+ per dispatch, so neither one-step-per-launch nor one
    giant program works). Same mixed-precision discipline as
    train/loop.py::make_train_step: bf16 fwd/bwd casts, f32 master
    params / Adam state / BN running stats / loss."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from ivf_tpu.models import i3d_smth
    from ivf_tpu.train.loop import _cast_f32, _compute_loss
    from ivf_tpu.train.metrics import topk_accuracy

    hw = args.hw
    t, h, w, nc = _fam_geom(args)
    if args.family == "convlstm":
        import tempfile

        from ivf_tpu.api import build_model

        cfg = _clstm_flash_cfg(args, tempfile.mkdtemp())
        model = build_model(cfg, softmax_override=False)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 3), jnp.float32)
        )
        # the loaders ship RAW 0..255 clips (data/loaders.py — no load-time
        # normalization, reference parity), so a from-scratch fan-in init
        # saturates every gate (conv(x) pre-activations ~O(100)); rescale
        # the INPUT convs (wx with cin=3) by 1/255 at init — a trainer-side
        # init choice, the production graph is untouched
        variables = {
            **variables,
            "params": jax.tree_util.tree_map_with_path(
                lambda p, a: a / 255.0
                if getattr(p[-1], "key", None) == "wx"
                and a.ndim == 4 and a.shape[-2] == 3
                else a,
                variables["params"],
            ),
        }
    else:
        model = i3d_smth(
            num_classes=NC, dropout_rate=0.0, softmax=False,
            stem_s2d=True, fold_bn=True, fuse_1x1=True,
            pool_shape=_pool_shape(hw),
        )  # fold/fuse are inert under train=True (layers.py:102,203)
        variables = _importer_variables()
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.train_lr)
    opt_state = tx.init(params)

    clips_np, labels_np = make_flash_clips(
        args.train_clips + args.eval_clips, hw, seed=1, t=t, h=h, w=w
    )
    tr_clips = jnp.asarray(clips_np[: args.train_clips])  # device uint8
    tr_labels = jnp.asarray(labels_np[: args.train_clips])
    ev_clips, ev_labels = (
        clips_np[args.train_clips :],
        labels_np[args.train_clips :],
    )

    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(8,))
    def run_chunk(params, opt_state, stats, tr_clips, tr_labels, idxs, rng,
                  step0, k):
        def one_step(carry, xs):
            params, opt_state, stats = carry
            bidx, step = xs
            clips = tr_clips[bidx].astype(jnp.bfloat16)
            labels = tr_labels[bidx]

            def loss_fn(p):
                logits, upd = model.apply(
                    {
                        "params": _cast_f32(p, jnp.bfloat16),
                        "batch_stats": stats,
                    },
                    clips,
                    train=True,
                    rngs={"dropout": jax.random.fold_in(rng, step)},
                    mutable=["batch_stats"],
                )
                loss = _compute_loss(
                    logits.astype(jnp.float32), labels, "cross_entropy"
                )
                new_stats = jax.tree.map(
                    lambda a: a.astype(jnp.float32)
                    if hasattr(a, "dtype") and a.dtype == jnp.bfloat16
                    else a,
                    upd["batch_stats"],
                )
                return loss, (logits, new_stats)

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            (top1,) = topk_accuracy(logits, labels, (1,))
            return (params, new_opt, new_stats), (loss, top1)

        steps = step0 + jnp.arange(k)
        carry, (losses, accs) = jax.lax.scan(
            one_step, (params, opt_state, stats), (idxs, steps)
        )
        return carry, losses, accs

    rng = jax.random.PRNGKey(2)
    host_rng = np.random.default_rng(3)
    t0, step = time.time(), 0
    while step < args.train_steps:
        k = min(args.train_chunk, args.train_steps - step)
        if args.train_fresh and step:
            # regenerate the resident train set every chunk: fresh clips
            # beat a bigger resident set on the tunnel (operand residency
            # is what per-execution overhead scales with), and the CLSTM
            # memorizes any fixed small set (round-5 finding: 128 resident
            # KTH clips -> held-out top1 0.047 at train top1 1.0)
            clips_f, labels_f = make_flash_clips(
                args.train_clips, hw, seed=100 + step, t=t, h=h, w=w
            )
            tr_clips, tr_labels = jnp.asarray(clips_f), jnp.asarray(labels_f)
        idxs = jnp.asarray(
            host_rng.integers(
                0, args.train_clips, (k, args.train_batch), dtype=np.int32
            )
        )
        (params, opt_state, stats), losses, accs = run_chunk(
            params, opt_state, stats, tr_clips, tr_labels, idxs, rng, step, k
        )
        jax.block_until_ready(params)  # tunnel execution-time cap
        step += k
        log(
            f"train step {step}/{args.train_steps} loss "
            f"{np.asarray(losses)[-5:].mean():.4f} top1 "
            f"{np.asarray(accs)[-5:].mean():.3f} "
            f"({time.time() - t0:.0f}s)"
        )

    trained = {"params": params, "batch_stats": stats}
    # eval through the production transforms (I3D fold/fuse are inert in
    # the trainer, live here); the CLSTM model has no such transforms
    eval_model = model if args.family == "convlstm" else _production_model(hw)
    fwd = jax.jit(
        lambda v, c: eval_model.apply(v, c, train=False).argmax(-1)
    )
    v_bf16 = _bf16_variables(trained)
    pred = np.concatenate(
        [
            np.asarray(
                fwd(
                    v_bf16,
                    jnp.asarray(ev_clips[i : i + 32]).astype(jnp.float32),
                )
            )
            for i in range(0, len(ev_clips), 32)
        ]
    )
    top1 = float((pred == ev_labels).mean())
    log(f"held-out top1 after training: {top1:.3f} ({len(ev_labels)} clips)")
    trained_f32 = jax.tree.map(np.asarray, trained)
    return trained_f32, top1


def _trained_variables(args):
    """Flash-task-trained f32 variables, cached on disk: ``--weights-cache``
    (npz tree) lets the several round-5 chip runs share ONE ~15-min training
    leg instead of re-training per run. Cache stores the held-out top1."""
    import os

    import jax

    path = args.weights_cache
    if path and os.path.exists(path):
        d = np.load(path)
        top1 = float(d["__top1__"])
        tree = {}
        for k in d.files:
            if k == "__top1__":
                continue
            col, rest = k.split("/", 1)
            node = tree.setdefault(col, {})
            parts = rest.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = d[k]
        print(f"loaded trained weights from {path} (top1 {top1:.3f})",
              flush=True)
        return tree, top1
    trained, top1 = train_flash_model(args)
    if path:
        flat = {}

        def _walk(node, prefix):
            for k, v in node.items():
                kk = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    _walk(v, kk)
                else:
                    flat[kk] = np.asarray(v)

        _walk(jax.tree.map(np.asarray, trained), "")
        flat["__top1__"] = np.float32(top1)
        np.savez_compressed(path, **flat)
        print(f"saved trained weights to {path}", flush=True)
    return trained, top1


def cmd_trace(args):
    assert args.family == "i3d", (
        "trace/analyze are I3D-only; the ConvLSTM family has e2e legs"
    )
    import jax
    import jax.numpy as jnp

    from ivf_tpu.interpret.mask_opt import (
        _search_pieces,
        init_mask_central,
        make_search_carry,
    )

    eval_top1 = None
    if args.weights == "trained":
        trained, eval_top1 = _trained_variables(args)
        if eval_top1 < 0.9:
            print(
                f"WARNING: held-out top1 {eval_top1:.3f} < 0.9 — the "
                "trained-regime trace below is not meaningful", flush=True,
            )
        model, variables = _production_model(args.hw), _bf16_variables(
            trained
        )
    else:
        model, variables = build_model_and_vars()
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)

    chunk = args.chunk
    n_seg, rem = divmod(args.steps, chunk)
    assert rem == 0, "steps must be a multiple of chunk"

    def segment(seq, target, carry):
        _, _, step = _search_pieces(
            score_fn, seq, target, LAM1, LAM2, LR, "freeze", False, 1e-5,
            True,
        )

        def rec_step(c, _):
            c, _ = step(c, None)
            logits, _, loss, _, _, (_l1, _tv, score), _ = c
            return c, (loss, score, jax.nn.sigmoid(logits))

        return jax.lax.scan(rec_step, carry, None, length=chunk)

    seg_batch = jax.jit(jax.vmap(segment))
    init_batch = jax.jit(
        jax.vmap(lambda c, t: init_mask_central(score_fn, c, t))
    )
    carry_batch = jax.jit(jax.vmap(lambda i: make_search_carry(i, LR)))
    cast = jax.jit(lambda x: x.astype(jnp.float32))

    if args.task == "flash":
        clips_np, labels_np = make_flash_clips(args.clips, args.hw, seed=7)
    else:
        clips_np, labels_np = make_clips(args.clips, args.batch)
    losses = np.zeros((args.clips, args.steps), np.float32)
    scores = np.zeros((args.clips, args.steps), np.float32)
    masks = np.zeros((args.clips, args.steps, T), np.float32)
    t0 = time.time()
    for b0 in range(0, args.clips, args.batch):
        clips = cast(jnp.asarray(clips_np[b0 : b0 + args.batch]))
        targets = jnp.asarray(labels_np[b0 : b0 + args.batch])
        inits = init_batch(clips, targets)
        carry = carry_batch(inits)
        jax.block_until_ready(carry)
        for s in range(n_seg):
            carry, (ls, sc, ms) = seg_batch(clips, targets, carry)
            jax.block_until_ready(carry)  # tunnel execution-time cap
            sl = slice(s * chunk, (s + 1) * chunk)
            # vmapped scan ys: (B, chunk) / (B, chunk, T)
            losses[b0 : b0 + args.batch, sl] = np.asarray(ls)
            scores[b0 : b0 + args.batch, sl] = np.asarray(sc)
            masks[b0 : b0 + args.batch, sl] = np.asarray(ms)
            print(
                f"batch@{b0} seg {s + 1}/{n_seg} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    np.savez_compressed(
        args.out,
        losses=losses,
        scores=scores,
        masks=masks,
        labels=labels_np,
        batch=args.batch,
        chunk=chunk,
        task=args.task,
        weights=args.weights,
        eval_top1=-1.0 if eval_top1 is None else eval_top1,
    )
    print(f"trace saved to {args.out} ({time.time() - t0:.0f}s)")


def cmd_analyze(args):
    d = np.load(args.trace)
    losses, scores, masks = d["losses"], d["scores"], d["masks"]
    n, n_steps = losses.shape
    batch = int(d["batch"])
    deltas = np.abs(np.diff(losses, axis=1))  # deltas[:, k-1] = |L_{k-1}-L_k|
    final_loss, final_score, final_mask = (
        losses[:, -1],
        scores[:, -1],
        masks[:, -1],
    )
    report = {"clips": n, "steps": n_steps}
    for eta in ETAS:
        fired = deltas < eta  # fired[:, k-1] -> row freezes at step k
        any_fire = fired.any(axis=1)
        stop = np.where(any_fire, np.argmax(fired, axis=1) + 1, n_steps)
        idx = np.minimum(stop, n_steps - 1)
        rows = np.arange(n)
        # a row frozen at step k keeps logits L_k: its mask is the one
        # recorded after step k-1, its reported loss/score are step k's
        dev_mask = np.abs(masks[rows, idx - 1] - final_mask).max(axis=1)
        dev_mask = np.where(any_fire, dev_mask, 0.0)
        dev_loss = np.where(
            any_fire,
            np.abs(losses[rows, idx] - final_loss)
            / np.maximum(np.abs(final_loss), 1e-12),
            0.0,
        )
        dev_score = np.where(
            any_fire, np.abs(scores[rows, idx] - final_score), 0.0
        )
        # realized saving of the production chunked driver: a batch skips
        # its remaining segments only once EVERY row froze
        for chunk in (100, 50, 25):
            segs = 0
            for b0 in range(0, n, batch):
                s = stop[b0 : b0 + batch]
                segs += (
                    int(np.ceil(s.max() / chunk))
                    if (s < n_steps).all()
                    else int(np.ceil(n_steps / chunk))
                )
            report.setdefault(f"segments_chunk{chunk}", {})[
                f"eta{eta:g}"
            ] = segs
        report[f"eta{eta:g}"] = {
            "frozen_frac": round(float(any_fire.mean()), 4),
            "stop_p50": int(np.percentile(stop, 50)),
            "stop_p90": int(np.percentile(stop, 90)),
            "stop_p99": int(np.percentile(stop, 99)),
            "stop_max": int(stop.max()),
            "stop_mean": round(float(stop.mean()), 1),
            "refill_speedup_bound": round(n_steps / float(stop.mean()), 2),
            "dev_mask_max": float(f"{dev_mask.max():.3e}"),
            "dev_loss_rel_max": float(f"{dev_loss.max():.3e}"),
            "dev_freeze_score_max": float(f"{dev_score.max():.3e}"),
        }
    n_segs_fixed = (n // batch) * (n_steps // 100)
    report["segments_fixed_chunk100"] = n_segs_fixed
    # Patience grid (MaskConfig.eta_patience): freeze only after M
    # CONSECUTIVE sub-eta deltas — a length-M all-True window of `fired`
    # over indices j0..j0+M-1 means the streak hits M at step j0+M. Derived
    # host-side from the SAME trace (deltas) the production step function
    # thresholds, so these are the exact stops the driver would realize.
    from numpy.lib.stride_tricks import sliding_window_view

    rows = np.arange(n)
    report["patience"] = {}
    for eta in ETAS:
        fired = deltas < eta
        for M in (1, 3, 5):
            if M > fired.shape[1]:
                continue
            win = sliding_window_view(fired, M, axis=1).all(axis=-1)
            any_fire = win.any(axis=1)
            stop = np.where(any_fire, np.argmax(win, axis=1) + M, n_steps)
            idx = np.minimum(stop, n_steps - 1)
            dev_mask = np.where(
                any_fire,
                np.abs(masks[rows, idx - 1] - final_mask).max(axis=1),
                0.0,
            )
            dev_score = np.where(
                any_fire, np.abs(scores[rows, idx] - final_score), 0.0
            )
            report["patience"][f"eta{eta:g}_M{M}"] = {
                "frozen_frac": round(float(any_fire.mean()), 4),
                "stop_p50": int(np.percentile(stop, 50)),
                "stop_p90": int(np.percentile(stop, 90)),
                "stop_max": int(stop.max()),
                "stop_mean": round(float(stop.mean()), 1),
                "refill_speedup_bound": round(
                    n_steps / float(stop.mean()), 2
                ),
                "dev_mask_max": float(f"{dev_mask.max():.3e}"),
                "dev_freeze_score_max": float(f"{dev_score.max():.3e}"),
            }
    if str(d.get("task", "noise")) == "flash":
        # semantic check: on the flash task the minimal freeze mask must
        # sit ON the flash frame t* (= the label) to erase the signal
        labels = d["labels"]
        top_frame = final_mask.argmax(axis=1)
        report["flash"] = {
            "weights": str(d.get("weights", "importer")),
            "eval_top1": float(d.get("eval_top1", -1.0)),
            "final_score_mean": round(float(final_score.mean()), 4),
            "final_score_p10": round(float(np.percentile(final_score, 10)), 4),
            "mask_argmax_hit": round(float((top_frame == labels).mean()), 4),
            "mask_argmax_hit_pm1": round(
                float((np.abs(top_frame - labels) <= 1).mean()), 4
            ),
        }
    print(json.dumps(report, indent=1))


class _FlashDataset:
    """make_flash_clips as a find_masks-consumable dataset
    (``__getitem__ -> (clip_uint8, label, clip_id)``)."""

    def __init__(self, n, hw, seed=7, t=0, h=0, w=0):
        self.clips, self.labels = make_flash_clips(
            n, hw, seed=seed, t=t, h=h, w=w
        )

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return self.clips[i], int(self.labels[i]), f"clip{i}"


def cmd_e2e(args):
    """Fixed-300 vs early-stop (and refill on/off) through the FULL
    api.find_masks driver. ``--modes`` picks the measured legs;
    ``--weights trained --task flash`` reproduces the long-tailed
    stop-step regime where refill is the only working mechanism
    (EARLYSTOP_r04.json trained_flash)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    import ivf_tpu.api as api_mod
    from ivf_tpu.config import Config
    from ivf_tpu.data.synthetic import SyntheticClips

    eval_top1 = None
    ft, fh, fw, fnc = _fam_geom(args)
    if args.family == "convlstm":
        # the ConvLSTM/KTH family builds natively from the production TF
        # preset config — no build_model monkeypatch needed (the I3D leg
        # patches only to inject the runtime-transform flags)
        assert args.weights == "trained" and args.task == "flash", (
            "--family convlstm supports the trained-flash regime only "
            "(no importer checkpoint exists for the CLSTM family)"
        )
        trained, eval_top1 = _trained_variables(args)
        model, variables = None, _bf16_variables(trained)
        cfg = _clstm_flash_cfg(args, tempfile.mkdtemp())
    else:
        if args.weights == "trained":
            trained, eval_top1 = _trained_variables(args)
            model, variables = _production_model(args.hw), _bf16_variables(
                trained
            )
        else:
            model, variables = build_model_and_vars()
        # find_masks re-casts f32->bf16; ours already are bf16 (no-op)
        cfg = Config.from_dict(
            {
                "model_name": "bench_earlystop",
                "output_dir": tempfile.mkdtemp(),
                "conv_model": "i3d_smth",
                "num_classes": NC,
                "batch_size": args.batch,
                "clip_size": T,
                "input_spatial_size": args.hw,
                "dropout": 0.0,
            }
        )
        cfg.mask.opt_iter = args.steps
        cfg.model.compute_dtype = "bfloat16"
        cfg.model.pool_impl = "argmax"
    if args.chunk:
        cfg.mask.chunk_steps = args.chunk
    cfg.mask.eta_patience = args.eta_patience
    orig_bm = api_mod.build_model
    if model is not None:
        api_mod.build_model = lambda c, softmax_override=None: model
    results = {}
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    try:
        if args.task == "flash":
            ds = _FlashDataset(args.clips, args.hw, seed=7, t=ft, h=fh, w=fw)
            warm_ds = _FlashDataset(
                args.batch, args.hw, seed=11, t=ft, h=fh, w=fw
            )
        else:
            ds = SyntheticClips(
                args.clips, t=T, hw=args.hw, num_classes=NC, lazy=False
            )
            warm_ds = SyntheticClips(
                args.batch, t=T, hw=args.hw, num_classes=NC
            )
        for mode in ["warm"] + modes:
            cfg.mask.early_stop = mode.startswith("early")
            cfg.mask.refill = (
                False if mode == "early_norefill" else None
            )
            cfg.mask.eta = args.eta
            stats = {}
            t0 = time.time()
            tm, _ = api_mod.find_masks(
                cfg,
                variables,
                dataset=ds if mode != "warm" else warm_ds,
                save_viz=False,
                do_gradcam=True,
                stats=stats,
            )
            dt = time.time() - t0
            if mode == "warm":
                continue
            results[mode] = {
                "masks": len(tm),
                "minutes": round(dt / 60, 2),
                "masks_per_min": round(len(tm) / (dt / 60), 1),
                "segments_launched": stats.get("segments_launched"),
                "refill_flushes": stats.get("refill_flushes"),
                "refill_requeued_rows": stats.get("refill_requeued_rows"),
                "steps_run": stats.get("n_steps_run"),
                # keyed by clip id: refill emits in RETIREMENT order, so
                # positional stacking would compare different clips
                "masks_by_id": {
                    r["video_id"]: r["time_mask"] for r in tm
                },
                "freeze_by_id": {
                    r["video_id"]: r["freeze_score"] for r in tm
                },
            }
            print(f"[{mode}] {json.dumps({k: v for k, v in results[mode].items() if not k.endswith('_by_id') and k != 'steps_run'})}", flush=True)
    finally:
        api_mod.build_model = orig_bm
    base_mode = modes[0]
    base = results[base_mode]
    base_masks = base.pop("masks_by_id")
    base_freeze = base.pop("freeze_by_id")
    base.pop("steps_run", None)
    out = {
        "batch": args.batch,
        "eta": args.eta,
        "chunk": args.chunk or "auto",
        "task": args.task,
        "weights": args.weights,
        "eval_top1": eval_top1,
        base_mode: base,
    }
    for mode in modes[1:]:
        e = results[mode]
        ids = sorted(base_masks)
        e_masks = e.pop("masks_by_id")
        e_freeze = e.pop("freeze_by_id")
        assert sorted(e_masks) == ids, "mode result sets differ"
        dev = float(
            max(np.abs(base_masks[i] - e_masks[i]).max() for i in ids)
        )
        dev_fs = float(
            max(abs(base_freeze[i] - e_freeze[i]) for i in ids)
        )
        sr = e.pop("steps_run", None) or []
        e[f"dev_mask_max_vs_{base_mode}"] = dev
        e[f"dev_freeze_score_max_vs_{base_mode}"] = dev_fs
        e["steps_run_p50"] = int(np.percentile(sr, 50)) if sr else None
        e["steps_run_max"] = int(max(sr)) if sr else None
        out[mode] = e
    print(json.dumps(out, indent=1))
    # Persist the production-config leg for bench.py's driver-level
    # secondary (driver_masks_metrics): 'early' is the fast mode with
    # refill auto-on — the figure the north-star target is written in.
    if (
        "early" in results
        and args.family == "i3d"
        and args.hw == HW
        and args.steps == 300
    ):
        cache = {
            "driver_masks_per_min_chip": results["early"]["masks_per_min"],
            "driver_provenance": (
                f"scripts/bench_early_stop.py e2e --task {args.task} "
                f"--weights {args.weights} --clips {args.clips} "
                f"--eta {args.eta:g} --eta-patience {args.eta_patience} "
                "(early_stop + refill auto, production "
                "batch 128 / 300-step budget / Grad-CAM on), measured "
                f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}"
            ),
            "driver_stats": {
                k: results["early"][k]
                for k in (
                    "masks", "minutes", "segments_launched",
                    "refill_flushes", "refill_requeued_rows",
                )
            },
        }
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "driver_masks_cache.json",
        )
        with open(path, "w") as f:
            json.dump(cache, f, indent=1)
        print(f"driver-level cache written to {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=("trace", "analyze", "e2e"))
    ap.add_argument("--clips", type=int, default=256)
    ap.add_argument(
        "--family", default="i3d", choices=("i3d", "convlstm"),
        help="'convlstm': the TF KTH mask driver's workload (32x120x160 "
        "ConvLSTM, 100-step budget — find_mask_kth.py); trained-flash only",
    )
    ap.add_argument(
        "--t", type=int, default=0,
        help="clip length override (0 = family default; CPU smoke)",
    )
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument(
        "--steps", type=int, default=0,
        help="search budget (0 = family default: 300 smth / 100 KTH per "
        "the reference drivers)",
    )
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--eta", type=float, default=1e-5)
    ap.add_argument(
        "--eta-patience", type=int, default=1,
        help="freeze after M consecutive sub-eta steps (e2e legs; 1 = the "
        "reference's one-shot criterion — MaskConfig.eta_patience)",
    )
    ap.add_argument("--out", default="earlystop_trace.npz")
    ap.add_argument("--trace", default="earlystop_trace.npz")
    ap.add_argument(
        "--task", default="noise", choices=("noise", "flash"),
        help="'flash': temporally structured clips (label = flash frame)",
    )
    ap.add_argument(
        "--weights", default="importer", choices=("importer", "trained"),
        help="'trained': train the flash task on-chip first, then trace "
        "the search in the high-class-score regime (PERF.md r4 caveat)",
    )
    ap.add_argument("--hw", type=int, default=HW,
                    help="spatial size for the flash/trained path "
                    "(CPU smoke uses a small value)")
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--train-batch", type=int, default=16)
    # tunnel economics: per-execution overhead scales with operand bytes
    # (~30 s/GB), and the resident train set rides along on every launch —
    # keep it small (128 uint8 clips = 300 MB) and amortize over 40 steps
    ap.add_argument("--train-chunk", type=int, default=40)
    ap.add_argument("--train-clips", type=int, default=128)
    ap.add_argument("--eval-clips", type=int, default=64)
    ap.add_argument("--train-lr", type=float, default=3e-4)
    ap.add_argument(
        "--train-fresh", action="store_true",
        help="regenerate the resident train set every chunk (defeats "
        "memorization of a small fixed set — needed for the CLSTM family)",
    )
    ap.add_argument(
        "--weights-cache", default="",
        help="npz path caching the flash-trained variables across runs "
        "(empty: always retrain)",
    )
    ap.add_argument(
        "--modes", default="fixed,early",
        help="comma list of e2e legs: fixed | early | early_norefill "
        "(first leg is the deviation baseline)",
    )
    ap.add_argument(
        "--backend", default="tpu", choices=("cpu", "tpu"),
        help="'cpu' is for smoke-testing the harness at tiny sizes",
    )
    args = ap.parse_args()
    if not args.steps:
        # the reference budgets: 300 Adam steps/clip on smth
        # (FindMasksComparison_I3D_smth.py:115-119), 100 on KTH
        # (find_mask_kth.py / config_train_kth_clstm.py optIter)
        args.steps = 100 if args.family == "convlstm" else 300
    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.phase == "trace" and not args.chunk:
        args.chunk = 50
    {"trace": cmd_trace, "analyze": cmd_analyze, "e2e": cmd_e2e}[args.phase](
        args
    )


if __name__ == "__main__":
    main()
