"""High-level drivers — the framework's public entry points.

Mirrors the de-facto public surface of the reference (SURVEY.md §7):
  * ``train``      <- train_i3d_smth.py / train_i3d_kth32.py /
                      train_clstm_kth.py / TF train_kth.py / train_smth.py
  * ``infer``      <- inference_kth.py / inference_smthsmth.py
  * ``find_masks`` <- FindMasksComparison_I3D_{smth,KTH}.py /
                      mask/find_mask_{kth,smth}.py
  * ``grad_cam_run`` <- grad_cam_videos.py / mask/gradcam.py standalone

The TPU-native difference: ``find_masks`` runs the per-clip 300-step mask
optimization *vmapped over the whole batch* and the Grad-CAM pass vmapped
likewise, instead of one clip at a time.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ivf_tpu.config import Config
from ivf_tpu.models import ConvLSTMClassifier, get_model
from ivf_tpu.models.i3d import I3D


_cast_f32 = jax.jit(lambda x: x.astype(jnp.float32))
# loaders ship uint8 batches (4x fewer host->HBM bytes); this single jitted
# device-side cast restores the float path for consumers


def default_effective_steps(clip_size: int) -> tuple:
    """Reference defaults: CLSTM_4.py:11 hardcodes [4,8,12,15] for step=16
    while the KTH driver passes [7,15,23,31] for 32 (train_clstm_kth.py:51-55)
    — two different conventions in the reference itself; each is matched at
    its clip length, quarters-minus-one otherwise."""
    if clip_size == 16:
        return (4, 8, 12, 15)
    q = clip_size // 4
    return tuple(q * k - 1 for k in range(1, 5))


def build_model(cfg: Config, softmax_override: Optional[bool] = None):
    m = cfg.model
    softmax = m.soft_max if softmax_override is None else softmax_override
    name = m.conv_model.lower()
    if "i3d" in name:
        kwargs = dict(
            num_classes=m.num_classes,
            dropout_rate=m.dropout,
            softmax=softmax,
            last_relu=m.last_relu,
            last_stride=m.last_stride,
            stride_mod_layers=tuple(m.stride_mod_layers),
            use_pallas=m.use_pallas,
            fuse_pool_conv=m.fuse_pool_conv,
            pool_impl=m.pool_impl,
        )
        if "kth" in name:
            kwargs["final_time_length"] = m.final_temp_time
        return get_model(m.conv_model, **kwargs)
    if "clstm" in name or "convlstm" in name:
        eff = tuple(m.effective_steps) or default_effective_steps(
            cfg.data.clip_size
        )
        ksize = (
            (m.conv_kernel_size, m.conv_kernel_size_2)
            if m.conv_kernel_size_2
            else m.conv_kernel_size
        )
        # Keras 'same' with stride 1 / odd kernels equals torch symmetric
        padding = "valid" if m.padding_clstm == "valid" else "torch"
        return ConvLSTMClassifier(
            head="gap" if "gap" in name else "fc",
            num_classes=m.num_classes,
            nb_lstm_units=m.clstm_hidden,
            lstm_layers=m.clstm_layers,
            conv_kernel_size=ksize,
            conv_stride=m.conv_stride,
            pool_kernel=tuple(m.pool_kernel),
            effective_steps=eff,
            batch_norm=m.batch_norm,
            dropout_rate=m.dropout,
            use_entire_seq=m.use_entire_seq,
            add_softmax=softmax,
            block_order=m.block_order,
            pooling=m.pooling,
            recurrent_activation=m.recurrent_activation,
            # Keras ConvLSTM2D default (TF family only)
            unit_forget_bias=(m.block_order == "tf"),
            x_padding=padding,
            # per-layer BN for the TF family (one BN per block,
            # clstm.py:49); the torch family keeps its shared-BN quirk
            shared_bn=(m.block_order != "tf"),
            use_pallas=m.use_pallas,
        )
    return get_model(m.conv_model, num_classes=m.num_classes)


def build_dataset(cfg: Config, split: str = "train", get_item_id: bool = False):
    from ivf_tpu.data import FrameDirDataset, KTHFrameDataset
    from ivf_tpu.data.loaders import RecordDataset

    d = cfg.data
    if d.input_mode == "records":
        paths = list(
            d.record_paths_train if split == "train" else d.record_paths_val
        ) or list(d.record_paths)
        if not paths and d.records_folder and (d.train_subjects or d.val_subjects):
            # per-subject shard selection (TF train_kth.py:13-34)
            from ivf_tpu.data.kth import subject_split_paths

            tr, va, _, _ = subject_split_paths(
                d.records_folder,
                d.train_subjects,
                d.val_subjects,
                d.subjects_clips_csv or None,
            )
            paths = tr if split == "train" else va
        return RecordDataset(
            paths, clip_size=d.clip_size, get_item_id=get_item_id
        )
    root = os.path.join(d.data_folder, split)
    if "kth" in cfg.model.conv_model.lower():
        if split == "validation" and not os.path.isdir(root):
            # reference KTH layout names the eval split 'test'
            # (train_clstm_kth.py:100-115: data_folder/train, data_folder/test)
            alt = os.path.join(d.data_folder, "test")
            if os.path.isdir(alt):
                root = alt
        if not os.path.isdir(root):
            root = d.data_folder  # flat numbered-dir layout has no splits
    if "kth" in cfg.model.conv_model.lower():
        return KTHFrameDataset(root, clip_size=d.clip_size, get_item_id=get_item_id)
    return FrameDirDataset(
        root,
        clip_size=d.clip_size,
        step_size=d.step_size_train if split == "train" else d.step_size_val,
        get_item_id=get_item_id,
    )


def build_loader(cfg: Config, dataset, shuffle: bool, mesh=None):
    from ivf_tpu.data import ClipLoader

    return ClipLoader(
        dataset,
        batch_size=cfg.data.batch_size,
        shuffle=shuffle,
        num_workers=cfg.data.num_workers,
        mesh=mesh,
        seed=cfg.seed,
    )


def _save_dir(cfg: Config) -> str:
    path = os.path.join(cfg.output_dir, cfg.model_name)
    os.makedirs(path, exist_ok=True)
    return path


def train(
    cfg: Config,
    eval_only: bool = False,
    resume: bool = False,
    mesh=None,
    train_dataset=None,
    val_dataset=None,
):
    """Full training driver (train_i3d_smth.main, 33-189)."""
    from ivf_tpu.train import (
        ReduceLROnPlateau,
        build_optimizer,
        create_train_state,
        evaluate,
        fit,
        make_eval_step,
    )
    from ivf_tpu.utils.checkpoint import Checkpointer
    from ivf_tpu.viz import PlotLearning

    save_dir = _save_dir(cfg)
    model = build_model(cfg)
    loss_type = "nll_on_probs" if cfg.model.soft_max else "cross_entropy"

    train_dataset = train_dataset or build_dataset(cfg, "train")
    val_dataset = val_dataset or build_dataset(cfg, "validation")

    sample = jnp.zeros(
        (1, cfg.data.clip_size, *_clip_hw(cfg), 3), jnp.float32
    )
    tx = build_optimizer(
        cfg.optim.optimizer.lower(),
        cfg.optim.lr,
        momentum=cfg.optim.momentum,
        weight_decay=cfg.optim.weight_decay,
    )
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed), sample, tx)
    if mesh is not None:
        from ivf_tpu.parallel import replicate

        state = replicate(state, mesh)

    ckpt = Checkpointer(save_dir)
    start_epoch, best_loss = 0, float("inf")
    if resume and ckpt.exists():
        state, start_epoch, best_loss = ckpt.restore(state)
        print(f" > resumed from epoch {start_epoch} (best loss {best_loss:.4f})")
    elif cfg.model.pretrained_model_path not in ("", "no_ckpt", None):
        state = _load_pretrained(cfg, model, state)

    if eval_only:
        res = evaluate(
            state,
            build_loader(cfg, val_dataset, False, mesh),
            make_eval_step(loss_type),
            collect_predictions=True,
        )
        return state, res

    max_steps = 5 if cfg.test_run else None
    if cfg.optim.lr_schedule == "patience_halving":
        from ivf_tpu.train import PatienceHalving

        scheduler = PatienceHalving(
            cfg.optim.lr,
            patience=cfg.optim.lr_patience,
            lr_end=cfg.optim.last_lr,
        )
    else:
        scheduler = ReduceLROnPlateau(
            cfg.optim.lr,
            factor=cfg.optim.lr_factor,
            patience=cfg.optim.lr_patience,
        )
    plotter = PlotLearning(os.path.join(save_dir, "plots"), cfg.model.num_classes)
    # One ClipLoader reused across epochs: its internal _epoch counter
    # advances per __iter__, reshuffling with seed+epoch like torch's
    # DataLoader does per epoch (a fresh loader each epoch would replay
    # the same order every time).
    train_loader = build_loader(cfg, train_dataset, cfg.data.shuffle, mesh)
    val_loader = build_loader(cfg, val_dataset, False, mesh)
    state, history = fit(
        state,
        lambda: train_loader,
        lambda: val_loader,
        num_epochs=cfg.optim.num_epochs,
        loss_type=loss_type,
        scheduler=scheduler,
        checkpointer=ckpt,
        rng=jax.random.PRNGKey(cfg.seed + 1),
        print_freq=cfg.optim.print_freq,
        last_lr=cfg.optim.last_lr,
        max_steps_per_epoch=max_steps,
        plotter=plotter,
        kernel_l2=cfg.model.kernel_l2,
        start_epoch=start_epoch,
        best_loss=best_loss,
    )
    return state, history


def _clip_hw(cfg: Config):
    s = cfg.data.input_spatial_size
    if isinstance(s, (tuple, list)):
        return tuple(s)
    return (s, s)


def _load_pretrained(cfg: Config, model, state):
    """Import a reference torch checkpoint (.pth/.pth.tar), a reference TF
    bundle (a ``model.ckpt`` Saver prefix with .index/.data files), or an
    orbax checkpoint directory."""
    path = cfg.model.pretrained_model_path
    if os.path.exists(path + ".index"):  # TF Saver prefix
        from ivf_tpu.utils.import_tf import load_tf_checkpoint

        family = "i3d" if "i3d" in cfg.model.conv_model.lower() else "clstm"
        variables = load_tf_checkpoint(path, family)
        return state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats") or state.batch_stats,
        )
    if path.endswith((".pth", ".pth.tar", ".pt")):
        from ivf_tpu.utils.import_torch import (
            convlstm_state_dict_to_variables,
            i3d_state_dict_to_variables,
            load_checkpoint_file,
        )

        sd = load_checkpoint_file(path)
        if "i3d" in cfg.model.conv_model.lower():
            variables = i3d_state_dict_to_variables(sd)
        else:
            hw = _clip_hw(cfg)
            variables = convlstm_state_dict_to_variables(
                sd,
                image_size=hw,
                conv_stride=cfg.model.conv_stride,
                pool_kernel=tuple(cfg.model.pool_kernel),
                lstm_layers=cfg.model.clstm_layers,
                nb_lstm_units=cfg.model.clstm_hidden,
            )
        return state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats") or state.batch_stats,
        )
    from ivf_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(path)
    name = "model_best" if ckpt.exists("model_best") else "checkpoint"
    variables = ckpt.load_variables(name)
    return state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
    )


def init_eval_state(cfg: Config, softmax_override: Optional[bool] = None):
    """Build a model + TrainState for inference/mask-search consumers,
    loading ``pretrained_model_path`` when set (torch .pth.tar or orbax)."""
    from ivf_tpu.train import build_optimizer, create_train_state

    model = build_model(cfg, softmax_override=softmax_override)
    sample = jnp.zeros((1, cfg.data.clip_size, *_clip_hw(cfg), 3), jnp.float32)
    state = create_train_state(
        model,
        jax.random.PRNGKey(cfg.seed),
        sample,
        build_optimizer("adam", 1e-3),
    )
    if cfg.model.pretrained_model_path not in ("", "no_ckpt", None):
        state = _load_pretrained(cfg, model, state)
    return model, state


def infer(cfg: Config, state=None, mesh=None, dataset=None, save_npy=True):
    """Validation inference + npy prediction dumps (inference_kth.py)."""
    from ivf_tpu.train import evaluate, make_eval_step

    if state is None:
        _, state = init_eval_state(cfg)
    if mesh is not None:
        # params must be mesh-replicated to meet the sharded batches —
        # exactly as train() does (single-device-committed params + sharded
        # inputs is a jit device-mismatch error)
        from ivf_tpu.parallel import replicate

        state = replicate(state, mesh)
    dataset = dataset or build_dataset(cfg, "validation")
    loss_type = "nll_on_probs" if cfg.model.soft_max else "cross_entropy"
    res = evaluate(
        state,
        build_loader(cfg, dataset, False, mesh),
        make_eval_step(loss_type),
        max_steps=5 if cfg.test_run else None,
        collect_predictions=True,
    )
    if save_npy:
        save_dir = _save_dir(cfg)
        # KTH inference reports top-3 (inference_kth.py:10 TOP_X=3) but keeps
        # the top5 file name (inference_kth.py:178); smth uses real top-5.
        # Gate on class count so BOTH KTH families hit it (the TF family's
        # conv_model is plain 'clstm' — configs/config_clstm_kth_records.py)
        k = 3 if cfg.model.num_classes <= 6 else 5
        np.save(os.path.join(save_dir, "y_true.npy"), res["y_true"])
        np.save(os.path.join(save_dir, "y_hat.npy"), res["y_hat"])
        np.save(
            os.path.join(save_dir, "y_hat_top5.npy"), res["y_hat_top5"][:, :k]
        )
    return res


def find_masks(
    cfg: Config,
    variables,
    dataset=None,
    do_gradcam: bool = True,
    run_temp_mask: bool = True,
    save_viz: bool = True,
    max_batches: Optional[int] = None,
    mesh=None,
    split: str = "validation",
):
    """Temporal-mask search + Grad-CAM over the validation set — vmapped.
    ``split='train'`` mirrors the reference's ``--train`` flag (utils.py:43:
    "use train data instead of validation").

    Returns (time_mask_results, grad_cam_results) lists of per-clip dicts
    with the reference's key names (FindMasksComparison_I3D_smth.py:243-251,
    271-277) and writes the same pickle artifacts.
    """
    from ivf_tpu.interpret.gradcam import i3d_grad_cam_fns
    from ivf_tpu.interpret.mask_opt import find_mask, init_mask_central

    model = build_model(cfg, softmax_override=True)
    mk = cfg.mask
    dataset = dataset or build_dataset(cfg, split, get_item_id=True)
    loader = build_loader(cfg, dataset, False, mesh)

    if cfg.model.compute_dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            variables,
        )

    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)

    from ivf_tpu.utils.compile import hot_jit

    is_i3d = isinstance(model, I3D)
    norm_frame = mk.normalization_mode == "frame"
    if is_i3d:
        from ivf_tpu.interpret.gradcam import grad_cam_batched

        ffn, hfn = i3d_grad_cam_fns(model, variables, mk.top_layer)
        cam_batch = hot_jit(
            lambda clips, tgts: grad_cam_batched(
                ffn, hfn, clips, tgts, normalize_per_frame=norm_frame
            )[0]
        )
    else:
        from ivf_tpu.interpret.gradcam import convlstm_grad_cam

        # torch-family CLSTM Grad-CAM uses GLOBAL channel weights (mean grad
        # over T,H,W — grad_cam_videos.py:98); the TF family's per-frame
        # weights (mask/gradcam.py:102) apply only to block_order='tf'
        wmode = "per_frame" if cfg.model.block_order == "tf" else "global"
        cam_batch = hot_jit(
            jax.vmap(
                lambda clip, tgt: convlstm_grad_cam(
                    model,
                    variables,
                    clip,
                    tgt,
                    normalize_per_frame=norm_frame,
                    weight_mode=wmode,
                )[0]
            )
        )

    batched_scores = hot_jit(
        lambda clips: model.apply(variables, clips, train=False)
    )
    init_batch = hot_jit(
        jax.vmap(
            partial(
                init_mask_central,
                score_fn,
                mask_type=mk.mask_perturb_type,
            )
        )
    )
    search_batch = hot_jit(
        jax.vmap(
            partial(
                find_mask,
                score_fn,
                n_steps=mk.opt_iter,
                lam1=mk.lam1,
                lam2=mk.lam2,
                lr=mk.opt_lr,
                perturbation_type=mk.mask_perturb_type,
                early_stop=mk.early_stop,
                eta=mk.eta,
            )
        )
    )

    subset_ids = None
    if mk.subset_file:
        import csv

        with open(mk.subset_file) as f:
            subset_ids = {row[0] for row in csv.reader(f) if row}

    time_mask_results, grad_cam_results = [], []
    save_dir = _save_dir(cfg)
    results_path = os.path.join(save_dir, "results")
    os.makedirs(results_path, exist_ok=True)

    for bidx, batch in enumerate(loader):
        if max_batches is not None and bidx >= max_batches:
            break
        clips, labels, ids = batch if len(batch) == 3 else (*batch, None)
        clips = jnp.asarray(clips)
        if clips.dtype == jnp.uint8:
            clips = _cast_f32(clips)
        labels_np = np.asarray(labels)
        # fallback ids carry the batch index so different batches can never
        # collide in result keys / viz output dirs
        ids = (
            ids
            if ids is not None
            else [f"b{bidx}_{i}" for i in range(len(labels_np))]
        )

        # class-of-interest / subset filtering (host side)
        keep = np.ones(len(labels_np), bool)
        if mk.class_oi is not None:
            keep &= labels_np == mk.class_oi
        if subset_ids is not None:
            keep &= np.asarray([str(i) in subset_ids for i in ids])
        if mk.kth_clips_filter:
            from ivf_tpu.data.kth_clips_of_interest import tag_matches

            keep &= np.asarray(
                [tag_matches(str(i), cfg.split_type) for i in ids]
            )
        if not keep.any():
            continue
        kept = np.nonzero(keep)[0]
        clips_k = clips[kept]
        labels_k = jnp.asarray(labels_np[kept])
        ids_k = [ids[i] for i in kept]

        # pad every filtered batch back to the loader batch size so the
        # jitted score/init/search/cam programs compile ONCE — otherwise
        # each distinct post-filter kept-count retraces the full 300-step
        # search (minutes of XLA compile per batch); padded rows repeat
        # row 0 and are sliced off host-side
        pad_to = cfg.data.batch_size

        def _pad(a):
            n = a.shape[0]
            if n >= pad_to:
                return a
            fill = jnp.broadcast_to(a[:1], (pad_to - n, *a.shape[1:]))
            return jnp.concatenate([a, fill], axis=0)

        outputs = batched_scores(_pad(clips_k))[: len(kept)]
        outputs_np = np.asarray(outputs)
        if mk.min_score > 0.0:
            # TF drivers skip clips whose true-class probability is below
            # the threshold (find_mask_smth.py:364-366) — no 300-step search
            # is spent on them
            score_keep = (
                outputs_np[np.arange(len(kept)), np.asarray(labels_k)]
                >= mk.min_score
            )
            if not score_keep.any():
                continue
            sk = np.nonzero(score_keep)[0]
            kept = kept[sk]
            clips_k = clips_k[sk]
            labels_k = jnp.asarray(np.asarray(labels_k)[sk])
            ids_k = [ids_k[i] for i in sk]
            outputs_np = outputs_np[sk]
        pred = np.argmax(outputs_np, axis=-1)
        if mk.grad_cam_type == "guessed":
            targets = jnp.asarray(pred)
        else:
            targets = labels_k

        if run_temp_mask:
            if mk.mask_init_type == "central":
                inits = init_batch(_pad(clips_k), _pad(targets))[: len(kept)]
            else:
                keys = jax.random.split(
                    jax.random.PRNGKey(cfg.seed + bidx), len(kept)
                )
                from ivf_tpu.interpret.mask_opt import init_mask_random

                inits = jnp.stack(
                    [init_mask_random(k, cfg.data.clip_size) for k in keys]
                )
            res = search_batch(_pad(clips_k), _pad(targets), _pad(inits))
            res = jax.tree.map(lambda a: a[: len(kept)], res)
            masks_np = np.asarray(res.mask)
            for j in range(len(kept)):
                time_mask_results.append(
                    {
                        "true_class": int(labels_np[kept[j]]),
                        "pred_class": int(pred[j]),
                        "video_id": ids_k[j],
                        "time_mask": masks_np[j],
                        "original_score_guess": float(outputs_np[j].max()),
                        "original_score_true": float(
                            outputs_np[j][labels_np[kept[j]]]
                        ),
                        "freeze_score": float(np.asarray(res.freeze_score)[j]),
                        "reverse_score": float(np.asarray(res.reverse_score)[j]),
                    }
                )

        if do_gradcam:
            cams = np.asarray(
                cam_batch(_pad(clips_k), _pad(targets))[: len(kept)]
            )
            for j in range(len(kept)):
                grad_cam_results.append(
                    {
                        "true_class": int(labels_np[kept[j]]),
                        "pred_class": int(pred[j]),
                        "video_id": ids_k[j],
                        "GCHeatMap": cams[j],
                    }
                )

        if save_viz and do_gradcam and run_temp_mask:
            from ivf_tpu.interpret.perturb import perturb_sequence
            from ivf_tpu.viz import create_image_arrays

            for j in range(len(kept)):
                tag = str(ids_k[j])
                out_folder = os.path.join(
                    save_dir,
                    "cam_saved_images",
                    str(int(labels_np[kept[j]])),
                    f"{tag}g_{int(pred[j])}",
                    "combined",
                )
                clip_np = np.asarray(clips_k[j])
                # per-clip score text files
                # (FindMasksComparison_I3D_smth.py:234-241)
                os.makedirs(out_folder, exist_ok=True)
                for nm, val in (
                    ("Freeze", float(np.asarray(res.freeze_score)[j])),
                    ("Reverse", float(np.asarray(res.reverse_score)[j])),
                ):
                    with open(
                        os.path.join(
                            out_folder, f"ClassScore{nm}case{tag}.txt"
                        ),
                        "w",
                    ) as f:
                        f.write(str(val))
                for ptype in ("freeze", "reverse"):
                    pert = np.asarray(
                        perturb_sequence(
                            clips_k[j],
                            jnp.asarray(masks_np[j]),
                            ptype,
                            snap_values=True,
                        )
                    )
                    create_image_arrays(
                        clip_np,
                        cams[j],
                        masks_np[j],
                        pert,
                        out_folder,
                        case_tag=ptype + tag,
                    )

        if save_viz and run_temp_mask and "kth" in cfg.model.conv_model.lower():
            # KTH driver additionally renders the perturbed sequence itself
            # (FindMasksComparison_I3D_KTH.py:362-366)
            from ivf_tpu.interpret.perturb import perturb_sequence
            from ivf_tpu.viz import visualize_results

            for j in range(len(kept)):
                tag = str(ids_k[j])
                out_folder = os.path.join(
                    save_dir,
                    "cam_saved_images",
                    str(int(labels_np[kept[j]])),
                    f"{tag}g_{int(pred[j])}",
                    "combined",
                )
                pert = np.asarray(
                    perturb_sequence(
                        clips_k[j],
                        jnp.asarray(masks_np[j]),
                        mk.mask_perturb_type,
                    )
                )
                visualize_results(
                    np.asarray(clips_k[j]),
                    pert,
                    masks_np[j],
                    root_dir=out_folder,
                    case=tag,
                    mark_imgs=True,
                )

    with open(
        os.path.join(
            results_path,
            f"allTimeMaskResults_{cfg.model_name}_{mk.class_oi}_.p",
        ),
        "wb",
    ) as f:
        pickle.dump(time_mask_results, f)
    with open(
        os.path.join(
            results_path,
            f"allGradCamResults_{cfg.model_name}_{mk.class_oi}_.p",
        ),
        "wb",
    ) as f:
        pickle.dump(grad_cam_results, f)
    return time_mask_results, grad_cam_results


def grad_cam_run(cfg: Config, variables, clips, targets=None):
    """Standalone Grad-CAM over an array of clips (grad_cam_videos.py)."""
    from ivf_tpu.interpret.gradcam import (
        convlstm_grad_cam,
        grad_cam,
        i3d_grad_cam_fns,
    )

    model = build_model(cfg, softmax_override=True)
    clips = jnp.asarray(clips)
    if clips.dtype == jnp.uint8:
        clips = _cast_f32(clips)
    n = clips.shape[0]
    if targets is None:
        targets = [None] * n
    cams = []
    if isinstance(model, I3D):
        ffn, hfn = i3d_grad_cam_fns(model, variables, cfg.mask.top_layer)
        for j in range(n):
            cam, _ = grad_cam(
                ffn,
                hfn,
                clips[j],
                targets[j],
                normalize_per_frame=(cfg.mask.normalization_mode == "frame"),
            )
            cams.append(np.asarray(cam))
    else:
        for j in range(n):
            cam, _ = convlstm_grad_cam(
                model,
                variables,
                clips[j],
                targets[j],
                normalize_per_frame=(cfg.mask.normalization_mode == "frame"),
                weight_mode="per_frame" if cfg.model.block_order == "tf" else "global",
            )
            cams.append(np.asarray(cam))
    return np.stack(cams)
