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

import json
import os
import pickle
import time
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

_TRACE_LAUNCH = os.environ.get("IVF_TRACE_LAUNCH") == "1"


def _traced(label: str, dispatch):
    """Diagnostic for execution-time-capped backends (IVF_TRACE_LAUNCH=1):
    dispatch one program, block, and print its wall time. Off by default —
    tracing inserts a sync after the dispatch."""
    t0 = time.time()
    out = dispatch()
    if _TRACE_LAUNCH:
        jax.block_until_ready(out)
        print(f"[ivf-launch] {label} {time.time() - t0:.1f}s", flush=True)
    return out


class _AsyncWriter:
    """Single-worker background writer for per-clip viz/artifact I/O.

    ``find_masks`` renders PNG triptychs / GIFs / score txt files per kept
    clip; inline, that host I/O serializes against the *next* batch's device
    search. Offloading it overlaps host rendering with device compute. Only
    pure-host work on already-fetched numpy arrays runs in the worker —
    device programs and result-list appends stay on the calling thread.
    Bounded to ``max_pending`` outstanding batch jobs (host-RAM bound);
    worker exceptions re-raise on a later submit() or at close().
    """

    def __init__(self, enabled: bool, max_pending: int = 2):
        self._ex = None
        self._pending: list = []
        self._max_pending = max_pending
        if enabled:
            from concurrent.futures import ThreadPoolExecutor

            self._ex = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ivf-viz"
            )

    def submit(self, fn) -> None:
        if self._ex is None:
            fn()
            return
        while len(self._pending) >= self._max_pending:
            self._pending.pop(0).result()  # re-raises worker failures
        self._pending.append(self._ex.submit(fn))

    def close(self, raise_errors: bool = True) -> None:
        """Drain the queue and stop the worker. ``raise_errors=False`` (the
        error-exit path) still waits but swallows worker exceptions so they
        don't mask the original one."""
        err = None
        for f in self._pending:
            try:
                f.result()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                err = err or e
        self._pending.clear()
        if self._ex is not None:
            self._ex.shutdown(wait=True)
            self._ex = None
        if err is not None and raise_errors:
            raise err


class _EmissionJournal:
    """Append-only pickle stream of per-clip emission records — the
    preemption-safety layer under ``find_masks(..., resume=True)``.

    The reference drivers hold every result in RAM and pickle once at the
    end (FindMasksComparison_I3D_smth.py:253-266), so an interruption of the
    hour-scale full-val search loses everything. Here each retired clip
    appends one record ``{"video_id", "mask": dict|None, "cam": dict|None}``
    (or ``{"video_id", "skip": True}`` for min_score rejects) to
    ``results/emission_journal.p``. Records are written AFTER the clip's viz
    artifacts land on disk (inside the async-viz worker when viz runs), so
    journaled ⇒ fully durable. ``load`` tolerates a torn trailing record
    from a hard kill: the intact prefix restores, the rest re-runs. Appends
    are fsync'd per flush (one ``append_many`` per emission call — host
    noise next to the multi-second search launches).
    """

    def __init__(self, path: str, fresh: bool):
        import threading

        self._path = path
        self._lock = threading.Lock()
        if fresh and os.path.exists(path):
            os.remove(path)  # never mix two runs' records

    def append_many(self, records) -> None:
        with self._lock, open(self._path, "ab") as f:
            for rec in records:
                pickle.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())

    @staticmethod
    def load(path: str) -> dict:
        """id -> record, last write wins; robust to a truncated tail."""
        out: dict = {}
        if not os.path.exists(path):
            return out
        with open(path, "rb") as f:
            while True:
                try:
                    rec = pickle.load(f)
                except EOFError:
                    break
                except Exception:
                    break  # torn trailing record from a mid-append crash
                out[str(rec["video_id"])] = rec
        return out


def default_effective_steps(clip_size: int) -> tuple:
    """Reference defaults: CLSTM_4.py:11 hardcodes [4,8,12,15] for step=16
    while the KTH driver passes [7,15,23,31] for 32 (train_clstm_kth.py:51-55)
    — two different conventions in the reference itself; each is matched at
    its clip length, quarters-minus-one otherwise."""
    if clip_size == 16:
        return (4, 8, 12, 15)
    q = clip_size // 4
    return tuple(q * k - 1 for k in range(1, 5))


def _bf16_argmax_upgrade(cfg: Config) -> Config:
    """argmax-index pool VJP on the bf16 compute path: bit-equal forward,
    gradient-equal off exact window ties (a valid max subgradient either
    way), measured +9% mask-steps/s and +4-6% train clips/s (PERF.md round
    3). Engaged only when the user left ``pool_impl`` at its default;
    copy-on-write so the caller's cfg is untouched. f32 runs never change."""
    if (
        cfg.model.compute_dtype == "bfloat16"
        and cfg.model.pool_impl == "reduce_window"
    ):
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, model=_dc.replace(cfg.model, pool_impl="argmax")
        )
    return cfg


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
        # recurrence strategy (PERF.md round 3): unrolled is measured
        # fastest at every reference clip length and the scan grad fails
        # to compile at production mask-search batches; scan+remat is the
        # long-T compile-size escape hatch
        if m.clstm_scan == "auto":
            use_scan = cfg.data.clip_size > 64
        else:
            use_scan = m.clstm_scan == "scan"
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
            use_scan=use_scan,
            remat=use_scan,  # plain scan's grad does not compile (PERF.md)
            use_pallas=m.use_pallas,
        )
    return get_model(m.conv_model, num_classes=m.num_classes)


def build_dataset(cfg: Config, split: str = "train", get_item_id: bool = False):
    from ivf_tpu.data import FrameDirDataset, KTHFrameDataset
    from ivf_tpu.data.loaders import RecordDataset

    d = cfg.data
    # 'tfrecords' loads the reference's own artifacts
    # (generate_tfrecords.py:26-55) through the same RecordDataset — the
    # reader dispatches on file extension (data/tfrecords.py)
    if d.input_mode in ("records", "tfrecords"):
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
        return KTHFrameDataset(root, clip_size=d.clip_size, get_item_id=get_item_id)
    return FrameDirDataset(
        root,
        clip_size=d.clip_size,
        step_size=d.step_size_train if split == "train" else d.step_size_val,
        get_item_id=get_item_id,
    )


def build_loader(
    cfg: Config,
    dataset,
    shuffle: bool,
    mesh=None,
    drop_last: bool = True,
    to_device: bool = True,
):
    from ivf_tpu.data import ClipLoader

    return ClipLoader(
        dataset,
        batch_size=cfg.data.batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=cfg.data.num_workers,
        mesh=mesh,
        to_device=to_device,
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
    # bf16 training gets the same argmax-pool upgrade as find_masks: the
    # fwd is bit-equal, the pool VJP reads one uint8 index plane instead of
    # the value stencil — +4-6% train clips/s measured (PERF.md round 3)
    cfg = _bf16_argmax_upgrade(cfg)
    model = build_model(cfg)
    loss_type = "nll_on_probs" if cfg.model.soft_max else "cross_entropy"

    train_dataset = train_dataset or build_dataset(cfg, "train")
    val_dataset = val_dataset or build_dataset(cfg, "validation")
    if jax.process_count() > 1:
        # multi-host SPMD: each process loads a disjoint dataset shard;
        # the loaders assemble global arrays (parallel/multihost.py)
        if mesh is None:
            raise ValueError(
                "multi-host training requires a global device mesh (pass "
                "mesh=get_mesh() / CLI --data-parallel): without one, each "
                "process would silently train a divergent model on its own "
                "shard with no gradient sync, all writing the same save_dir"
            )
        from ivf_tpu.parallel.multihost import ShardedDataset

        train_dataset = ShardedDataset(train_dataset)
        val_dataset = ShardedDataset(val_dataset)

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

    ckpt = Checkpointer(save_dir, async_save=cfg.async_checkpoint)
    start_epoch, best_loss, batch_offset = 0, float("inf"), 0
    if resume and ckpt.exists():
        state, start_epoch, best_loss, batch_offset = ckpt.restore(state)
        at = f" batch {batch_offset}" if batch_offset else ""
        print(
            f" > resumed from epoch {start_epoch}{at} "
            f"(best loss {best_loss:.4f})"
        )
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
    if start_epoch > 0:
        # resume truly resumes: continue from the RESTORED (possibly decayed)
        # learning rate and best metric instead of a fresh scheduler snapping
        # the LR back to cfg.optim.lr after the first post-resume epoch.
        # (The reference rebuilds optimizer+scheduler fresh on resume and
        # loses the decay — train_i3d_smth.py:132-141 — a defect per the
        # SURVEY §2.4 policy, like its unrestored optimizer moments.)
        from ivf_tpu.train.optim import get_learning_rate

        scheduler.lr = get_learning_rate(state.opt_state)
        if hasattr(scheduler, "best") and cfg.optim.lr_schedule != "patience_halving":
            scheduler.best = best_loss
    # learning-curve PNGs are primary-only like history.json/npy dumps:
    # every process runs the same fit() loop, and concurrent writes of the
    # same plot files from N hosts race (fit treats plotter=None as no-op)
    plotter = (
        PlotLearning(os.path.join(save_dir, "plots"), cfg.model.num_classes)
        if jax.process_index() == 0
        else None
    )
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
        checkpoint_every_steps=cfg.optim.checkpoint_steps,
        start_batch_offset=batch_offset,
        compute_dtype=cfg.model.compute_dtype,
    )
    if history and jax.process_index() == 0:
        import json

        with open(os.path.join(save_dir, "history.json"), "w") as f:
            json.dump(history, f, indent=1, default=float)  # jax/np scalars
    return state, history


def _clip_hw(cfg: Config):
    s = cfg.data.input_spatial_size
    if isinstance(s, (tuple, list)):
        return tuple(s)
    return (s, s)


def _is_kth_run(cfg: Config) -> bool:
    """KTH-family run detection, shared by infer()'s top-3 gating and
    find_masks()'s KTH viz/whitelist path: 'kth' in the model or run name,
    or the KTH-only per-subject record sharding."""
    return (
        "kth" in cfg.model.conv_model.lower()
        or "kth" in cfg.model_name.lower()
        or bool(cfg.data.train_subjects or cfg.data.val_subjects)
    )


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
    if jax.process_count() > 1:
        if mesh is None:
            raise ValueError(
                "multi-host inference requires a global device mesh (pass "
                "mesh=get_mesh() / CLI --data-parallel): without one each "
                "process would report per-shard metrics as the run's and "
                "race on the prediction npy files"
            )
        from ivf_tpu.parallel.multihost import ShardedDataset

        dataset = ShardedDataset(dataset)
    loss_type = "nll_on_probs" if cfg.model.soft_max else "cross_entropy"
    # KTH inference reports top-3 (inference_kth.py:10 TOP_X=3) but keeps
    # the top5 file name (inference_kth.py:178); smth uses real top-5.
    # Gate on the model FAMILY, not class count (a 5-class smth debug
    # subset must still report top-5). Explicit cfg.model.top_k overrides —
    # and widens the collected matrix so k > 5 isn't silently truncated.
    k = cfg.model.top_k if cfg.model.top_k else (3 if _is_kth_run(cfg) else 5)
    res = evaluate(
        state,
        build_loader(cfg, dataset, False, mesh),
        # compute_dtype=bfloat16: the step casts params + clips to bf16 on
        # device (f32 state untouched) — same knob find_masks honors
        make_eval_step(loss_type, compute_dtype=cfg.model.compute_dtype),
        max_steps=5 if cfg.test_run else None,
        collect_predictions=True,
        top_k=max(5, k),
    )
    if save_npy and jax.process_index() == 0:
        # predictions are allgathered (train/loop.py::_host_value) so
        # process 0's dump is the full set; other processes must not race
        # on the same files
        save_dir = _save_dir(cfg)
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
    stats: Optional[dict] = None,
    resume: bool = False,
):
    """Temporal-mask search + Grad-CAM over the validation set — vmapped.
    ``split='train'`` mirrors the reference's ``--train`` flag (utils.py:43:
    "use train data instead of validation").

    Returns (time_mask_results, grad_cam_results) lists of per-clip dicts
    with the reference's key names (FindMasksComparison_I3D_smth.py:243-251,
    271-277) and writes the same pickle artifacts.

    Filtered clips (class-of-interest / subset / min_score — the reference
    drivers filter hard, FindMasksComparison_I3D_smth.py:168-174) are
    compacted ACROSS loader batches into full vmap batches before the
    expensive search launches, so batch occupancy stays ~100% regardless of
    filter selectivity. Pass a dict as ``stats`` to receive launch/occupancy
    counters.

    Under ``early_stop`` on the chunked path, convergence REFILL
    (MaskConfig.refill, auto-on) additionally retires frozen rows at every
    segment boundary and re-stages survivors into full continuation
    batches, so search work tracks per-row stop steps instead of the
    slowest row per batch — per-clip results identical, emission order
    differs (retirement order).

    Every retired clip is journaled to ``results/emission_journal.p`` as it
    emits (see ``_EmissionJournal``); ``resume=True`` restores journaled
    records and runs only the clips an interrupted run had not finished —
    per-clip results bit-exact vs an uninterrupted run (search math is
    batch-composition independent), pickle order differs. Resume assumes the
    same config/weights/dataset; journaled records missing a field the
    current run needs (e.g. a journal written without Grad-CAM resumed with
    it) are re-run in full.
    """
    from ivf_tpu.interpret.gradcam import i3d_grad_cam_fns
    from ivf_tpu.interpret.mask_opt import init_mask_central
    from ivf_tpu.interpret.perturb import perturb_sequence

    cfg = _bf16_argmax_upgrade(cfg)
    model = build_model(cfg, softmax_override=True)
    mk = cfg.mask
    dataset = dataset or build_dataset(cfg, split, get_item_id=True)
    # host-side loader: clips stage on host until a full compacted batch is
    # ready (drop_last=False — the reference iterates the whole val set)
    loader = build_loader(
        cfg, dataset, False, mesh=None, drop_last=False, to_device=False
    )

    if cfg.model.compute_dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            variables,
        )
    if mesh is not None:
        # Replicate params over the mesh up front (same as infer()).
        # Checkpoint-restored variables arrive committed to device 0; as
        # closure constants jit WOULD reshard them implicitly, but that
        # re-transfers the whole tree per compiled program — one explicit
        # replication avoids it.
        from ivf_tpu.parallel import replicate

        variables = replicate(variables, mesh)

    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)

    from ivf_tpu.utils.compile import hot_jit as _hot_jit

    # the scoped-VMEM compiler option helps the reduce_window program but
    # costs 1.2% whenever the argmax pool VJP is in the program
    # (utils/compile.py) — gate it on the pool impl this run actually
    # compiled; every argmax-family impl puts that VJP on the branch pools
    _vmem = cfg.model.pool_impl not in ("argmax", "argmax_shift", "argmax_full")
    hot_jit = partial(_hot_jit, vmem_opt=_vmem)

    is_i3d = isinstance(model, I3D)
    norm_frame = mk.normalization_mode == "frame"
    if is_i3d:
        from ivf_tpu.interpret.gradcam import grad_cam_batched

        ffn, hfn = i3d_grad_cam_fns(model, variables, mk.top_layer)
        cam_core = lambda clips, tgts: grad_cam_batched(
            ffn, hfn, clips, tgts, normalize_per_frame=norm_frame
        )[0]
    else:
        from ivf_tpu.interpret.gradcam import convlstm_grad_cam

        # torch-family CLSTM Grad-CAM uses GLOBAL channel weights (mean grad
        # over T,H,W — grad_cam_videos.py:98); the TF family's per-frame
        # weights (mask/gradcam.py:102) apply only to block_order='tf'
        wmode = "per_frame" if cfg.model.block_order == "tf" else "global"
        cam_core = jax.vmap(
            lambda clip, tgt: convlstm_grad_cam(
                model,
                variables,
                clip,
                tgt,
                normalize_per_frame=norm_frame,
                weight_mode=wmode,
            )[0]
        )
    # standalone Grad-CAM program — used only when no mask search runs in
    # the same flush (run_temp_mask=False); otherwise the CAM is fused into
    # the search/epilogue program below
    cam_batch = hot_jit(cam_core)

    batched_scores = hot_jit(
        lambda clips: model.apply(variables, clips, train=False)
    )

    from ivf_tpu.interpret.mask_opt import make_search_carry

    guessed = mk.grad_cam_type == "guessed"

    def _prologue(clips, labels, outputs, rng_keys):
        """Everything upstream of the first search segment as ONE program:
        the class-score forward (skipped when a min_score probe already
        produced outputs), target selection, mask init (central-candidate
        probes or random), and the Adam carry. Fused because backends with
        per-program launch overhead on GB-scale operands (the axon tunnel:
        ~30 s per distinct program carrying the clip batch, PERF.md round-3
        launch anatomy) otherwise pay it three times per flush."""
        if outputs is None:
            outputs = model.apply(variables, clips, train=False)
        targets = jnp.argmax(outputs, axis=-1) if guessed else labels
        inits = carry = None
        if run_temp_mask:
            if rng_keys is None:  # central init (mask.py:103-154)
                inits = jax.vmap(
                    partial(
                        init_mask_central,
                        score_fn,
                        mask_type=mk.mask_perturb_type,
                    )
                )(clips, targets)
            else:  # random init (mask.py:156-165), one key per row
                from ivf_tpu.interpret.mask_opt import init_mask_random

                t = clips.shape[1]
                inits = jax.vmap(lambda k: init_mask_random(k, t))(rng_keys)
            carry = jax.vmap(partial(make_search_carry, lr=mk.opt_lr))(inits)
        return outputs, targets, inits, carry

    prologue_batch = hot_jit(_prologue)

    if mk.early_stop and mk.eta > 1e-4 and mk.eta_patience <= 1:
        import warnings

        warnings.warn(
            f"early_stop with eta={mk.eta:g}: the one-shot convergence "
            "criterion fires spuriously on the flat first step at loose "
            "etas (measured: eta>=1e-3 freezes EVERY clip at step 1 with "
            "masks ~unchanged from init — PERF.md round 4). Use the "
            "reference's eta=1e-5 or tighter, or set eta_patience>1 "
            "(freeze only after M consecutive sub-eta steps).",
            stacklevel=2,
        )
    search_kwargs = dict(
        lam1=mk.lam1,
        lam2=mk.lam2,
        lr=mk.opt_lr,
        perturbation_type=mk.mask_perturb_type,
        early_stop=mk.early_stop,
        eta=mk.eta,
        closed_form=mk.closed_form,
        eta_patience=mk.eta_patience,
    )
    # segment length: the axon tunnel kills single executions >~1 min (a
    # batch-128 300-step search runs ~85 s), so the search there runs as
    # chained segments threading the exact loop carry — bit-identical math
    # (MaskConfig.chunk_steps; see interpret/mask_opt.py::search_segment).
    # NB the tunnel's backend name is plain "tpu" — on_axon_tunnel() checks
    # the platform list, not jax.default_backend()
    from ivf_tpu.utils.compile import on_axon_tunnel

    chunk = mk.chunk_steps or (100 if on_axon_tunnel() else mk.opt_iter)
    if chunk >= mk.opt_iter:
        from ivf_tpu.interpret.mask_opt import find_mask_from_carry

        def _search_full(clips, targets, carry):
            # monolithic: the whole search (scan + finalize) plus the
            # Grad-CAM in ONE program — consumes the PROLOGUE's carry, the
            # same construction the chunked path threads through segments,
            # so a make_search_carry change can never silently diverge
            # between the two paths
            res = jax.vmap(
                partial(
                    find_mask_from_carry,
                    score_fn,
                    n_steps=mk.opt_iter,
                    **search_kwargs,
                )
            )(clips, targets, carry)
            cams = cam_core(clips, targets) if do_gradcam else None
            return res, cams

        search_and_cam = hot_jit(_search_full)
        pro_seg_batch = None  # prologue fusion is a chunked-path concept

        def run_search(clips, targets, inits, carry, segs_done=0):
            return _traced(
                "search+cam", partial(search_and_cam, clips, targets, carry)
            )

    else:
        from ivf_tpu.interpret.mask_opt import finalize_search, search_segment

        n_full, rem = divmod(mk.opt_iter, chunk)
        seg_batch = hot_jit(
            jax.vmap(
                partial(search_segment, score_fn, n_steps=chunk, **search_kwargs)
            )
        )
        rem_batch = (
            hot_jit(
                jax.vmap(
                    partial(
                        search_segment, score_fn, n_steps=rem, **search_kwargs
                    )
                )
            )
            if rem
            else None
        )

        def _epilogue(clips, targets, carry):
            # finalize (reverse/orig score forwards) + Grad-CAM fused: one
            # short program instead of two per flush
            res = jax.vmap(partial(finalize_search, score_fn))(
                clips, targets, carry
            )
            cams = cam_core(clips, targets) if do_gradcam else None
            return res, cams

        epilogue = hot_jit(_epilogue)

        # Prologue fusion (MaskConfig.fuse_prologue): the prologue's ~11
        # batched forwards are ~1.4 s of compute, but as a SEPARATE program
        # carrying the GB-scale clip batch it pays the tunnel's per-launch
        # overhead (8.9 s steady-state, PERF.md round 4). Folding it into
        # segment 1 makes one program of ~28 s device time — still under
        # the tunnel's ~1 min execution kill — and drops one GB-operand
        # launch per flush. Identical math: the very ops the two programs
        # ran back-to-back, now traced into one.
        pro_seg_batch = None
        if mk.fuse_prologue and run_temp_mask:

            def _pro_seg1(clips, labels, outputs, rng_keys):
                outputs, targets, inits, carry = _prologue(
                    clips, labels, outputs, rng_keys
                )
                carry = jax.vmap(
                    partial(
                        search_segment, score_fn, n_steps=chunk, **search_kwargs
                    )
                )(clips, targets, carry)
                return outputs, targets, inits, carry

            pro_seg_batch = hot_jit(_pro_seg1)

        def run_search(clips, targets, inits, carry, segs_done=0):
            if segs_done == 0:
                # fence the (async-dispatched) prologue program: chaining
                # it into segment 1 would recreate a >1 min continuous
                # device run (fused-path carries arrive already synced)
                jax.block_until_ready(carry)
            # a fused segment 1 may already have converged every row
            skip_rest = (
                segs_done > 0
                and mk.early_stop
                and not np.asarray(carry[3]).any()
            )
            if not skip_rest:
                for k in range(segs_done, n_full):
                    t0 = time.time()
                    carry = _traced(
                        f"seg{k + 1}", partial(seg_batch, clips, targets, carry)
                    )
                    # synchronize between segments: async dispatch would
                    # chain them into one continuous device run, defeating
                    # the whole point of chunking on execution-time-capped
                    # backends (the dispatch gap is ~30 ms vs a ~30 s seg)
                    jax.block_until_ready(carry)
                    # the sync above makes this a real launch wall time for
                    # free — per-segment seconds let callers separate
                    # steady-state throughput from first-encounter/compile
                    # noise (PERF.md round-3 launch anatomy)
                    run_stats["segment_seconds"].append(
                        round(time.time() - t0, 2)
                    )
                    run_stats["segments_launched"] += 1
                    # Once every clip in the batch has converged, further
                    # segments are mathematical no-ops (the step fn freezes
                    # inactive rows' logits AND Adam state) — skip them.
                    # The flags are a B-bool fetch, paid only under
                    # early_stop.
                    if mk.early_stop and not np.asarray(carry[3]).any():
                        break
                else:
                    if rem_batch is not None:
                        carry = _traced(
                            "segrem", partial(rem_batch, clips, targets, carry)
                        )
                        jax.block_until_ready(carry)
                        run_stats["segments_launched"] += 1
            return _traced(
                "finalize+cam", partial(epilogue, clips, targets, carry)
            )

    # Convergence refill (MaskConfig.refill): only meaningful where rows can
    # actually freeze mid-schedule — the chunked path under early_stop. Auto
    # (None) = on exactly there; the trained-weights trace showed the batch-
    # quantized skip alone saves nothing on long-tailed stop distributions
    # (PERF.md round 4, EARLYSTOP_r04.json trained_flash).
    refill_on = (
        run_temp_mask
        and mk.early_stop
        and chunk < mk.opt_iter
        and (mk.refill if mk.refill is not None else True)
    )
    requeues: dict = {}  # segments-done -> survivor rows awaiting a flush

    subset_ids = None
    if mk.subset_file:
        import csv

        with open(mk.subset_file) as f:
            subset_ids = {row[0] for row in csv.reader(f) if row}

    time_mask_results, grad_cam_results = [], []
    save_dir = _save_dir(cfg)
    results_path = os.path.join(save_dir, "results")
    os.makedirs(results_path, exist_ok=True)

    # ---- emission journal (preemption-safe resume) -----------------------
    journal_path = os.path.join(results_path, "emission_journal.p")
    done_ids: set = set()
    resumed_clips = resumed_skipped = 0
    if resume:
        for vid, rec in _EmissionJournal.load(journal_path).items():
            if rec.get("skip"):
                done_ids.add(vid)
                resumed_skipped += 1
                continue
            # a record satisfies this run only if it carries every field the
            # run needs; stale partials (config widened since) re-run in full
            if run_temp_mask and rec.get("mask") is None:
                continue
            if do_gradcam and rec.get("cam") is None:
                continue
            if run_temp_mask:
                time_mask_results.append(rec["mask"])
            if do_gradcam and rec.get("cam") is not None:
                grad_cam_results.append(rec["cam"])
            done_ids.add(vid)
            resumed_clips += 1
        if resumed_clips or resumed_skipped:
            print(
                f"[find-masks] resume: {resumed_clips} clips restored from "
                f"the emission journal ({resumed_skipped} journaled "
                f"min_score skips) — re-running the rest",
                flush=True,
            )
    journal = _EmissionJournal(journal_path, fresh=not resume)

    # ---- compacted staged execution --------------------------------------
    # Kept clips accumulate host-side across loader batches; the jitted
    # score/init/search/cam programs (compiled ONCE, fixed batch B) launch
    # only on full batches. A single padded final flush drains the
    # remainder — padding rows repeat row 0 and are sliced off host-side.
    B = cfg.data.batch_size
    is_kth = _is_kth_run(cfg)
    if mesh is not None:
        from ivf_tpu.parallel.mesh import data_sharding

        _sharding = data_sharding(mesh)
        _put = lambda a: jax.device_put(a, _sharding)
    else:
        _put = jnp.asarray

    def _to_device(arr):
        x = _put(np.ascontiguousarray(arr))
        if x.dtype == jnp.uint8:
            x = _cast_f32(x)
        return x

    def _pad_np(arr):
        n = arr.shape[0]
        if n >= B:
            return arr
        fill = np.broadcast_to(arr[:1], (B - n, *arr.shape[1:]))
        return np.concatenate([arr, fill], axis=0)

    pending: list = []  # rows awaiting the min_score probe (clip, label, id)
    ready: list = []  # rows ready to search (clip, label, id, output|None)
    run_stats = {
        "score_launches": 0,
        "search_launches": 0,
        "searched_rows": 0,
        "padded_rows": 0,
        # chunked-path segment programs actually launched; under early_stop
        # a batch whose clips all converge stops launching segments early
        "segments_launched": 0,
        # per-clip steps actually applied (== opt_iter unless early_stop
        # froze the row sooner) — the convergence histogram's raw data
        "n_steps_run": [],
        # chunked-path per-segment launch wall times (sync-bounded): the
        # raw data for steady-state vs first-encounter throughput analysis
        "segment_seconds": [],
        # fused prologue+segment-1 launch wall times (fuse_prologue path);
        # kept separate from segment_seconds so steady-state per-segment
        # analysis is not polluted by the prologue share of the fused
        # program
        "proseg1_seconds": [],
        # refill path (MaskConfig.refill): re-staged continuation flushes
        # launched and survivor rows re-staged across them
        "refill_flushes": 0,
        "refill_requeued_rows": 0,
        # resume path: journaled records restored instead of re-run
        "resumed_clips": resumed_clips,
        "resumed_skipped": resumed_skipped,
    }
    pert_cache: dict = {}
    viz_writer = _AsyncWriter(enabled=mk.async_viz)

    def _pert_batch(ptype: str, snap: bool):
        key = (ptype, snap)
        if key not in pert_cache:
            pert_cache[key] = hot_jit(
                jax.vmap(
                    lambda c, m: perturb_sequence(
                        c, m, ptype, snap_values=snap
                    )
                )
            )
        return pert_cache[key]

    def _stage_round1(take):
        """Upload a staged batch and launch the prologue (+fused segment 1
        when configured): staging rows -> device arrays + search carry. The
        entry launch shared by the one-shot flush path and the refill path."""
        n = len(take)
        clips_np = np.stack([r[0] for r in take])
        labels_np = np.asarray([r[1] for r in take])
        ids_k = [str(r[2]) for r in take]
        clips_dev = _to_device(_pad_np(clips_np))
        labels_dev = jnp.asarray(_pad_np(labels_np))
        outputs_arg = (
            jnp.asarray(_pad_np(np.stack([r[3] for r in take])))
            if take[0][3] is not None
            else None
        )
        rng_keys = None
        if run_temp_mask and mk.mask_init_type != "central":
            # per-clip keys fold a stable id hash into the seed, NOT the
            # flush position: a clip's random init is then independent of
            # staging composition, so compaction/refill/resume all leave
            # random-init results bit-identical too
            import zlib

            hashes = np.asarray(
                [zlib.crc32(str(r[2]).encode()) for r in take], np.uint32
            )
            base_key = jax.random.PRNGKey(cfg.seed)
            rng_keys = jax.vmap(lambda h: jax.random.fold_in(base_key, h))(
                jnp.asarray(_pad_np(hashes))
            )
        segs_done = 0
        if pro_seg_batch is not None:
            # fused prologue+segment-1: one GB-operand launch per flush
            t0 = time.time()
            outputs, targets, inits, carry = _traced(
                "prologue+seg1",
                partial(
                    pro_seg_batch, clips_dev, labels_dev, outputs_arg, rng_keys
                ),
            )
            jax.block_until_ready(carry)
            run_stats["proseg1_seconds"].append(round(time.time() - t0, 2))
            run_stats["segments_launched"] += 1
            segs_done = 1
        else:
            outputs, targets, inits, carry = _traced(
                "prologue",
                partial(
                    prologue_batch, clips_dev, labels_dev, outputs_arg, rng_keys
                ),
            )
        if outputs_arg is None:
            run_stats["score_launches"] += 1
        return (
            n, clips_dev, labels_np, ids_k, outputs, targets, inits, carry,
            segs_done,
        )

    def _emit_rows(sel, ids_k, labels_np, pred, outputs_np, clips_dev, res, cams):
        """Result records + viz for rows ``sel`` (indices into the padded
        batch) — the emission tail shared by the one-shot flush path
        (sel = every real row) and the refill path (sel = the rows retiring
        at a segment boundary). Big per-row arrays (clips, perturbed clips,
        CAMs, masks) are gathered ON DEVICE at ``sel`` before the fetch, so
        a partial harvest never pulls the whole GB-scale batch to host."""
        sel_np = np.asarray(sel, np.int64)
        sel_dev = jnp.asarray(sel_np)
        # per-clip journal records; appended durably once this emission's
        # artifacts are (inside the viz job when viz runs, else right here)
        jrecs = {j: {"video_id": ids_k[j], "mask": None, "cam": None}
                 for j in sel}
        masks_np = freeze_np = reverse_np = None
        if run_temp_mask:
            masks_np = np.asarray(
                _traced(
                    "fetch-mask", lambda: jnp.take(res.mask, sel_dev, axis=0)
                )
            )
            freeze_np = np.asarray(res.freeze_score)[sel_np]
            reverse_np = np.asarray(res.reverse_score)[sel_np]
            run_stats["n_steps_run"].extend(
                np.asarray(res.n_steps_run)[sel_np].tolist()
            )
            for k, j in enumerate(sel):
                rec = {
                    "true_class": int(labels_np[j]),
                    "pred_class": int(pred[j]),
                    "video_id": ids_k[j],
                    "time_mask": masks_np[k],
                    "original_score_guess": float(outputs_np[j].max()),
                    "original_score_true": float(
                        outputs_np[j][labels_np[j]]
                    ),
                    "freeze_score": float(freeze_np[k]),
                    "reverse_score": float(reverse_np[k]),
                }
                time_mask_results.append(rec)
                jrecs[j]["mask"] = rec
        cams_np = None
        if do_gradcam:
            cams_np = np.asarray(jnp.take(cams, sel_dev, axis=0))
            for k, j in enumerate(sel):
                rec = {
                    "true_class": int(labels_np[j]),
                    "pred_class": int(pred[j]),
                    "video_id": ids_k[j],
                    "GCHeatMap": cams_np[k],
                }
                grad_cam_results.append(rec)
                jrecs[j]["cam"] = rec

        if save_viz and run_temp_mask:
            # ONE unified per-clip viz loop (the reference's two back-to-back
            # loops shared the same out_folder); viz perturbations computed
            # batched+jitted per flush instead of per-clip eager calls.
            # The ClassScore txt files are written whenever the mask search
            # ran — the reference emits them inside the mask block
            # regardless of doGradCam (FindMasksComparison_I3D_smth.py:
            # 222-239); images additionally need do_gradcam / is_kth.
            from ivf_tpu.viz import create_image_arrays, visualize_results

            masks_dev = res.mask  # (B, T) padded — feeds batched perturbs
            viz_perts = {}
            if do_gradcam:
                for ptype in ("freeze", "reverse"):
                    viz_perts[ptype] = np.asarray(
                        jnp.take(
                            _pert_batch(ptype, True)(clips_dev, masks_dev),
                            sel_dev,
                            axis=0,
                        )
                    )
            kth_pert = None
            if is_kth:
                # KTH driver additionally renders the perturbed sequence
                # itself (FindMasksComparison_I3D_KTH.py:362-366), unsnapped
                kth_pert = np.asarray(
                    jnp.take(
                        _pert_batch(mk.mask_perturb_type, False)(
                            clips_dev, masks_dev
                        ),
                        sel_dev,
                        axis=0,
                    )
                )
            # clip pixels feed only the image branches — skip the fetch on
            # a txt-only flush (do_gradcam=False, non-KTH)
            clips_f32 = (
                np.asarray(jnp.take(clips_dev, sel_dev, axis=0))
                if (do_gradcam or is_kth)
                else None
            )

            # Pure-host rendering of this (already-fetched) batch; runs in
            # the background writer so the next batch's device search
            # launches while these images write (MaskConfig.async_viz).
            def _viz_job(
                sel=list(sel),
                ids_k=ids_k,
                labels_np=labels_np,
                pred=pred,
                cams_np=cams_np,
                masks_np=masks_np,
                freeze_np=freeze_np,
                reverse_np=reverse_np,
                viz_perts=viz_perts,
                kth_pert=kth_pert,
                clips_f32=clips_f32,
                outputs_np=outputs_np,
                jlist=list(jrecs.values()),
            ):
                for k, j in enumerate(sel):
                    tag = ids_k[j]
                    # per-clip dir carries the guess/true score suffixes the
                    # reference embeds (FindMasksComparison_I3D_smth.py:
                    # 222-225); the reference int-casts the guess score
                    # (always 0 post-softmax — a defect), we format the real
                    # float. Its `args.subDir` path element is this repo's
                    # save_dir = output_dir/model_name (config.py --subDir).
                    gs = float(outputs_np[j].max())
                    cs = float(outputs_np[j][labels_np[j]])
                    out_folder = os.path.join(
                        save_dir,
                        "cam_saved_images",
                        str(int(labels_np[j])),
                        f"{tag}g_{int(pred[j])}_gs{gs:5.4f}_cs{cs:5.4f}",
                        "combined",
                    )
                    os.makedirs(out_folder, exist_ok=True)
                    # per-clip score text files — written whenever the mask
                    # search ran (FindMasksComparison_I3D_smth.py:229-239
                    # writes them outside the doGradCam block)
                    for nm, val in (
                        ("Freeze", float(freeze_np[k])),
                        ("Reverse", float(reverse_np[k])),
                    ):
                        with open(
                            os.path.join(
                                out_folder, f"ClassScore{nm}case{tag}.txt"
                            ),
                            "w",
                        ) as f:
                            f.write(str(val))
                    if do_gradcam:
                        for ptype in ("freeze", "reverse"):
                            create_image_arrays(
                                clips_f32[k],
                                cams_np[k],
                                masks_np[k],
                                viz_perts[ptype][k],
                                out_folder,
                                case_tag=ptype + tag,
                            )
                    if is_kth:
                        visualize_results(
                            clips_f32[k],
                            kth_pert[k],
                            masks_np[k],
                            root_dir=out_folder,
                            case=tag,
                            mark_imgs=True,
                        )
                # journal last: journaled ⇒ this clip's viz/score artifacts
                # are already on disk, so resume never skips a half-written
                # clip
                journal.append_many(jlist)

            viz_writer.submit(_viz_job)
        else:
            # no viz I/O to wait for — the result records ARE the artifacts.
            # Still ride the async writer: with Grad-CAM on, a 128-clip
            # flush journals ~400 MB of full-resolution heatmaps (~8.6 s
            # host I/O measured — PERF.md round 5), which overlaps the next
            # flush's device launch instead of serializing against it;
            # mask-only flushes are ~50 KB / ~13 ms either way
            viz_writer.submit(
                lambda recs=list(jrecs.values()): journal.append_many(recs)
            )

    def _run_batch(take):
        (
            n, clips_dev, labels_np, ids_k, outputs, targets, inits, carry,
            segs_done,
        ) = _stage_round1(take)
        outputs_np = np.asarray(outputs)[:n]
        pred = np.argmax(outputs_np, axis=-1)

        res = cams = None
        if run_temp_mask:
            res, cams = run_search(clips_dev, targets, inits, carry, segs_done)
            run_stats["search_launches"] += 1
            run_stats["searched_rows"] += n
            run_stats["padded_rows"] += B - n
        if do_gradcam and cams is None:
            # no mask search ran in this flush -> standalone CAM program
            cams = _traced("grad-cam", partial(cam_batch, clips_dev, targets))
        if run_temp_mask or do_gradcam:
            _emit_rows(
                list(range(n)), ids_k, labels_np, pred, outputs_np, clips_dev,
                res, cams,
            )

    def _run_refill_flush(take, segs_done):
        """One refill-path flush (MaskConfig.refill): ``take`` rows have
        ``segs_done`` completed segments (0 = fresh staging rows, >0 =
        re-staged survivors carrying their exact per-row search state).
        Advances segments; at each boundary, rows whose early-stop flag
        froze RETIRE through the operand-resident finalize+CAM program.
        A boundary that mixes retired and surviving rows re-stages the
        survivors (host uint8 clip + the exact carry slice: mask logits,
        Adam state, loss, counters) into ``requeues[segs_done]`` to flush
        again at full batch occupancy — total search work drops to
        ~sum(ceil(stop_i/chunk))*chunk steps instead of batches*opt_iter.
        Per-row math is batch-composition independent (vmapped ops, eval-
        mode BN), so every clip's result is identical to the non-refill
        path; only emission ORDER changes (retirement vs staging order)."""
        if segs_done == 0:
            (
                n, clips_dev, labels_np, ids_k, outputs, targets, _inits,
                carry, segs_done,
            ) = _stage_round1(take)
            outputs_np = np.asarray(outputs)[:n]
            targets_np = np.asarray(targets)[:n]
            run_stats["search_launches"] += 1
            run_stats["searched_rows"] += n
        else:
            n = len(take)
            labels_np = np.asarray([r[1] for r in take])
            ids_k = [str(r[2]) for r in take]
            outputs_np = np.stack([r[3] for r in take])
            targets_np = np.asarray([r[4] for r in take])
            clips_dev = _to_device(_pad_np(np.stack([r[0] for r in take])))
            targets = jnp.asarray(_pad_np(targets_np))
            carry = jax.tree.map(
                lambda *rows: _put(_pad_np(np.stack(rows))),
                *[r[5] for r in take],
            )
            run_stats["refill_flushes"] += 1
        run_stats["padded_rows"] += B - n
        pred = np.argmax(outputs_np, axis=-1)
        rem_done = rem_batch is None
        harvested = np.zeros(n, bool)
        while True:
            sched_done = segs_done >= n_full and rem_done
            active_np = np.asarray(carry[3])[:n].astype(bool)
            if sched_done:
                active_np[:] = False
            retiring = [
                j for j in range(n) if not (active_np[j] or harvested[j])
            ]
            if retiring:
                res, cams = _traced(
                    "finalize+cam", partial(epilogue, clips_dev, targets, carry)
                )
                _emit_rows(
                    retiring, ids_k, labels_np, pred, outputs_np, clips_dev,
                    res, cams,
                )
                harvested[retiring] = True
            if sched_done or not active_np.any():
                return
            if retiring:
                # mixed boundary: survivors re-stage to run at full occupancy
                carry_np = jax.tree.map(np.asarray, carry)
                survivors = np.nonzero(active_np)[0]
                q = requeues.setdefault(segs_done, [])
                for j in survivors:
                    q.append(
                        (
                            take[j][0],
                            int(labels_np[j]),
                            ids_k[j],
                            outputs_np[j],
                            int(targets_np[j]),
                            jax.tree.map(lambda a: a[j], carry_np),
                        )
                    )
                run_stats["refill_requeued_rows"] += len(survivors)
                return
            # no row froze at this boundary: advance a segment in place
            t0 = time.time()
            if segs_done < n_full:
                carry = _traced(
                    f"seg{segs_done + 1}",
                    partial(seg_batch, clips_dev, targets, carry),
                )
                segs_done += 1
            else:
                carry = _traced(
                    "segrem", partial(rem_batch, clips_dev, targets, carry)
                )
                rem_done = True
            jax.block_until_ready(carry)
            run_stats["segment_seconds"].append(round(time.time() - t0, 2))
            run_stats["segments_launched"] += 1

    def _pump_requeues(final: bool = False):
        # ascending-round sweep, repeated while flushes cascade survivors
        # into higher rounds; terminates because rounds are bounded by the
        # segment schedule
        progressed = True
        while progressed:
            progressed = False
            for r in sorted(requeues):
                q = requeues[r]
                while len(q) >= B or (final and q):
                    take = q[:B]
                    del q[:B]
                    _run_refill_flush(take, r)
                    progressed = True

    def _flush_ready(final: bool = False):
        while len(ready) >= B or (final and ready):
            take = ready[:B]
            del ready[:B]
            if refill_on:
                _run_refill_flush(take, 0)
            else:
                _run_batch(take)
        if refill_on:
            # drain any continuation queues that filled (final: all of them,
            # padded like the staging drain)
            _pump_requeues(final=final)

    def _flush_pending(final: bool = False):
        # TF drivers skip clips whose true-class probability is below the
        # threshold (find_mask_smth.py:364-366) — probe forwards run on
        # full compacted batches too, and survivors re-stage for search
        while len(pending) >= B or (final and pending):
            take = pending[:B]
            del pending[:B]
            n = len(take)
            clips_dev = _to_device(
                _pad_np(np.stack([r[0] for r in take]))
            )
            outs = np.asarray(batched_scores(clips_dev))[:n]
            run_stats["score_launches"] += 1
            skips = []
            for j, (clip, label, cid) in enumerate(take):
                if outs[j][label] >= mk.min_score:
                    ready.append((clip, label, cid, outs[j]))
                else:
                    # journal the rejection so a resumed run re-probes
                    # nothing (find_mask_smth.py:364-366 skips are
                    # deterministic given weights+clip)
                    skips.append({"video_id": str(cid), "skip": True})
            if skips:
                journal.append_many(skips)
            _flush_ready()

    _body_ok = False
    try:
        for bidx, batch in enumerate(loader):
            if max_batches is not None and bidx >= max_batches:
                break
            clips, labels, ids = batch if len(batch) == 3 else (*batch, None)
            clips_np = np.asarray(clips)
            labels_np = np.asarray(labels)
            # fallback ids carry the batch index so different batches can
            # never collide in result keys / viz output dirs
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
            if done_ids:
                # resume: journaled clips (results restored / min_score
                # skips) never re-stage
                keep &= np.asarray([str(i) not in done_ids for i in ids])
            for i in np.nonzero(keep)[0]:
                # copy() the row: a view would pin its WHOLE loader batch in
                # host RAM, and under selective filters staged rows span
                # many batches — up to (B-1) full batches of dead memory
                if mk.min_score > 0.0:
                    pending.append(
                        (clips_np[i].copy(), int(labels_np[i]), ids[i])
                    )
                else:
                    ready.append(
                        (clips_np[i].copy(), int(labels_np[i]), ids[i], None)
                    )
            if mk.min_score > 0.0:
                _flush_pending()
            else:
                _flush_ready()

        # drain the staging buffers (the only padded launches of the run)
        if mk.min_score > 0.0:
            _flush_pending(final=True)
        _flush_ready(final=True)
        _body_ok = True
    finally:
        # drain/stop the background viz writer; on the error path, wait but
        # don't let a worker failure mask the original exception
        viz_writer.close(raise_errors=_body_ok)
    if run_temp_mask and mk.early_stop and run_stats["n_steps_run"]:
        # self-reported stop distribution: every synthetic-weights caveat in
        # PERF.md says real-data distributions must come from the user's own
        # run — so the driver prints (and persists) its own histogram and the
        # realized segment savings vs the fixed schedule
        sr = np.asarray(run_stats["n_steps_run"])
        summary = {
            "clips": int(sr.size),
            "step_budget": int(mk.opt_iter),
            "steps_run_p50": int(np.percentile(sr, 50)),
            "steps_run_p90": int(np.percentile(sr, 90)),
            "steps_run_max": int(sr.max()),
            "steps_run_mean": round(float(sr.mean()), 1),
            "frozen_frac": round(float((sr < mk.opt_iter).mean()), 4),
        }
        if chunk < mk.opt_iter:
            per_flush = -(-mk.opt_iter // chunk)  # ceil
            fixed_segments = run_stats["search_launches"] * per_flush
            summary["segments_launched"] = run_stats["segments_launched"]
            summary["segments_fixed_schedule"] = fixed_segments
            summary["refill_flushes"] = run_stats["refill_flushes"]
            summary["refill_requeued_rows"] = run_stats["refill_requeued_rows"]
            seg_note = (
                f"; segments {run_stats['segments_launched']}"
                f"/{fixed_segments} fixed-schedule"
                f" (refill: {run_stats['refill_flushes']} flushes,"
                f" {run_stats['refill_requeued_rows']} re-staged rows)"
            )
        else:
            seg_note = ""
        run_stats["early_stop_summary"] = summary
        print(
            f"[find-masks] early-stop over {summary['clips']} clips: "
            f"steps/clip p50 {summary['steps_run_p50']} "
            f"p90 {summary['steps_run_p90']} max {summary['steps_run_max']} "
            f"(budget {mk.opt_iter}, frozen {summary['frozen_frac']:.0%})"
            f"{seg_note}",
            flush=True,
        )
    if run_temp_mask or do_gradcam:
        # history.json-style machine-readable run stats next to the pickles
        with open(os.path.join(results_path, "search_stats.json"), "w") as f:
            json.dump(
                {k: v for k, v in run_stats.items() if k != "n_steps_run"},
                f,
                indent=1,
            )
    if stats is not None:
        stats.update(run_stats)

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
