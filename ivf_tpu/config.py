"""Unified configuration — one dataclass tree replacing both reference
config systems.

The reference has two flag systems (SURVEY.md §5): python-dict config
modules + ~30 argparse overrides in the torch half
(``video_features_pytorch/utils.py:12-122``, ``configs/config_*.py``) and
``tf.app.flags`` in the TF half (``configs/config_train_*_clstm.py``).
``Config.from_dict`` accepts the torch half's dict keys verbatim (so the
reference's config modules load unchanged), and ``add_cli_overrides`` /
``apply_cli_overrides`` mirror the reference flag names.
"""

from __future__ import annotations

import argparse
import dataclasses
import importlib.util
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class DataConfig:
    data_folder: str = ""
    json_data_train: str = ""
    json_data_val: str = ""
    json_data_test: str = ""
    json_file_labels: str = ""
    input_mode: str = "jpg"  # jpg | records
    record_paths: Tuple[str, ...] = ()  # fallback when per-split not given
    record_paths_train: Tuple[str, ...] = ()
    record_paths_val: Tuple[str, ...] = ()
    # KTH per-subject shard selection (TF train_kth.py:13-34)
    records_folder: str = ""
    train_subjects: Tuple[int, ...] = ()
    val_subjects: Tuple[int, ...] = ()
    subjects_clips_csv: str = ""
    clip_size: int = 16
    input_spatial_size: int = 224
    batch_size: int = 16
    num_workers: int = 8
    shuffle: bool = True
    upscale_factor_train: float = 1.4
    upscale_factor_eval: float = 1.0
    step_size_train: int = 1
    step_size_val: int = 1
    nclips_train: int = 1
    nclips_val: int = 1


@dataclass
class ModelConfig:
    conv_model: str = "i3d_smth"  # registry name or reference alias
    num_classes: int = 174
    soft_max: bool = False
    last_relu: Optional[str] = None
    last_stride: int = 1
    stride_mod_layers: Tuple[str, ...] = ()
    final_temp_time: int = 2
    dropout: float = 0.5
    # ConvLSTM-specific
    clstm_hidden: int = 32
    clstm_layers: int = 4
    conv_stride: int = 1
    batch_norm: bool = True
    use_entire_seq: bool = False
    conv_kernel_size: int = 5
    pool_kernel: Tuple[int, int] = (2, 2)
    effective_steps: Tuple[int, ...] = ()
    # torch family: drop->bn->pool (CLSTM_4); tf family: pool->bn
    # (video_features_tf/models/clstm.py:21-50)
    block_order: str = "torch"  # torch | tf
    pooling: str = "max"  # max | avg
    # TF flags kernel_size_1/kernel_size_2 allow rectangular ConvLSTM
    # kernels (KTH uses (3,5), config_train_kth_clstm.py:28-33); None
    # means square conv_kernel_size
    conv_kernel_size_2: Optional[int] = None
    # Keras ConvLSTM2D input-conv padding: torch (symmetric) | valid
    padding_clstm: str = "torch"
    pretrained_model_path: str = "no_ckpt"
    compute_dtype: str = "float32"  # float32 | bfloat16
    use_pallas: bool = False  # route eligible ops through Pallas kernels
    pool_impl: str = "reduce_window"  # I3D maxpools: 'reduce_window' |
    # 'shift' (separable slice-max chain) | 'eqbwd' (equality-stencil VJP
    # for the stride-1 branch pools) | 'argmax' (uint8 index-plane VJP,
    # stride-1 branch pools, bf16 — the measured +9% winner) |
    # 'argmax_full' (argmax incl. strided trunk pools) |
    # 'argmax_shift' (argmax branch pools + shift-chain trunk pools)
    # — see PERF.md for per-impl chip measurements
    fuse_pool_conv: object = False  # I3D Inception branch-3 pool+1x1conv
    # as one Pallas kernel per direction (inference/mask search only);
    # True = per-frame grid, 'tblock' = whole-T frame-block grid (round 5)
    # Keras-ConvLSTM2D cell fidelity knobs for the TF model family
    # (video_features_tf/models/clstm.py:9-51): hard-sigmoid recurrent
    # activation and L2 kernel regularization feeding the training loss.
    recurrent_activation: str = "sigmoid"  # sigmoid | hard_sigmoid
    kernel_l2: float = 0.0  # L2 regularizer strength on conv kernels
    # ConvLSTM recurrence compilation strategy: 'unrolled' (O(T) HLOs,
    # measured fastest at every reference shape), 'scan' (nn.scan + remat,
    # O(1) HLOs in T — 10-30x compile-time cut, ~30% slower steady state),
    # or 'auto': unrolled for clip_size <= 64 (every reference workload),
    # scan beyond that where HLO count would blow up. PERF.md round 3.
    clstm_scan: str = "auto"  # auto | scan | unrolled
    # Inference top-k width: KTH drivers report top-3 (inference_kth.py:10
    # TOP_X=3), smth top-5. None derives it from the model family
    # (api.infer); set explicitly to override.
    top_k: Optional[int] = None


@dataclass
class OptimConfig:
    optimizer: str = "ADAM"
    lr: float = 0.008
    last_lr: float = 1e-5
    momentum: float = 0.9
    weight_decay: float = 1e-5
    num_epochs: int = 1
    print_freq: int = 4
    lr_factor: float = 0.5
    lr_patience: int = 2
    # plateau: torch ReduceLROnPlateau on val loss (train_i3d_smth.py:139-140)
    # patience_halving: the TF half's manual val-acc patience halving with an
    #   lr >= 2*last_lr floor (train_kth.py:294-312)
    lr_schedule: str = "plateau"  # plateau | patience_halving
    # preemption safety: also checkpoint mid-epoch every N train batches
    # (0 = epoch-end only); resume fast-forwards the loader to the saved
    # batch (train/loop.py::fit). Pair with async_checkpoint.
    checkpoint_steps: int = 0


@dataclass
class MaskConfig:
    lam1: float = 0.01
    lam2: float = 0.02
    opt_iter: int = 300
    opt_lr: float = 0.2
    mask_init_type: str = "central"  # central | random
    mask_perturb_type: str = "freeze"  # freeze | reverse
    grad_cam_type: str = "guessed"  # guessed | true
    class_oi: Optional[int] = None  # class-of-interest filter
    subset_file: Optional[str] = None  # CSV of clip ids to process
    top_layer: str = "Mixed_5c"
    # Both reference FindMasks drivers hardcode normalizePerFrame=True
    # (FindMasksComparison_I3D_smth.py:266), so per-frame is the default.
    normalization_mode: str = "frame"  # sequence | frame
    # TF mask drivers skip clips whose class probability is below 0.1
    # (find_mask_smth.py:364-366); the torch driver has no such filter, so
    # the default keeps everything.
    min_score: float = 0.0
    # Early stop: the reference's INTENDED per-clip convergence semantics
    # (its own `abs(oldLoss-loss) < eta` is dead code — oldLoss never
    # updates; interpret/mask_opt.py docstring). early_stop=True is the
    # measured fast mode: at eta=1e-5 (the reference's value,
    # FindMasksComparison_I3D_smth.py:164) every clip froze by step ~100 at
    # the production config — 3x fewer search segments, mask deviation
    # <=0.0135 and class/freeze-score deviation <3e-7 vs fixed-300 (PERF.md
    # round 4). The one-shot criterion is BRITTLE at loose etas (>=1e-3
    # fires on the flat first step); find_masks warns above 1e-4.
    eta: float = 1e-5
    early_stop: bool = False  # default stays exact reference parity
    # Patience window for the convergence criterion: freeze a clip only
    # after this many CONSECUTIVE sub-eta steps. 1 = the reference's
    # intended one-shot |Δloss|<eta (exact r4 semantics). Larger values
    # tame the one-shot criterion's two measured failure modes — spurious
    # fires on the flat first step at loose etas, and freezes on 1-step
    # plateaus mid-descent (trained-weights trace, PERF.md round 5) — at
    # the cost of running ≥M-1 extra steps per clip past true convergence.
    eta_patience: int = 1
    # freeze perturbation inside the search loop: closed-form transition
    # matrix (fast, ~1e-4 reassociation drift) vs the bit-exact scan —
    # set False for exact-parity comparison runs (interpret/perturb.py)
    closed_form: bool = True
    kth_clips_filter: bool = False  # use the KTH clips-of-interest whitelist
    # (FindMasksComparison_I3D_KTH.py:154-205)
    # Search execution chunking: the opt_iter-step search runs as ceil-
    # divided segments of this many steps, threading the exact loop carry
    # (logits + Adam state) across programs — bit-identical to one long
    # scan. None = auto: 100-step segments on the axon tunnel (which kills
    # single executions >~1 min; a batch-128 300-step program runs ~85 s),
    # monolithic elsewhere. Set an int to force a segment length.
    chunk_steps: Optional[int] = None
    # Fuse the prologue (score forward + central-init probes + Adam carry)
    # INTO the first search segment on the chunked path: one GB-operand
    # program launch per flush instead of two. Mathematically identical
    # (same ops, one program — equality test-pinned); pays off on backends
    # with large per-launch overhead on GB-scale operands (the axon tunnel:
    # the separate prologue measured 8.9 s steady-state of which only
    # ~1.4 s is compute — PERF.md round 4). False = separate prologue
    # program (the round-3 anatomy).
    fuse_prologue: bool = True
    # Convergence refill (chunked path + early_stop only): after each
    # search segment, rows whose early-stop flag froze RETIRE through the
    # (operand-resident, cheap) finalize+CAM program, and the surviving
    # rows re-stage host-side into round-r queues that flush again as FULL
    # batches. Total search work drops from batches*opt_iter steps to
    # ~sum(ceil(stop_i/chunk))*chunk — the only mechanism that converts
    # early stopping into throughput when the stop-step distribution has a
    # long tail (measured on trained weights: p50 92 / max 274 at eta=1e-5
    # — batch-quantized skipping alone saves nothing there; PERF.md
    # round 4, EARLYSTOP_r04.json trained_flash). Per-clip results are
    # IDENTICAL to the non-refill path (per-row math is batch-composition
    # independent; equality test-pinned); only the pickle's result ORDER
    # changes (retirement order, not staging order). None = auto: on
    # whenever early_stop runs chunked; False forces the round-3 behavior.
    refill: Optional[bool] = None
    # Overlap per-clip viz/artifact writing (PNG triptychs, GIFs, score txt
    # files) with the next batch's device search via a single background
    # writer thread. Device programs stay on the main thread; only the
    # already-fetched host arrays render in the worker, bounded to 2
    # in-flight batches. False = write inline (bit-identical artifacts,
    # serialized after each search launch like the reference drivers).
    async_viz: bool = True


@dataclass
class Config:
    model_name: str = "model"
    output_dir: str = "trained_models/"
    split_type: str = "original"
    test_run: bool = False  # 5-step smoke mode (TF --test_run yes)
    seed: int = 0
    # non-blocking epoch checkpoints (orbax background write; the best-copy
    # and any restore barrier on the in-flight save — utils/checkpoint.py)
    async_checkpoint: bool = False
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    mask: MaskConfig = field(default_factory=MaskConfig)

    # ------------------------------------------------------------------
    @staticmethod
    def from_dict(d: dict) -> "Config":
        """Accept the torch half's flat config-dict keys verbatim."""
        cfg = Config()
        top = {
            "model_name": "model_name",
            "output_dir": "output_dir",
            "splitType": "split_type",
            "async_checkpoint": "async_checkpoint",
        }
        sections = {
            "data": cfg.data,
            "model": cfg.model,
            "optim": cfg.optim,
            "mask": cfg.mask,
        }
        key_map = {
            # data
            "data_folder": ("data", "data_folder"),
            "json_data_train": ("data", "json_data_train"),
            "json_data_val": ("data", "json_data_val"),
            "json_data_test": ("data", "json_data_test"),
            "json_file_labels": ("data", "json_file_labels"),
            "input_mode": ("data", "input_mode"),
            "clip_size": ("data", "clip_size"),
            "input_spatial_size": ("data", "input_spatial_size"),
            "batch_size": ("data", "batch_size"),
            "num_workers": ("data", "num_workers"),
            "shuffle": ("data", "shuffle"),
            "upscale_factor_train": ("data", "upscale_factor_train"),
            "upscale_factor_eval": ("data", "upscale_factor_eval"),
            "step_size_train": ("data", "step_size_train"),
            "step_size_val": ("data", "step_size_val"),
            "nclips_train": ("data", "nclips_train"),
            "nclips_val": ("data", "nclips_val"),
            # model
            "conv_model": ("model", "conv_model"),
            "num_classes": ("model", "num_classes"),
            "soft_max": ("model", "soft_max"),
            "last_relu": ("model", "last_relu"),
            "last_stride": ("model", "last_stride"),
            "final_temp_time": ("model", "final_temp_time"),
            "dropout": ("model", "dropout"),
            "clstm_hidden": ("model", "clstm_hidden"),
            "clstm_layers": ("model", "clstm_layers"),
            "conv_stride": ("model", "conv_stride"),
            "batch_norm": ("model", "batch_norm"),
            "pretrained_model_path": ("model", "pretrained_model_path"),
            # optim
            "optimizer": ("optim", "optimizer"),
            "lr": ("optim", "lr"),
            "last_lr": ("optim", "last_lr"),
            "momentum": ("optim", "momentum"),
            "weight_decay": ("optim", "weight_decay"),
            "num_epochs": ("optim", "num_epochs"),
            "print_freq": ("optim", "print_freq"),
            # optim (rebuild-native extensions)
            "lr_schedule": ("optim", "lr_schedule"),
            "lr_factor": ("optim", "lr_factor"),
            "lr_patience": ("optim", "lr_patience"),
            "checkpoint_steps": ("optim", "checkpoint_steps"),
            # mask
            "maskPerturbType": ("mask", "mask_perturb_type"),
            "min_score": ("mask", "min_score"),
            "lam1": ("mask", "lam1"),
            "lam2": ("mask", "lam2"),
            "optIter": ("mask", "opt_iter"),
            "maskInitType": ("mask", "mask_init_type"),
            "gradCamType": ("mask", "grad_cam_type"),
            # model (ConvLSTM/TF-family extensions)
            "block_order": ("model", "block_order"),
            "pooling": ("model", "pooling"),
            "recurrent_activation": ("model", "recurrent_activation"),
            "kernel_l2": ("model", "kernel_l2"),
            "use_pallas": ("model", "use_pallas"),
            "fuse_pool_conv": ("model", "fuse_pool_conv"),
            "conv_kernel_size": ("model", "conv_kernel_size"),
            "kernel_size_1": ("model", "conv_kernel_size"),
            "kernel_size_2": ("model", "conv_kernel_size_2"),
            "padding_clstm": ("model", "padding_clstm"),
            "use_entire_seq": ("model", "use_entire_seq"),
            "compute_dtype": ("model", "compute_dtype"),
            # data (records mode)
            "records_folder": ("data", "records_folder"),
            "subjects_clips_csv": ("data", "subjects_clips_csv"),
        }
        tuple_keys = {
            "effective_steps": ("model", "effective_steps"),
            "pool_kernel": ("model", "pool_kernel"),
            "train_subjects": ("data", "train_subjects"),
            "val_subjects": ("data", "val_subjects"),
            "record_paths": ("data", "record_paths"),
            "record_paths_train": ("data", "record_paths_train"),
            "record_paths_val": ("data", "record_paths_val"),
        }
        for k, v in d.items():
            if k in top:
                if isinstance(getattr(cfg, top[k]), bool):
                    v = bool(v)
                setattr(cfg, top[k], v)
            elif k in key_map:
                sec, attr = key_map[k]
                if isinstance(getattr(sections[sec], attr), bool):
                    v = bool(v)  # reference configs use 0/1 ints
                setattr(sections[sec], attr, v)
            elif k in tuple_keys:
                sec, attr = tuple_keys[k]
                setattr(sections[sec], attr, tuple(v))
            elif k == "stride_mod_layers":
                # reference stores '' or 'A,B' strings
                if isinstance(v, str):
                    v = tuple(s for s in v.split(",") if s)
                cfg.model.stride_mod_layers = tuple(v)
            # unknown keys are ignored (reference configs carry extras like
            # column_units / save_features that no code consumes)
        return cfg

    @staticmethod
    def load(path: str) -> "Config":
        """Load a config from a .py module exposing ``config`` (reference
        utils.load_module semantics, utils.py:115-122) or a .json file."""
        if path.endswith(".json"):
            with open(path) as f:
                return Config.from_dict(json.load(f))
        spec = importlib.util.spec_from_file_location("user_config", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return Config.from_dict(mod.config)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def experiment_params(self) -> dict:
        """Flat hyperparameter dict for experiment tracking — the analogue
        of the Comet.ml params dict the TF half assembles (train_kth.py:47-54
        — which, notably, it never actually ships)."""
        flat = {}
        for section in ("data", "model", "optim", "mask"):
            for k, v in dataclasses.asdict(getattr(self, section)).items():
                flat[f"{section}.{k}"] = v
        flat["model_name"] = self.model_name
        flat["split_type"] = self.split_type
        return flat


# ----------------------------------------------------------------------
# CLI overrides — the reference's argparse surface (utils.py:12-91)
# ----------------------------------------------------------------------

_OVERRIDES = [
    # (flag, short, dest (section.attr), type)
    ("--learning_rate", "-lr", "optim.lr", float),
    ("--batch_size", "-bs", "data.batch_size", int),
    ("--optimizer", "-opt", "optim.optimizer", str),
    ("--weight_decay", "-wd", "optim.weight_decay", float),
    ("--momentum", "-mom", "optim.momentum", float),
    ("--shuffle", "-sfl", "data.shuffle", int),
    ("--batch_norm", "-bn", "model.batch_norm", int),
    ("--num_workers", "-nwork", "data.num_workers", int),
    ("--dropout", "-drop", "model.dropout", float),
    ("--clstm_hidden", "-chu", "model.clstm_hidden", int),
    ("--clstm_layers", "-chl", "model.clstm_layers", int),
    ("--conv_stride", "-ccs", "model.conv_stride", int),
    ("--final_temp_time", "-ftt", "model.final_temp_time", int),
    ("--last_stride", "-ls", "model.last_stride", int),
    ("--mod_stride_layers", "-msl", "model.stride_mod_layers", str),
    ("--soft_max", "-sm", "model.soft_max", int),
    ("--last_relu", "-lact", "model.last_relu", str),
    ("--use_sequence", "-ues", "model.use_entire_seq", int),
    ("--lam1", "-l1", "mask.lam1", float),
    ("--lam2", "-l2", "mask.lam2", float),
    ("--optIter", "-opti", "mask.opt_iter", int),
    ("--maskInitType", "-mi", "mask.mask_init_type", str),
    ("--classOI", "-coi", "mask.class_oi", int),
    ("--subsetFile", "-sf", "mask.subset_file", str),
    ("--gradCamType", "-gct", "mask.grad_cam_type", str),
    ("--splitType", "-kths", "split_type", str),
    # reference README: --subDir names the results root; here the run's
    # model_name plays that role (artifact paths are output_dir/model_name)
    ("--subDir", "-sd", "model_name", str),
    ("--dataDir", "-dd", "data.data_folder", str),
    ("--num_epochs", "-ne", "optim.num_epochs", int),
    ("--num_classes", "-nc", "model.num_classes", int),
    ("--clip_size", "-cs", "data.clip_size", int),
    ("--lr_schedule", "-lrs", "optim.lr_schedule", str),
    ("--min_score", "-msc", "mask.min_score", float),
    ("--use_pallas", "-pls", "model.use_pallas", int),
    ("--recurrent_activation", "-ract", "model.recurrent_activation", str),
    ("--kernel_l2", "-kl2", "model.kernel_l2", float),
    ("--async_checkpoint", "-actk", "async_checkpoint", int),
    ("--checkpoint_steps", "-ckst", "optim.checkpoint_steps", int),
    # 'bfloat16': mixed-precision training (f32 master params/opt/BN
    # stats, bf16 compute) and bf16 inference / mask search
    ("--compute_dtype", "-cdt", "model.compute_dtype", str),
    # the measured fast mode for find-masks (1=on): the reference's
    # intended per-clip convergence stop — see MaskConfig.early_stop
    ("--early_stop", "-estp", "mask.early_stop", int),
    ("--eta", "-eta", "mask.eta", float),
    # consecutive sub-eta steps required to freeze a clip (default 1 =
    # the reference's one-shot criterion — see MaskConfig.eta_patience)
    ("--eta_patience", "-etap", "mask.eta_patience", int),
    # 0 disables the fused prologue+segment-1 program on the chunked
    # mask-search path (debug/ablation; see MaskConfig.fuse_prologue)
    ("--fuse_prologue", "-fpro", "mask.fuse_prologue", int),
    # convergence refill compaction on the chunked early-stop path:
    # 1=on, 0=off; unset = auto (on exactly where it can help — see
    # MaskConfig.refill). NB refill changes the results-pickle ORDER
    # (retirement order), never any per-clip value.
    ("--refill", "-rfl", "mask.refill", int),
]


def add_cli_overrides(parser: argparse.ArgumentParser):
    for flag, short, _dest, typ in _OVERRIDES:
        parser.add_argument(flag, short, type=typ, default=None)
    # model-name suffix (utils.py:23 '--iteration'; applied as
    # config['model_name'] += str(args.iteration), train_clstm_kth.py:37)
    parser.add_argument("--iteration", "-i", default=None)
    return parser


def apply_cli_overrides(cfg: Config, args: argparse.Namespace) -> Config:
    if getattr(args, "iteration", None) is not None:
        cfg.model_name = cfg.model_name + str(args.iteration)
    for flag, _short, dest, _typ in _OVERRIDES:
        name = flag.lstrip("-")
        val = getattr(args, name, None)
        if val is None:
            continue
        if "." in dest:
            sec, attr = dest.split(".")
            target = getattr(cfg, sec)
        else:
            target, attr = cfg, dest
        if attr == "stride_mod_layers" and isinstance(val, str):
            val = tuple(s for s in val.split(",") if s)
        current = getattr(target, attr)
        if isinstance(current, bool) or attr == "refill":
            # refill is Optional[bool] (None = auto), so the usual
            # isinstance-on-current coercion can't see it's a bool flag
            val = bool(val)
        setattr(target, attr, val)
    return cfg
