"""End-to-end slice (SURVEY.md §7 minimum slice): synthetic frames ->
config -> train -> infer -> find_masks (+ Grad-CAM + viz artifacts), all
through the public api/cli surface on the CPU mesh."""

import json
import os

import numpy as np
import pytest

from ivf_tpu.api import build_model, find_masks, train
from ivf_tpu.config import Config


def _make_frame_tree(root, n_classes=2, clips_per_class=4, t=8, hw=32):
    from PIL import Image

    rng = np.random.RandomState(0)
    for split in ("train", "validation"):
        for c in range(n_classes):
            for k in range(clips_per_class):
                d = os.path.join(str(root), split, str(c), f"clip{split}{c}_{k}")
                os.makedirs(d)
                for i in range(t):
                    # class-dependent brightness so the model can learn
                    arr = rng.randint(0, 100, (hw, hw, 3)) + c * 120
                    Image.fromarray(arr.astype(np.uint8)).save(
                        os.path.join(d, f"frame{i+1:02d}.jpg"), "JPEG"
                    )


@pytest.fixture(scope="module")
def e2e_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    _make_frame_tree(root / "data")
    cfg = Config.from_dict(
        {
            "model_name": "e2e_clstm",
            "output_dir": str(root / "out"),
            "data_folder": str(root / "data"),
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": 4,
            "clip_size": 8,
            "input_spatial_size": 32,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "batch_norm": True,
            "dropout": 0.0,
            "optimizer": "ADAM",
            "lr": 0.005,
            "num_epochs": 2,
            "num_workers": 2,
            "print_freq": 0,
        }
    )
    cfg.model.effective_steps = (3, 7)
    return cfg


@pytest.fixture(scope="module")
def e2e_trained(e2e_cfg):
    """Train once for the whole module — every consumer (mask search,
    min_score skip, resume) gets the same state/checkpoints without
    depending on test ORDER (each works standalone under -k selection)."""
    return train(e2e_cfg)


@pytest.mark.slow
def test_e2e_train_and_eval(e2e_cfg, e2e_trained):
    state, history = e2e_trained
    assert len(history) == 2
    # training must actually LEARN — flat accuracy alone must not pass
    # (the synthetic classes are brightness-separable; 2 epochs reliably
    # drop the loss)
    assert history[-1]["val"]["loss"] < history[0]["val"]["loss"]
    assert history[-1]["val"]["top1"] >= history[0]["val"]["top1"]
    # checkpoint artifacts
    save_dir = os.path.join(e2e_cfg.output_dir, e2e_cfg.model_name)
    assert os.path.isdir(os.path.join(save_dir, "checkpoint"))
    assert os.path.isdir(os.path.join(save_dir, "model_best"))
    assert os.path.exists(os.path.join(save_dir, "plots", "loss_plot.png"))


@pytest.mark.slow
def test_e2e_find_masks_with_gradcam(e2e_cfg, e2e_trained):
    state = e2e_trained[0]
    # module-scoped cfg: restore every mutation (order-independence)
    old = (e2e_cfg.mask.opt_iter, e2e_cfg.mask.lam1, e2e_cfg.mask.lam2)
    e2e_cfg.mask.opt_iter = 8
    e2e_cfg.mask.lam1, e2e_cfg.mask.lam2 = 0.01, 0.02
    try:
        tm_results, gc_results = find_masks(
            e2e_cfg,
            state.variables(),
            max_batches=1,
            save_viz=True,
        )
    finally:
        e2e_cfg.mask.opt_iter, e2e_cfg.mask.lam1, e2e_cfg.mask.lam2 = old
    assert len(tm_results) == 4 and len(gc_results) == 4
    r = tm_results[0]
    for key in (
        "true_class",
        "pred_class",
        "video_id",
        "time_mask",
        "original_score_guess",
        "original_score_true",
        "freeze_score",
        "reverse_score",
    ):
        assert key in r, key
    assert r["time_mask"].shape == (8,)
    assert np.all((r["time_mask"] >= 0) & (r["time_mask"] <= 1))
    assert gc_results[0]["GCHeatMap"].shape == (8, 32, 32)

    save_dir = os.path.join(e2e_cfg.output_dir, e2e_cfg.model_name)
    results = os.listdir(os.path.join(save_dir, "results"))
    assert any("allTimeMaskResults" in f for f in results)
    assert any("allGradCamResults" in f for f in results)
    # viz artifacts: triptych jpgs + gif + dot overlays
    cam_root = os.path.join(save_dir, "cam_saved_images")
    found_gif = False
    for dirpath, _dirs, files in os.walk(cam_root):
        if "mygif.gif" in files:
            found_gif = True
            assert any(f.startswith("img") and f.endswith(".jpg") for f in files)
            assert any(f.startswith("casefreeze") for f in files)
    assert found_gif


@pytest.mark.slow
def test_e2e_find_masks_min_score_skip(e2e_cfg, e2e_trained):
    """TF drivers' score<threshold clip skip (find_mask_smth.py:364-366):
    an impossible threshold drops every clip; results are empty but the
    pickles are still written."""
    state = e2e_trained[0]
    old_iter, old_min = e2e_cfg.mask.opt_iter, e2e_cfg.mask.min_score
    e2e_cfg.mask.opt_iter = 2
    e2e_cfg.mask.min_score = 1.1  # class probs can never reach this
    try:
        tm, gc = find_masks(
            e2e_cfg, state.variables(), max_batches=1, save_viz=False
        )
    finally:
        e2e_cfg.mask.opt_iter, e2e_cfg.mask.min_score = old_iter, old_min
    assert tm == [] and gc == []


@pytest.mark.slow
def test_e2e_cli_grad_cam(tmp_path):
    """The grad-cam CLI subcommand runs a real CAM sweep and writes the
    results pickle (was a stub in round 1)."""
    import json as _json
    import pickle

    from ivf_tpu.cli import main as cli_main

    _make_frame_tree(tmp_path / "data", n_classes=2, clips_per_class=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        _json.dumps(
            {
                "model_name": "cli_gc",
                "output_dir": str(tmp_path / "out"),
                "data_folder": str(tmp_path / "data"),
                "conv_model": "clstm",
                "num_classes": 2,
                "batch_size": 4,
                "clip_size": 8,
                "input_spatial_size": 32,
                "clstm_hidden": 4,
                "clstm_layers": 1,
                "conv_stride": 1,
                "dropout": 0.0,
                "num_workers": 2,
            }
        )
    )
    cli_main(["grad-cam", "-c", str(cfg_path), "--test_run", "--train"])
    results = os.path.join(str(tmp_path / "out"), "cli_gc", "results")
    pickles = [f for f in os.listdir(results) if "allGradCamResults" in f]
    assert pickles
    with open(os.path.join(results, pickles[0]), "rb") as f:
        data = pickle.load(f)
    assert len(data) == 4
    assert data[0]["GCHeatMap"].shape == (8, 32, 32)
    # fallback ids are batch-unique
    assert data[0]["video_id"] != data[1]["video_id"]


@pytest.mark.slow
def test_e2e_train_resume_continues_from_epoch(e2e_cfg, e2e_trained):
    """--resume restores epoch AND best_loss: raising num_epochs 2 -> 3 and
    resuming trains exactly ONE more epoch starting at epoch index 2
    (train_i3d_smth.py:150-152 range(start_epoch, num_epochs) semantics)."""
    old = e2e_cfg.optim.num_epochs
    e2e_cfg.optim.num_epochs = 3
    try:
        _state, history = train(e2e_cfg, resume=True)
    finally:
        e2e_cfg.optim.num_epochs = old
    assert len(history) == 1
    assert history[0]["epoch"] == 2


@pytest.mark.slow
def test_e2e_resume_preserves_decayed_lr(e2e_cfg):
    """Resume must continue from the RESTORED learning rate: a fresh
    scheduler snapping back to cfg.optim.lr after the first post-resume
    epoch silently undoes plateau decay (the reference loses the decay
    entirely by rebuilding its optimizer — train_i3d_smth.py:132-141 — a
    defect fixed here per the SURVEY §2.4 policy)."""
    import copy

    from ivf_tpu.train.optim import set_learning_rate
    from ivf_tpu.utils.checkpoint import Checkpointer

    cfg = copy.deepcopy(e2e_cfg)
    cfg.model_name = "e2e_lr_resume"
    cfg.optim.num_epochs = 1
    state, _ = train(cfg)
    decayed = cfg.optim.lr / 4
    state = state.replace(
        opt_state=set_learning_rate(state.opt_state, decayed)
    )
    ckpt = Checkpointer(os.path.join(cfg.output_dir, cfg.model_name))
    ckpt.save(state, epoch=0, is_best=False, best_loss=0.123)

    cfg.optim.num_epochs = 3
    _, history = train(cfg, resume=True)
    assert len(history) == 2
    # both post-resume epochs run at (or below — plateau may decay further)
    # the restored LR; neither snaps back to cfg.optim.lr
    for h in history:
        assert h["lr"] <= decayed * 1.0001, (h["epoch"], h["lr"])


@pytest.mark.slow
def test_e2e_cli_find_masks(tmp_path):
    """`find-masks --test_run` through the CLI writes both result pickles
    (temp-mask search ran, not just the CAM pass)."""
    import json as _json
    import pickle

    from ivf_tpu.cli import main as cli_main

    _make_frame_tree(tmp_path / "data", n_classes=2, clips_per_class=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        _json.dumps(
            {
                "model_name": "cli_fm",
                "output_dir": str(tmp_path / "out"),
                "data_folder": str(tmp_path / "data"),
                "conv_model": "clstm",
                "num_classes": 2,
                "batch_size": 4,
                "clip_size": 8,
                "input_spatial_size": 32,
                "clstm_hidden": 4,
                "clstm_layers": 1,
                "conv_stride": 1,
                "dropout": 0.0,
                "num_workers": 2,
            }
        )
    )
    cli_main(["find-masks", "-c", str(cfg_path), "--test_run", "-opti", "2"])
    results = os.path.join(str(tmp_path / "out"), "cli_fm", "results")
    files = os.listdir(results)
    assert any("allTimeMaskResults" in f for f in files)
    assert any("allGradCamResults" in f for f in files)
    with open(os.path.join(results, next(f for f in files if "TimeMask" in f)), "rb") as f:
        tm = pickle.load(f)
    assert len(tm) == 4 and tm[0]["time_mask"].shape == (8,)


@pytest.mark.slow
def test_e2e_train_patience_halving(e2e_cfg):
    """lr_schedule='patience_halving' is selectable end-to-end."""
    import dataclasses

    cfg = dataclasses.replace(
        e2e_cfg,
        model_name="e2e_ph",
        optim=dataclasses.replace(
            e2e_cfg.optim,
            lr_schedule="patience_halving",
            lr_patience=1,
            num_epochs=2,
        ),
    )
    _state, history = train(cfg)
    assert len(history) == 2
    assert all(np.isfinite(h["val"]["loss"]) for h in history)


def test_cli_make_records_and_train_on_records(tmp_path):
    _make_frame_tree(tmp_path / "data", clips_per_class=2)
    from ivf_tpu.cli import main

    out = str(tmp_path / "train.ivfrecords")
    main(
        [
            "make-records",
            "--frames-root",
            str(tmp_path / "data" / "train"),
            "--out",
            out,
            "--nb-frames",
            "8",
            "--mode",
            "all",
        ]
    )
    from ivf_tpu.data.loaders import RecordDataset

    ds = RecordDataset(out, clip_size=8)
    assert len(ds) == 4
    clip, label = ds[0]
    assert clip.shape == (8, 32, 32, 3) and label in (0, 1)


@pytest.mark.slow
def test_find_masks_on_records(tmp_path):
    """find_masks over a records-mode dataset (the TF half's input path,
    mask/find_mask_*.py on tfrecords): record video_ids become result ids."""
    import jax
    import jax.numpy as jnp

    from ivf_tpu.cli import main as cli_main

    _make_frame_tree(tmp_path / "data", clips_per_class=2)
    out = str(tmp_path / "val.ivfrecords")
    cli_main(
        [
            "make-records",
            "--frames-root", str(tmp_path / "data" / "validation"),
            "--out", out, "--nb-frames", "8", "--mode", "all",
        ]
    )
    cfg = Config.from_dict(
        {
            "model_name": "rec_fm",
            "output_dir": str(tmp_path / "out"),
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": 4,
            "clip_size": 8,
            "input_spatial_size": 32,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "dropout": 0.0,
            "num_workers": 2,
        }
    )
    cfg.model.effective_steps = (3, 7)
    cfg.data.input_mode = "records"
    cfg.data.record_paths_val = (out,)
    cfg.mask.opt_iter = 2

    model = build_model(cfg, softmax_override=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    tm, gc = find_masks(cfg, variables, max_batches=1, save_viz=False)
    assert len(tm) == 4 and len(gc) == 4
    # ids come from the record video_id field, not the batch fallback
    assert all(not r["video_id"].startswith("b0_") for r in tm)


@pytest.mark.slow
def test_i3d_find_masks_end_to_end(tmp_path):
    """I3D path of find_masks (trunk/head-split Grad-CAM + vmapped search)
    on small synthetic clips, exercising the sized-down I3D end to end."""
    import jax
    import jax.numpy as jnp

    _make_frame_tree(tmp_path / "data", n_classes=2, clips_per_class=2, t=16, hw=64)
    cfg = Config()
    cfg.output_dir = str(tmp_path / "out")
    cfg.model_name = "i3d_e2e"
    cfg.data.data_folder = str(tmp_path / "data")
    cfg.model.conv_model = "i3d_smth"
    cfg.model.num_classes = 2
    cfg.model.dropout = 0.0
    cfg.data.clip_size = 16
    cfg.data.input_spatial_size = 64
    cfg.data.batch_size = 4
    cfg.data.num_workers = 2
    cfg.mask.opt_iter = 3

    model = build_model(cfg, softmax_override=True)
    assert model.num_classes == 2 and model.softmax
    # size the logits pool for 64^2 inputs (Mixed_5c spatial = 2x2)
    model = model.clone(pool_shape=(2, 2, 2))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3))
    )

    # monkeypatch build_model so find_masks uses the pool-sized model
    import ivf_tpu.api as api_mod

    orig = api_mod.build_model
    api_mod.build_model = lambda cfg, softmax_override=None: model
    try:
        tm, gc = api_mod.find_masks(
            cfg, variables, max_batches=1, save_viz=False
        )
    finally:
        api_mod.build_model = orig
    assert len(tm) == 4 and len(gc) == 4
    assert tm[0]["time_mask"].shape == (16,)
    assert gc[0]["GCHeatMap"].shape == (16, 64, 64)
    assert np.isfinite(gc[0]["GCHeatMap"]).all()


@pytest.mark.slow
def test_kth_find_masks_writes_perturbed_seq_viz(tmp_path):
    """The KTH driver additionally renders the perturbed sequence itself
    (FindMasksComparison_I3D_KTH.py:362-366): find_masks with a 'kth' model
    family + save_viz writes PerturbImgs/case<tag>pert<i>.png."""
    import jax
    import jax.numpy as jnp

    # KTH numbered-dir layout: root/<idx>/frameNN.jpg + class.txt/label.txt
    # (conv_model containing 'kth' routes build_dataset to KTHFrameDataset)
    from PIL import Image

    rng = np.random.RandomState(0)
    data_root = tmp_path / "data"
    for idx in range(2):
        d = data_root / str(idx)
        d.mkdir(parents=True)
        for i in range(16):
            arr = rng.randint(0, 100, (64, 64, 3)) + (idx % 2) * 120
            Image.fromarray(arr.astype(np.uint8)).save(
                str(d / f"frame{i+1:02d}.jpg"), "JPEG"
            )
        (d / "class.txt").write_text(f"{idx % 2}\n")
        (d / "label.txt").write_text(f"person{idx:02d}_boxing_d1_1\n")
    cfg = Config()
    cfg.output_dir = str(tmp_path / "out")
    cfg.model_name = "i3d_kth_viz"
    cfg.data.data_folder = str(data_root)
    cfg.model.conv_model = "i3d_kth"
    cfg.model.num_classes = 2
    cfg.model.dropout = 0.0
    cfg.data.clip_size = 16
    cfg.data.input_spatial_size = 64
    cfg.data.batch_size = 2
    cfg.data.num_workers = 1
    cfg.mask.opt_iter = 2

    model = build_model(cfg, softmax_override=True).clone(pool_shape=(2, 2, 2))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3))
    )
    import ivf_tpu.api as api_mod

    orig = api_mod.build_model
    api_mod.build_model = lambda cfg, softmax_override=None: model
    try:
        tm, _gc = api_mod.find_masks(
            cfg, variables, max_batches=1, save_viz=True
        )
    finally:
        api_mod.build_model = orig
    assert tm
    pert_pngs = []
    for dirpath, _dirs, files in os.walk(
        os.path.join(cfg.output_dir, cfg.model_name, "cam_saved_images")
    ):
        if dirpath.endswith("PerturbImgs"):
            pert_pngs += [f for f in files if f.endswith(".png")]
    assert len(pert_pngs) >= 16  # one per frame for at least one clip


def test_make_records_edge_cases(tmp_path):
    """Stray jpgs, gaps, single-frame and empty clip dirs don't break
    make-records (code-review regression)."""
    from PIL import Image

    rng = np.random.RandomState(0)

    def put(path, name):
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            str(path / name), "JPEG"
        )

    root = tmp_path / "frames" / "0"
    # normal clip with a stray non-frame jpg and a numbering gap
    d1 = root / "clip_a"
    d1.mkdir(parents=True)
    for i in (1, 2, 4, 5):
        put(d1, f"frame{i:02d}.jpg")
    put(d1, "preview.jpg")
    # single-frame clip
    d2 = root / "clip_b"
    d2.mkdir()
    put(d2, "frame01.jpg")
    # empty clip
    d3 = root / "clip_c"
    d3.mkdir()

    from ivf_tpu.cli import main

    out = str(tmp_path / "edge.ivfrecords")
    main(
        [
            "make-records",
            "--frames-root",
            str(tmp_path / "frames"),
            "--out",
            out,
            "--nb-frames",
            "4",
            "--mode",
            "sample",
        ]
    )
    from ivf_tpu.data.records import RecordReader

    r = RecordReader(out)
    assert len(r) == 2  # empty clip skipped
    for i in range(2):
        meta, frames = r.read(i)
        assert frames.shape == (4, 8, 8, 3)


@pytest.mark.slow
def test_cli_export_checkpoint_loads_in_reference(
    e2e_cfg, e2e_trained, tmp_path, reference_pt_path
):
    """cli export-checkpoint writes a reference-layout .pth.tar from the
    trained run's best checkpoint; the reference CLSTM_4 module loads it
    with strict=True (the two-way migration surface, from the CLI)."""
    import importlib
    import json as _json

    import torch

    from ivf_tpu.cli import main

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        _json.dumps(
            {
                "model_name": e2e_cfg.model_name,
                "output_dir": e2e_cfg.output_dir,
                "conv_model": "clstm",
                "num_classes": 2,
                "clip_size": 8,
                "input_spatial_size": 32,
                "clstm_hidden": 4,
                "clstm_layers": 1,
                "conv_stride": 1,
                "batch_norm": True,
                "dropout": 0.0,
            }
        )
    )
    ckpt_dir = os.path.join(e2e_cfg.output_dir, e2e_cfg.model_name)
    out = str(tmp_path / "exported.pth.tar")
    main(
        [
            "export-checkpoint",
            "--config",
            str(cfg_path),
            "--checkpoint",
            ckpt_dir,
            "--out",
            out,
        ]
    )
    payload = torch.load(out, weights_only=False)
    assert payload["arch"] == "clstm"

    clstm_mod = importlib.import_module("models.CLSTM_4")
    ref = clstm_mod.Model(
        num_classes=2,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=(5, 5),
        pool_kernel_size=(2, 2),
        step=8,
        image_size=(32, 32),
        conv_stride=1,
        effective_step=[3, 7],
        batch_normalization=True,
        dropout=0,
    )
    ref.load_state_dict(payload["state_dict"], strict=True)


def test_make_records_cohesive_crop_diversity(tmp_path):
    """sample_cohesive_crop must share ONE rng across clips (code-review
    regression: a fresh RandomState(0) per clip gave every same-length clip
    the identical 'random' crop window)."""
    from PIL import Image

    root = tmp_path / "frames" / "0"
    n_clips, n_frames = 8, 40
    for k in range(n_clips):
        d = root / f"clip_{k}"
        d.mkdir(parents=True)
        for i in range(1, n_frames + 1):
            # constant-value frames encode their index (JPEG-exact at q95)
            Image.fromarray(
                np.full((8, 8, 3), i * 6, dtype=np.uint8)
            ).save(str(d / f"frame{i:02d}.jpg"), "JPEG", quality=95)

    from ivf_tpu.cli import main

    out = str(tmp_path / "crops.ivfrecords")
    main(
        [
            "make-records",
            "--frames-root",
            str(tmp_path / "frames"),
            "--out",
            out,
            "--nb-frames",
            "4",
            "--mode",
            "sample_cohesive_crop",
        ]
    )
    from ivf_tpu.data.records import RecordReader

    r = RecordReader(out)
    crop_starts = set()
    for i in range(len(r)):
        _, frames = r.read(i)
        crop_starts.add(int(round(float(frames[0].mean()) / 6)))
    r.close()
    # 8 clips, 37 possible windows: identical starts across ALL clips means
    # the rng is being re-seeded per clip
    assert len(crop_starts) > 1, crop_starts


@pytest.mark.slow
def test_find_masks_kth_filter_no_matches(e2e_cfg, e2e_trained):
    """kth_clips_filter with no matching tags: clean empty results, pickles
    still written."""
    state = e2e_trained[0]
    e2e_cfg.mask.kth_clips_filter = True
    try:
        tm, gc = find_masks(
            e2e_cfg, state.variables(), max_batches=1, save_viz=False
        )
    finally:
        e2e_cfg.mask.kth_clips_filter = False
    assert tm == [] and gc == []


from ivf_tpu.data.synthetic import SyntheticClips as _SyntheticClipDataset  # noqa: E402


def test_find_masks_compacts_filtered_batches(tmp_path):
    """Class-of-interest filtering keeps ~1/174 of clips in the reference
    workload (FindMasksComparison_I3D_smth.py:168-174). Kept clips must be
    compacted ACROSS loader batches into full search batches — not padded
    per loader batch — so the 300-step search never burns FLOPs on padding
    (round-3 occupancy fix)."""
    import jax
    import jax.numpy as jnp

    from ivf_tpu.api import build_model

    cfg = Config.from_dict(
        {
            "model_name": "compact_fm",
            "output_dir": str(tmp_path / "out"),
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": 4,
            "clip_size": 8,
            "input_spatial_size": 32,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "dropout": 0.0,
            "num_workers": 1,
        }
    )
    cfg.model.effective_steps = (3, 7)
    cfg.mask.opt_iter = 2
    cfg.mask.class_oi = 0  # alternating labels -> 2 kept per loader batch

    model = build_model(cfg, softmax_override=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    stats = {}
    tm, _gc = find_masks(
        cfg,
        variables,
        dataset=_SyntheticClipDataset(8, t=8, hw=32, num_classes=2, lazy=False),
        save_viz=False,
        do_gradcam=False,
        stats=stats,
    )
    # 8 clips, filter keeps the 4 even-indexed ones -> exactly ONE full
    # search launch with zero padding (per-loader-batch padding would have
    # launched twice at 50% occupancy)
    assert len(tm) == 4
    assert {r["video_id"] for r in tm} == {f"clip{i}" for i in (0, 2, 4, 6)}
    assert stats["search_launches"] == 1
    assert stats["searched_rows"] == 4
    assert stats["padded_rows"] == 0
    assert all(r["true_class"] == 0 for r in tm)


def test_find_masks_final_flush_handles_remainder(tmp_path):
    """The tail that doesn't fill a batch still runs (padded final flush) —
    and drop_last no longer silently discards it."""
    import jax
    import jax.numpy as jnp

    from ivf_tpu.api import build_model

    cfg = Config.from_dict(
        {
            "model_name": "tail_fm",
            "output_dir": str(tmp_path / "out"),
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": 4,
            "clip_size": 8,
            "input_spatial_size": 32,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "dropout": 0.0,
            "num_workers": 1,
        }
    )
    cfg.model.effective_steps = (3, 7)
    cfg.mask.opt_iter = 2

    model = build_model(cfg, softmax_override=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    stats = {}
    tm, _gc = find_masks(
        cfg,
        variables,
        dataset=_SyntheticClipDataset(6, t=8, hw=32, num_classes=2, lazy=False),  # 4 + a 2-clip tail
        save_viz=False,
        do_gradcam=False,
        stats=stats,
    )
    assert len(tm) == 6
    assert stats["search_launches"] == 2
    assert stats["searched_rows"] == 6
    assert stats["padded_rows"] == 2  # only the final flush pads


def _tiny_clstm_cfg(tmp_path, name, **mask_overrides):
    import jax
    import jax.numpy as jnp

    from ivf_tpu.api import build_model

    cfg = Config.from_dict(
        {
            "model_name": name,
            "output_dir": str(tmp_path / name),
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": 4,
            "clip_size": 8,
            "input_spatial_size": 32,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "dropout": 0.0,
            "num_workers": 1,
        }
    )
    cfg.model.effective_steps = (3, 7)
    for k, v in mask_overrides.items():
        setattr(cfg.mask, k, v)
    model = build_model(cfg, softmax_override=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    return cfg, variables


def test_find_masks_early_stop_skips_converged_segments(tmp_path):
    """Under early_stop, once every clip in a batch has converged the
    remaining chunked segments are mathematical no-ops (the step fn freezes
    inactive rows' logits and Adam state) — the driver stops launching
    them. The exact-parity default (early_stop=False) still launches every
    segment. (Beyond-reference: the reference's own early stop is dead
    code; interpret/mask_opt.py docstring.)"""
    ds = _SyntheticClipDataset(4, t=8, hw=32, num_classes=2, lazy=False)

    # control: all ceil(6/2)=3 segments launch
    cfg, variables = _tiny_clstm_cfg(
        tmp_path, "es_ctl", opt_iter=6, chunk_steps=2
    )
    stats = {}
    tm, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False,
        stats=stats,
    )
    assert len(tm) == 4
    assert stats["segments_launched"] == 3

    # early_stop with a huge eta: every clip converges on its first step
    # (|999999 - loss| < eta), so segments 2 and 3 never launch
    cfg2, variables2 = _tiny_clstm_cfg(
        tmp_path, "es_on", opt_iter=6, chunk_steps=2,
        early_stop=True, eta=1e9,
    )
    stats2 = {}
    # a loose eta also pins the brittleness warning (measured: eta>=1e-3
    # fires the one-shot criterion on the flat first step — PERF.md r4)
    with pytest.warns(UserWarning, match="early_stop with eta"):
        tm2, _ = find_masks(
            cfg2, variables2, dataset=ds, save_viz=False, do_gradcam=False,
            stats=stats2,
        )
    assert len(tm2) == 4
    assert stats2["segments_launched"] == 1
    assert stats2["search_launches"] == 1
    # the per-clip convergence histogram raw data: the control ran every
    # step; the early-stop rows froze on their first step (|999999-loss| <
    # eta fires before any update applies, so n_run stays 0)
    assert stats["n_steps_run"] == [6] * 4
    assert stats2["n_steps_run"] == [0] * 4


def test_find_masks_classscore_txt_without_gradcam(tmp_path):
    """ClassScore{Freeze,Reverse}case txt files are written whenever the
    mask search runs — the reference emits them inside the mask block
    regardless of doGradCam (FindMasksComparison_I3D_smth.py:229-239) — and
    the per-clip dir name carries the reference's _gs/_cs score suffixes
    (ibid:222-225; the reference int-casts the guess score — a defect — we
    format the real float)."""
    import re

    ds = _SyntheticClipDataset(4, t=8, hw=32, num_classes=2, lazy=False)
    cfg, variables = _tiny_clstm_cfg(tmp_path, "txt_only", opt_iter=2)
    tm, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=True, do_gradcam=False
    )
    assert len(tm) == 4
    root = os.path.join(cfg.output_dir, cfg.model_name, "cam_saved_images")
    txts = {}
    for dirpath, _dirs, files in os.walk(root):
        # no images on a txt-only run (do_gradcam=False, non-KTH)
        assert not any(
            f.endswith((".jpg", ".png", ".gif")) for f in files
        ), files
        for f in files:
            m = re.match(r"ClassScore(Freeze|Reverse)case(.+)\.txt$", f)
            if m:
                with open(os.path.join(dirpath, f)) as fh:
                    txts[(m.group(1), m.group(2))] = (
                        float(fh.read()),
                        dirpath,
                    )
    assert len(txts) == 8  # Freeze + Reverse per clip
    for r in tm:
        vid = str(r["video_id"])
        fr, dirpath = txts[("Freeze", vid)]
        rv, _ = txts[("Reverse", vid)]
        assert fr == pytest.approx(r["freeze_score"], rel=1e-6)
        assert rv == pytest.approx(r["reverse_score"], rel=1e-6)
        # .../{label}/{id}g_{pred}_gs{:5.4f}_cs{:5.4f}/combined
        assert os.path.basename(dirpath) == "combined"
        clip_dir = os.path.basename(os.path.dirname(dirpath))
        assert re.fullmatch(
            re.escape(vid) + r"g_\d+_gs\d+\.\d{4}_cs\d+\.\d{4}", clip_dir
        ), clip_dir
        assert (
            f"_gs{r['original_score_guess']:5.4f}"
            f"_cs{r['original_score_true']:5.4f}" in clip_dir
        )


def test_find_masks_async_viz_matches_inline(tmp_path):
    """The background viz writer (MaskConfig.async_viz, default on) must
    produce a byte-identical artifact tree to the inline path — same PNGs,
    GIFs, and per-clip score txt files, just overlapped with the next
    batch's device search."""
    ds = _SyntheticClipDataset(4, t=8, hw=32, num_classes=2, lazy=False)
    trees = {}
    for flag in (True, False):
        name = f"aviz_{int(flag)}"
        cfg, variables = _tiny_clstm_cfg(
            tmp_path, name, opt_iter=2, async_viz=flag
        )
        find_masks(cfg, variables, dataset=ds, save_viz=True, do_gradcam=True)
        root = os.path.join(cfg.output_dir, cfg.model_name, "cam_saved_images")
        tree = {}
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    tree[os.path.relpath(p, root)] = fh.read()
        trees[flag] = tree
    assert trees[True], "async run wrote no viz artifacts"
    assert sorted(trees[True]) == sorted(trees[False])
    for rel, blob in trees[True].items():
        assert blob == trees[False][rel], f"artifact differs: {rel}"


def test_async_writer_propagates_worker_errors():
    """A failing viz job must surface to the caller (on a later submit or
    at close), never silently drop artifacts."""
    from ivf_tpu.api import _AsyncWriter

    w = _AsyncWriter(enabled=True, max_pending=1)

    def boom():
        raise RuntimeError("viz failed")

    w.submit(boom)
    with pytest.raises(RuntimeError, match="viz failed"):
        w.close()
    # error path: close(raise_errors=False) swallows but still drains
    w2 = _AsyncWriter(enabled=True, max_pending=1)
    w2.submit(boom)
    w2.close(raise_errors=False)


@pytest.mark.slow
def test_e2e_find_masks_data_parallel_matches_single(e2e_cfg, e2e_trained):
    """find_masks over a 4-device data mesh returns the same masks/scores
    as the single-device run (the sharded headline workload end-to-end
    through the public api, not just dryrun_multichip)."""
    from ivf_tpu.parallel import get_mesh

    state = e2e_trained[0]
    old_iter = e2e_cfg.mask.opt_iter
    e2e_cfg.mask.opt_iter = 4
    try:
        tm_single, _ = find_masks(
            e2e_cfg, state.variables(), max_batches=1, save_viz=False
        )
        # commit variables to a single device first — exactly what a
        # checkpoint restore produces; find_masks replicates them over the
        # mesh itself
        import jax

        committed = jax.device_put(state.variables(), jax.devices()[0])
        tm_mesh, _ = find_masks(
            e2e_cfg,
            committed,
            max_batches=1,
            save_viz=False,
            mesh=get_mesh(4),
        )
    finally:
        e2e_cfg.mask.opt_iter = old_iter
    assert len(tm_single) == len(tm_mesh) > 0
    by_id = {r["video_id"]: r for r in tm_mesh}
    for r in tm_single:
        m = by_id[r["video_id"]]
        np.testing.assert_allclose(
            m["time_mask"], r["time_mask"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            m["freeze_score"], r["freeze_score"], rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_e2e_cli_train_profile_and_anomaly(tmp_path):
    """--profile writes a TensorBoard-loadable jax.profiler trace;
    --detect-anomaly toggles the NaN sanitizer for the run (SURVEY.md §5
    aux subsystems, reachable from the CLI)."""
    import json as _json

    from ivf_tpu.cli import main as cli_main

    _make_frame_tree(tmp_path / "data", n_classes=2, clips_per_class=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        _json.dumps(
            {
                "model_name": "cli_prof",
                "output_dir": str(tmp_path / "out"),
                "data_folder": str(tmp_path / "data"),
                "conv_model": "clstm",
                "num_classes": 2,
                "batch_size": 4,
                "clip_size": 8,
                "input_spatial_size": 32,
                "clstm_hidden": 4,
                "clstm_layers": 1,
                "conv_stride": 1,
                "dropout": 0.0,
                "num_workers": 2,
                "num_epochs": 1,
            }
        )
    )
    prof_dir = str(tmp_path / "trace")
    cli_main(
        [
            "train", "-c", str(cfg_path), "--test_run",
            "--profile", prof_dir, "--detect-anomaly",
        ]
    )
    trace_files = []
    for dirpath, _dirs, files in os.walk(prof_dir):
        trace_files += [f for f in files if f.endswith((".pb", ".json.gz", ".trace.json.gz", ".xplane.pb"))]
    assert trace_files, f"no profiler artifacts under {prof_dir}"
    # the sanitizer must have been restored after the run
    import jax

    assert not jax.config.jax_debug_nans


@pytest.mark.slow
def test_e2e_cli_train_data_parallel(tmp_path):
    """`train --test_run -dp 8` shards batches over the 8-device virtual
    mesh from the CLI flag (round-2 addition)."""
    import json as _json

    from ivf_tpu.cli import main as cli_main

    _make_frame_tree(tmp_path / "data", n_classes=2, clips_per_class=4)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(
        _json.dumps(
            {
                "model_name": "cli_dp",
                "output_dir": str(tmp_path / "out"),
                "data_folder": str(tmp_path / "data"),
                "conv_model": "clstm",
                "num_classes": 2,
                "batch_size": 8,
                "clip_size": 8,
                "input_spatial_size": 32,
                "clstm_hidden": 4,
                "clstm_layers": 1,
                "conv_stride": 1,
                "dropout": 0.0,
                "num_workers": 2,
                "num_epochs": 1,
            }
        )
    )
    cli_main(["train", "-c", str(cfg_path), "--test_run", "-dp", "8"])
    run_dir = os.path.join(str(tmp_path / "out"), "cli_dp")
    assert os.path.isdir(run_dir)


def test_find_masks_bf16_auto_upgrades_pool_impl(tmp_path):
    """find_masks under compute_dtype=bfloat16 silently upgrades the
    default pool_impl to 'argmax' (the measured +9% index-plane pool VJP,
    PERF.md round 3) — copy-on-write: the caller's cfg must be untouched,
    and an explicit non-default pool_impl must be respected."""
    import ivf_tpu.api as api_mod

    cfg = Config.from_dict(
        {
            "model_name": "bf16_pool",
            "output_dir": str(tmp_path / "out"),
            "conv_model": "i3d_smth",
            "num_classes": 2,
            "batch_size": 2,
            "clip_size": 8,
            "input_spatial_size": 32,
        }
    )
    cfg.model.compute_dtype = "bfloat16"

    class _Stop(Exception):
        pass

    seen = {}
    orig = api_mod.build_model

    def spy(c, softmax_override=None):
        seen["pool_impl"] = c.model.pool_impl
        raise _Stop

    api_mod.build_model = spy
    try:
        with pytest.raises(_Stop):
            api_mod.find_masks(cfg, {}, save_viz=False)
        assert seen["pool_impl"] == "argmax"
        assert cfg.model.pool_impl == "reduce_window"  # caller cfg untouched
        # explicit user choice wins over the auto-upgrade
        cfg.model.pool_impl = "shift"
        with pytest.raises(_Stop):
            api_mod.find_masks(cfg, {}, save_viz=False)
        assert seen["pool_impl"] == "shift"
        # f32 runs never upgrade
        cfg.model.pool_impl = "reduce_window"
        cfg.model.compute_dtype = "float32"
        with pytest.raises(_Stop):
            api_mod.find_masks(cfg, {}, save_viz=False)
        assert seen["pool_impl"] == "reduce_window"
    finally:
        api_mod.build_model = orig


def test_train_bf16_auto_upgrades_pool_impl(tmp_path):
    """train() engages the same bf16 argmax-pool upgrade as find_masks
    (the pool VJP is where the train step's pool bytes go too — +4-6%
    train clips/s, PERF.md round 3): copy-on-write, explicit pool_impl
    respected, f32 untouched."""
    import ivf_tpu.api as api_mod

    cfg = Config.from_dict(
        {
            "model_name": "bf16_pool_train",
            "output_dir": str(tmp_path / "out"),
            "conv_model": "i3d_smth",
            "num_classes": 2,
            "batch_size": 2,
            "clip_size": 8,
            "input_spatial_size": 32,
        }
    )
    cfg.model.compute_dtype = "bfloat16"

    class _Stop(Exception):
        pass

    seen = {}
    orig = api_mod.build_model

    def spy(c, softmax_override=None):
        seen["pool_impl"] = c.model.pool_impl
        raise _Stop

    api_mod.build_model = spy
    try:
        with pytest.raises(_Stop):
            api_mod.train(cfg)
        assert seen["pool_impl"] == "argmax"
        assert cfg.model.pool_impl == "reduce_window"  # caller cfg untouched
        cfg.model.pool_impl = "eqbwd"  # explicit user choice wins
        with pytest.raises(_Stop):
            api_mod.train(cfg)
        assert seen["pool_impl"] == "eqbwd"
        cfg.model.pool_impl = "reduce_window"
        cfg.model.compute_dtype = "float32"  # f32 runs never upgrade
        with pytest.raises(_Stop):
            api_mod.train(cfg)
        assert seen["pool_impl"] == "reduce_window"
    finally:
        api_mod.build_model = orig


@pytest.mark.slow
def test_i3d_find_masks_bf16_argmax_pool(tmp_path):
    """The bf16 production path of the mask search with pool_impl='argmax'
    (what the auto-upgrade engages): sized-down I3D, real vmapped search +
    Grad-CAM, finite artifacts — exercises the argmax pool VJP inside the
    actual driver rather than in isolation (ops tests cover numerics)."""
    import jax
    import jax.numpy as jnp

    cfg = Config()
    cfg.output_dir = str(tmp_path / "out")
    cfg.model_name = "i3d_bf16_argmax"
    cfg.model.conv_model = "i3d_smth"
    cfg.model.num_classes = 2
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "bfloat16"
    cfg.data.clip_size = 16
    cfg.data.input_spatial_size = 64
    cfg.data.batch_size = 4
    cfg.mask.opt_iter = 3

    model = build_model(cfg, softmax_override=True)
    # the auto-upgrade path: bf16 + default pool_impl -> argmax
    model = model.clone(pool_shape=(2, 2, 2), pool_impl="argmax")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3))
    )

    import ivf_tpu.api as api_mod

    orig = api_mod.build_model
    api_mod.build_model = lambda cfg, softmax_override=None: model
    try:
        tm, gc = api_mod.find_masks(
            cfg,
            variables,
            dataset=_SyntheticClipDataset(
                4, t=16, hw=64, num_classes=2, lazy=False
            ),
            save_viz=False,
        )
    finally:
        api_mod.build_model = orig
    assert len(tm) == 4 and len(gc) == 4
    assert tm[0]["time_mask"].shape == (16,)
    assert np.all((tm[0]["time_mask"] >= 0) & (tm[0]["time_mask"] <= 1))
    assert np.isfinite(gc[0]["GCHeatMap"]).all()
