"""Aux subsystems: results persistence, guided backprop, KTH subject shards,
profiling switches, inspect CLI."""

import csv
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_save_results_and_submission(tmp_path):
    from ivf_tpu.utils.results import get_submission, save_results

    logits = np.random.RandomState(0).randn(4, 7)
    ids = ["a", "b", "c", "d"]
    p1 = save_results(logits, None, [0, 1, 2, 3], ids, {0: "x"}, str(tmp_path), "m")
    assert os.path.exists(p1)
    p2 = get_submission(logits, ids, str(tmp_path), "m")
    rows = open(p2).read().strip().split("\n")
    assert len(rows) == 4
    first = rows[0].split(";")
    assert first[0] == "a" and len(first) == 6
    assert int(first[1]) == int(np.argmax(logits[0]))


def test_experimental_run_cleaner(tmp_path):
    from ivf_tpu.utils.results import ExperimentalRunCleaner

    d = tmp_path / "empty_run"
    d.mkdir()
    cleaner = ExperimentalRunCleaner(str(d))
    with pytest.raises(SystemExit):
        cleaner(None, None)
    assert not d.exists()


def test_guided_relu_vjp():
    from ivf_tpu.interpret.guided_backprop import guided_relu

    x = jnp.asarray([-1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(guided_relu(x)), [0, 2, 3])
    # backward: pass only where input>0 AND grad>0
    g = jax.grad(lambda x: jnp.sum(guided_relu(x) * jnp.asarray([1.0, -1.0, 1.0])))(x)
    np.testing.assert_allclose(np.asarray(g), [0, 0, 1])


@pytest.mark.slow
def test_guided_backprop_i3d_smoke():
    from ivf_tpu.interpret.guided_backprop import guided_backprop_i3d
    from ivf_tpu.models.i3d import I3D

    kwargs = dict(
        num_classes=3,
        dropout_rate=0.0,
        pool_shape=(2, 2, 2),
        final_endpoint="Logits",
    )
    model = I3D(**kwargs)
    clip = jax.random.normal(jax.random.PRNGKey(0), (16, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), clip[None])
    sal = guided_backprop_i3d(variables, clip, 1, **kwargs)
    assert sal.shape == clip.shape
    assert np.isfinite(np.asarray(sal)).all()
    # guided-relu forward identical to plain forward
    out_plain = model.apply(variables, clip[None])
    guided = I3D(guided_relu=True, **kwargs)
    out_guided = guided.apply(variables, clip[None])
    # guided path disables the fused-1x1 branch (custom-vjp act), so tiny
    # float-reassociation drift vs the fused plain path is expected
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_guided), rtol=1e-4, atol=1e-5
    )


def _make_kth_frames(root, subjects=(1, 2), frames_per_clip=12):
    from PIL import Image

    rng = np.random.RandomState(0)
    rows = []
    for s in subjects:
        clip = f"person{s:02d}_boxing_d1"
        d = os.path.join(str(root), str(s), clip)
        os.makedirs(d)
        for i in range(1, frames_per_clip + 1):
            Image.fromarray(
                rng.randint(0, 255, (16, 20, 3), dtype=np.uint8)
            ).save(os.path.join(d, f"frame{i:02d}.jpg"))
        rows.append(
            {
                "subject": s,
                "clip_name": clip,
                "label": s % 6,
                "1_start": 1,
                "1_end": 6,
                "2_start": 7,
                "2_end": 12,
                "3_start": "",
                "3_end": "",
                "4_start": "",
                "4_end": "",
            }
        )
    return rows


def test_kth_subject_records_and_split(tmp_path):
    from ivf_tpu.data.kth import subject_split_paths, write_kth_subject_records
    from ivf_tpu.data.records import RecordReader

    rows = _make_kth_frames(tmp_path / "frames")
    csv_path = tmp_path / "labels.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    out = tmp_path / "records"
    paths = write_kth_subject_records(
        str(csv_path),
        str(tmp_path / "frames"),
        str(out),
        mode="sample",
        nb_frames=4,
        subjects=(1, 2),
    )
    assert len(paths) == 2
    r = RecordReader(paths[0])
    assert len(r) == 2  # 2 valid repetitions
    meta, frames = r.read(0)
    assert meta["subject"] == 1 and meta["repetition"] == 1
    assert frames.shape == (4, 16, 20, 3)

    clips_csv = tmp_path / "subjects_clips.csv"
    with open(clips_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["subject", "nb_clips"])
        w.writeheader()
        for s in range(1, 26):
            w.writerow({"subject": s, "nb_clips": 10 + s})
    tr, va, n_tr, n_va = subject_split_paths(
        str(out), [1], [2], str(clips_csv)
    )
    assert tr == [str(out / "kth_subject_1.ivfrecords")]
    assert n_tr == 11 and n_va == 12

    # training from per-subject records end-to-end via RecordDataset
    from ivf_tpu.data.loaders import RecordDataset

    ds = RecordDataset(tr + va, clip_size=4)
    assert len(ds) == 4


def test_create_image_arrays_resize_to(tmp_path):
    """resize_to must resize ALL THREE triptych panels — the reference
    forgets the perturbed one (visualisation.py:96-130) and crashes the
    concatenate; we fix the defect per the SURVEY §2.4 policy."""
    from ivf_tpu.viz.render import create_image_arrays

    rng = np.random.RandomState(0)
    t, h, w = 3, 24, 24
    clip = rng.randint(0, 255, (t, h, w, 3)).astype(np.uint8)
    cam = rng.rand(t, h, w).astype(np.float32)
    mask = np.asarray([0.9, 0.1, 0.8], np.float32)
    panels = create_image_arrays(
        clip, cam, mask, clip.copy(), str(tmp_path / "viz"), resize_to=(12, 12)
    )
    assert panels.shape == (t, 12, 36, 3)
    assert os.path.exists(str(tmp_path / "viz" / "mygif.gif"))


def test_kth_records_degenerate_repetition(tmp_path):
    """A CSV row whose repetition has end == start must not abort the build
    (code-review regression: the samplers assert 'empty clip'); the single
    frame is repeated instead, like make-records does for 1-frame clips."""
    from ivf_tpu.data.kth import write_kth_subject_records
    from ivf_tpu.data.records import RecordReader

    rows = _make_kth_frames(tmp_path / "frames", subjects=(1,))
    rows[0]["2_start"] = 7
    rows[0]["2_end"] = 7  # degenerate: zero-length repetition
    csv_path = tmp_path / "labels.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    paths = write_kth_subject_records(
        str(csv_path),
        str(tmp_path / "frames"),
        str(tmp_path / "records"),
        mode="sample",
        nb_frames=4,
        subjects=(1,),
    )
    r = RecordReader(paths[0])
    assert len(r) == 2  # both repetitions written
    meta, frames = r.read(1)
    assert meta["repetition"] == 2 and frames.shape == (4, 16, 20, 3)
    # all four frames are the same repeated frame07
    assert np.array_equal(frames[0], frames[1])
    r.close()


def test_profiling_utils(tmp_path):
    from ivf_tpu.utils.profiling import StepTimer, detect_anomaly

    t = StepTimer()
    t.start()
    t.stop(n_clips=8)
    assert t.clips_per_sec > 0
    assert "clips/sec" in t.report()

    with detect_anomaly(True):
        assert jax.config.jax_debug_nans
        with pytest.raises(Exception):
            jax.jit(lambda x: x / x)(jnp.float32(0.0))  # 0/0 -> NaN
    assert not jax.config.jax_debug_nans


def test_inspect_records_cli(tmp_path, capsys):
    from ivf_tpu.cli import main
    from ivf_tpu.data.records import RecordWriter

    path = str(tmp_path / "x.ivfrecords")
    with RecordWriter(path) as w:
        w.write(
            np.zeros((2, 8, 8, 3), np.uint8), label=3, video_id="vid9"
        )
    main(["inspect-records", path])
    out = capsys.readouterr().out
    assert "1 records" in out and "vid9" in out and "(2, 8, 8, 3)" in out

    # reference-produced .tfrecords inspect through the same command
    # (extension dispatch, like RecordDataset)
    from ivf_tpu.data.records import encode_jpeg
    from ivf_tpu.data.tfrecords import build_example, write_tfrecord

    tf_path = str(tmp_path / "x.tfrecords")
    frames = [encode_jpeg(np.zeros((8, 8, 3), np.uint8)) for _ in range(2)]
    write_tfrecord(
        tf_path,
        [build_example("tfvid7", 3, frames, height=8, width=8)],
    )
    main(["inspect-records", tf_path])
    out = capsys.readouterr().out
    assert "1 records" in out and "tfvid7" in out and "(2, 8, 8, 3)" in out


def test_kth_clips_of_interest():
    from ivf_tpu.data.kth_clips_of_interest import (
        CLIPS_OF_INTEREST_ORIGINAL,
        clips_of_interest,
        tag_matches,
    )

    assert len(CLIPS_OF_INTEREST_ORIGINAL) == 24
    assert ["person17", "boxing", "d1", "_1"] in CLIPS_OF_INTEREST_ORIGINAL
    assert ["person24", "jogging", "d1", "_1"] in CLIPS_OF_INTEREST_ORIGINAL
    assert tag_matches("person17_boxing_d1_1", "original")
    assert not tag_matches("person17_boxing_d3_1", "original")
    assert tag_matches("person07_boxing_d1_1", "other")
    assert len(clips_of_interest("other")) == 24


def test_on_axon_tunnel_detection(monkeypatch):
    """Regression: the axon tunnel's PJRT platform name is plain "tpu", so
    jax.default_backend() can NOT detect it — find_masks' auto segment
    selection must key on the platform list instead. A broken detector
    silently reverts to the monolithic ~85 s search program, which the
    tunnel kills mid-execution (round-3 bench_e2e crash series)."""
    import types

    import ivf_tpu.utils.compile as compile_mod
    from ivf_tpu.utils.compile import on_axon_tunnel

    # tests force the cpu platform in-process (conftest) -> not the tunnel
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert on_axon_tunnel() is False

    def _with_platforms(value):
        # jax.config.jax_platforms is a read-only property and updating it
        # re-resolves backends; stub the module's jax reference instead
        stub = types.SimpleNamespace(
            config=types.SimpleNamespace(jax_platforms=value)
        )
        monkeypatch.setattr(compile_mod, "jax", stub)
        return on_axon_tunnel()

    assert _with_platforms("axon,cpu") is True
    assert _with_platforms("tpu") is False
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert _with_platforms(None) is True
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    assert _with_platforms(None) is False


def test_hot_compiler_options_gating(monkeypatch):
    """hot_jit's scoped-VMEM option measured +1.8% on the reduce_window
    mask-search program but -1.2% on the argmax one (PERF.md round 3), so
    it must be (a) TPU-only, (b) droppable via vmem_opt=False — the path
    find_masks takes when the argmax upgrade engages — and (c) killable
    via IVF_HOT_JIT=0."""
    import types

    import ivf_tpu.utils.compile as compile_mod
    from ivf_tpu.utils.compile import TPU_HOT_COMPILER_OPTS, hot_compiler_options

    monkeypatch.delenv("IVF_HOT_JIT", raising=False)
    # tests run on the cpu backend -> no options
    assert hot_compiler_options() == {}

    stub = types.SimpleNamespace(default_backend=lambda: "tpu")
    monkeypatch.setattr(compile_mod, "jax", stub)
    assert hot_compiler_options() == TPU_HOT_COMPILER_OPTS
    assert hot_compiler_options(vmem_opt=False) == {}
    monkeypatch.setenv("IVF_HOT_JIT", "0")
    assert hot_compiler_options() == {}
