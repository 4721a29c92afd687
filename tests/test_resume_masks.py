"""Preemption-safe resume of api.find_masks (the emission journal).

The mask search over a full validation split is an hour-scale production
workload (BASELINE.md north star); the reference restarts it from scratch on
any interruption (FindMasksComparison_I3D_smth.py holds every result in RAM
and pickles once at the end — no persistence before that point). ivf_tpu
journals every retired clip to ``results/emission_journal.p`` as an
append-only pickle stream, written AFTER the clip's viz/score artifacts are
durably on disk, so ``find_masks(..., resume=True)`` restores journaled
records, skips those clips entirely (search, Grad-CAM, min_score probes),
and re-runs only what the interrupted run had not finished. Per-clip search
math is batch-composition independent (the refill invariant,
tests/test_refill.py), so a resumed run's per-clip artifacts are bit-exact
vs an uninterrupted one; only pickle list order differs.
"""

import os
import pickle
import tempfile

import numpy as np
import pytest

from ivf_tpu.api import build_model, find_masks
from ivf_tpu.config import Config
from ivf_tpu.data.synthetic import SyntheticClips


def _tiny_cfg(name, out_dir=None, **mask_overrides):
    import jax
    import jax.numpy as jnp

    cfg = Config.from_dict(
        {
            "model_name": name,
            "output_dir": out_dir or tempfile.mkdtemp(),
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
    cfg.mask.opt_iter = 4
    cfg.mask.chunk_steps = 2
    for k, v in mask_overrides.items():
        setattr(cfg.mask, k, v)
    model = build_model(cfg, softmax_override=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 32, 3))
    )
    return cfg, variables


def _by_id(records):
    return {r["video_id"]: r for r in records}


def _assert_same_records(a, b):
    assert set(a) == set(b), (sorted(a), sorted(b))
    for vid in a:
        for key in a[vid]:
            x, y = a[vid][key], b[vid][key]
            if isinstance(x, np.ndarray):
                assert np.array_equal(x, y), (vid, key)
            else:
                assert x == y, (vid, key, x, y)


def _journal_path(cfg):
    return os.path.join(
        cfg.output_dir, cfg.model_name, "results", "emission_journal.p"
    )


@pytest.mark.slow
def test_resume_completes_partial_run():
    """Interrupt after the first flush (max_batches=1), resume: only the
    unfinished clips are searched, and the final pickles match an
    uninterrupted baseline bit-exactly per clip."""
    ds = SyntheticClips(8, t=8, hw=32, num_classes=2, lazy=False)
    cfg, variables = _tiny_cfg("resume_base")
    tm0, gc0 = find_masks(
        cfg, variables, dataset=ds, save_viz=True, do_gradcam=True
    )
    assert len(tm0) == 8

    cfg2, variables2 = _tiny_cfg("resume_part")
    # partial run: one loader batch = 4 of the 8 clips journaled
    find_masks(
        cfg2, variables2, dataset=ds, save_viz=True, do_gradcam=True,
        max_batches=1,
    )
    assert os.path.exists(_journal_path(cfg2))
    stats = {}
    tm1, gc1 = find_masks(
        cfg2, variables2, dataset=ds, save_viz=True, do_gradcam=True,
        resume=True, stats=stats,
    )
    assert stats["resumed_clips"] == 4, stats
    assert stats["searched_rows"] == 4, stats  # only the missing half ran
    _assert_same_records(_by_id(tm0), _by_id(tm1))
    for vid, r in _by_id(gc0).items():
        assert np.array_equal(r["GCHeatMap"], _by_id(gc1)[vid]["GCHeatMap"])

    # the journal now covers everything: one more resume is a pure no-op
    stats2 = {}
    tm2, _ = find_masks(
        cfg2, variables2, dataset=ds, save_viz=True, do_gradcam=True,
        resume=True, stats=stats2,
    )
    assert stats2["searched_rows"] == 0 and stats2["score_launches"] == 0
    _assert_same_records(_by_id(tm0), _by_id(tm2))


@pytest.mark.slow
def test_resume_truncated_journal_tail():
    """A crash mid-append leaves a torn trailing record: restore keeps the
    intact prefix, re-runs the rest, and the union is complete."""
    ds = SyntheticClips(8, t=8, hw=32, num_classes=2, lazy=False)
    cfg, variables = _tiny_cfg("resume_trunc")
    tm0, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False
    )
    jp = _journal_path(cfg)
    with open(jp, "rb") as f:
        whole = f.read()
    # tear the last record mid-bytes and append garbage
    with open(jp, "wb") as f:
        f.write(whole[: len(whole) - 7])
        f.write(b"\x80\x04garbage")
    stats = {}
    tm1, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False,
        resume=True, stats=stats,
    )
    assert 0 < stats["resumed_clips"] < 8, stats
    assert stats["searched_rows"] == 8 - stats["resumed_clips"]
    _assert_same_records(_by_id(tm0), _by_id(tm1))


def test_resume_skips_min_score_probes():
    """Clips the min_score probe rejected are journaled as skip markers:
    a resumed run re-probes nothing and re-searches nothing."""
    ds = SyntheticClips(8, t=8, hw=32, num_classes=2, lazy=False)
    cfg, variables = _tiny_cfg("resume_skip", min_score=0.5)
    stats0 = {}
    tm0, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False,
        stats=stats0,
    )
    # softmax over 2 classes: scores straddle 0.5, so some—not all—clips pass
    assert 0 < len(tm0) < 8, len(tm0)
    stats = {}
    tm1, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False,
        resume=True, stats=stats,
    )
    assert stats["score_launches"] == 0 and stats["searched_rows"] == 0
    assert stats["resumed_skipped"] == 8 - len(tm0), stats
    _assert_same_records(_by_id(tm0), _by_id(tm1))


@pytest.mark.slow
def test_fresh_run_clears_stale_journal():
    """Without resume=True a rerun starts clean: the journal is truncated up
    front so it never mixes two runs' records."""
    ds = SyntheticClips(4, t=8, hw=32, num_classes=2, lazy=False)
    cfg, variables = _tiny_cfg("resume_fresh")
    find_masks(cfg, variables, dataset=ds, save_viz=False, do_gradcam=False)
    tm1, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False
    )
    assert len(tm1) == 4
    recs = []
    with open(_journal_path(cfg), "rb") as f:
        while True:
            try:
                recs.append(pickle.load(f))
            except EOFError:
                break
    assert len(recs) == 4, len(recs)  # second run only — no stale mixing


@pytest.mark.slow
def test_resume_random_init_composition_independent():
    """Random mask inits key off a stable hash of the clip id (not the
    flush position), so an interrupted+resumed run reproduces the
    uninterrupted one bit-exactly even under mask_init_type='random'."""
    ds = SyntheticClips(8, t=8, hw=32, num_classes=2, lazy=False)
    cfg, variables = _tiny_cfg("resume_rand0", mask_init_type="random")
    tm0, _ = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False
    )
    cfg2, variables2 = _tiny_cfg("resume_rand1", mask_init_type="random")
    find_masks(
        cfg2, variables2, dataset=ds, save_viz=False, do_gradcam=False,
        max_batches=1,
    )
    tm1, _ = find_masks(
        cfg2, variables2, dataset=ds, save_viz=False, do_gradcam=False,
        resume=True,
    )
    _assert_same_records(_by_id(tm0), _by_id(tm1))


@pytest.mark.slow
def test_resume_config_widening_reruns_incomplete():
    """A journal written without Grad-CAM does not satisfy a resumed run
    that needs it: those clips re-run in full (guard against serving stale
    partial records across config changes)."""
    ds = SyntheticClips(4, t=8, hw=32, num_classes=2, lazy=False)
    cfg, variables = _tiny_cfg("resume_widen")
    find_masks(cfg, variables, dataset=ds, save_viz=False, do_gradcam=False)
    stats = {}
    tm, gc = find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=True,
        resume=True, stats=stats,
    )
    assert stats["resumed_clips"] == 0, stats
    assert stats["searched_rows"] == 4
    assert len(tm) == 4 and len(gc) == 4
