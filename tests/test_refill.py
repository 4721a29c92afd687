"""Convergence-refill (MaskConfig.refill) behavior of api.find_masks.

The refill path retires early-stop-frozen rows at segment boundaries and
re-stages survivors into full continuation batches (api.py::_run_refill_flush)
— the mechanism that converts per-row early stopping into throughput when the
stop-step distribution has a long tail (PERF.md round 4, EARLYSTOP_r04.json
trained_flash). Per-row search math is batch-composition independent, so every
per-clip artifact must be IDENTICAL to the non-refill path; only the pickle's
result order (retirement vs staging order) may differ.
"""

import os
import tempfile
import warnings

import numpy as np
import pytest

from ivf_tpu.api import build_model, find_masks
from ivf_tpu.config import Config
from ivf_tpu.data.synthetic import SyntheticClips


def _tiny_cfg(name, **mask_overrides):
    import jax
    import jax.numpy as jnp

    cfg = Config.from_dict(
        {
            "model_name": name,
            "output_dir": tempfile.mkdtemp(),
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


def _tree_files(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


def test_refill_matches_nonrefill_bitexact():
    """Refill on vs off: identical per-clip masks, scores, CAMs, and viz
    artifact tree; refill actually re-stages rows (the stats prove the
    mechanism engaged, not a vacuous pass) and never launches MORE segments
    than the non-refill schedule."""
    ds = SyntheticClips(8, t=8, hw=32, num_classes=2, lazy=False)
    # eta=3e-3 measured on this tiny model: stop steps [1,1,1,1,1,1,2,4] —
    # heterogeneous across AND within flushes, so boundaries mix retired and
    # surviving rows (the requeue case) in both round-1 flushes
    runs = {}
    for refill in (False, True):
        cfg, variables = _tiny_cfg(
            f"rf_{refill}", opt_iter=8, chunk_steps=2,
            early_stop=True, eta=3e-3, refill=refill,
        )
        stats = {}
        with pytest.warns(UserWarning, match="early_stop with eta"):
            tm, gc = find_masks(
                cfg, variables, dataset=ds, save_viz=True, do_gradcam=True,
                stats=stats,
            )
        runs[refill] = (
            {r["video_id"]: r for r in tm},
            {r["video_id"]: r for r in gc},
            stats,
            _tree_files(os.path.join(cfg.output_dir, cfg.model_name)),
        )
    tm0, gc0, st0, tree0 = runs[False]
    tm1, gc1, st1, tree1 = runs[True]

    # the mechanism engaged: survivors re-staged into continuation flushes
    assert st1["refill_requeued_rows"] > 0, st1
    assert st1["refill_flushes"] > 0, st1
    assert st0["refill_requeued_rows"] == 0 and st0["refill_flushes"] == 0
    # refill never runs more segment programs than the batch-quantized path
    assert st1["segments_launched"] <= st0["segments_launched"], (st0, st1)
    # per-clip convergence histogram is mode-independent
    assert sorted(st0["n_steps_run"]) == sorted(st1["n_steps_run"])
    assert len(set(st0["n_steps_run"])) > 1, (
        "stop steps degenerated to homogeneous — the test no longer "
        "exercises mixed boundaries; re-tune eta"
    )

    # every per-clip record is bit-exact
    assert set(tm0) == set(tm1) and set(gc0) == set(gc1)
    for vid in tm0:
        for key in tm0[vid]:
            a, b = tm0[vid][key], tm1[vid][key]
            if isinstance(a, np.ndarray):
                assert np.array_equal(a, b), (vid, key)
            else:
                assert a == b, (vid, key, a, b)
        assert np.array_equal(gc0[vid]["GCHeatMap"], gc1[vid]["GCHeatMap"])

    # the on-disk viz tree (per-clip dirs, ClassScore txts, PNGs) is
    # byte-identical minus the pickles, whose list ORDER is retirement
    # order, and search_stats.json, which records the run ANATOMY
    # (segments launched, refill flushes) that refill changes by design
    skip = lambda p: p.endswith(".p") or p.endswith("search_stats.json")
    t0 = {p: b for p, b in tree0.items() if not skip(p)}
    t1 = {p: b for p, b in tree1.items() if not skip(p)}
    assert set(t0) == set(t1)
    for p in t0:
        assert t0[p] == t1[p], p


def test_refill_gating():
    """Refill auto-gates: OFF without early_stop (exact-parity default) and
    OFF on the monolithic path even when requested."""
    ds = SyntheticClips(4, t=8, hw=32, num_classes=2, lazy=False)

    # early_stop=False -> no refill machinery engages even with refill=True
    cfg, variables = _tiny_cfg(
        "rf_gate1", opt_iter=4, chunk_steps=2, refill=True
    )
    stats = {}
    find_masks(
        cfg, variables, dataset=ds, save_viz=False, do_gradcam=False,
        stats=stats,
    )
    assert stats["refill_flushes"] == 0
    assert stats["refill_requeued_rows"] == 0
    assert stats["segments_launched"] == 2

    # monolithic path (chunk >= opt_iter): refill is a chunked-path concept
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        cfg2, variables2 = _tiny_cfg(
            "rf_gate2", opt_iter=4, chunk_steps=4, early_stop=True,
            eta=3e-3, refill=True,
        )
        stats2 = {}
        find_masks(
            cfg2, variables2, dataset=ds, save_viz=False, do_gradcam=False,
            stats=stats2,
        )
    assert stats2["refill_flushes"] == 0
    assert stats2["refill_requeued_rows"] == 0
