"""Round-2 surface tests: shipped config presets, TF-family cell fidelity
knobs, the scan recurrence, schedule selection, and driver-parity details
(min-score skip, unique fallback ids, L2 kernel penalty)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ivf_tpu.api import build_model
from ivf_tpu.config import Config
from ivf_tpu.models import ConvLSTMClassifier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = [
    "configs/config_i3d_smth.py",
    "configs/config_i3d_kth.py",
    "configs/config_clstm_kth.py",
    "configs/config_clstm_kth_records.py",
]


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_loads_and_builds(preset):
    cfg = Config.load(os.path.join(REPO, preset))
    model = build_model(cfg)
    assert model is not None
    if "i3d_smth" in preset:
        assert cfg.model.num_classes == 174 and cfg.data.clip_size == 16
        assert cfg.mask.opt_iter == 300 and cfg.mask.lam1 == 0.01
    if "kth" in preset:
        assert cfg.model.num_classes == 6 and cfg.data.clip_size == 32
    if preset.endswith("records.py"):
        assert cfg.data.input_mode == "records"
        assert cfg.optim.lr_schedule == "patience_halving"
        assert cfg.model.recurrent_activation == "hard_sigmoid"
        assert cfg.model.block_order == "tf"
        assert cfg.model.kernel_l2 == 0.01
        assert cfg.mask.min_score == 0.1
        assert cfg.model.conv_kernel_size == 3
        assert cfg.model.conv_kernel_size_2 == 5
        assert cfg.model.padding_clstm == "valid"
        assert cfg.data.train_subjects == tuple(range(1, 17))


def test_tf_family_model_knobs():
    """build_model wires Keras fidelity knobs for block_order='tf'."""
    cfg = Config.load(os.path.join(REPO, "configs/config_clstm_kth_records.py"))
    m = build_model(cfg)
    assert m.recurrent_activation == "hard_sigmoid"
    assert m.unit_forget_bias is True
    assert m.x_padding == "valid"
    assert m.shared_bn is False  # per-block BN for the TF family
    assert m.conv_kernel_size == (3, 5)


@pytest.mark.slow
def test_clstm_preset_forward():
    """The PRESET-built model itself runs forward at the preset's configured
    clip shape (a previous version of this test silently swapped in a
    hand-constructed model, leaving the preset forward untested)."""
    cfg = Config.load(os.path.join(REPO, "configs/config_clstm_kth.py"))
    m = build_model(cfg)
    h, w = cfg.data.input_spatial_size
    x = jnp.zeros((1, cfg.data.clip_size, h, w, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, cfg.model.num_classes)


# ---------------------------------------------------------------------------
# scan recurrence == unrolled recurrence
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ra", ["sigmoid", "hard_sigmoid"])
@pytest.mark.slow
def test_convlstm_scan_matches_unrolled(ra):
    kw = dict(
        num_classes=5,
        nb_lstm_units=4,
        lstm_layers=2,
        conv_kernel_size=3,
        effective_steps=(3, 7),
        batch_norm=True,
        dropout_rate=0.0,
        recurrent_activation=ra,
    )
    m_scan = ConvLSTMClassifier(use_scan=True, **kw)
    m_unr = ConvLSTMClassifier(use_scan=False, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 24, 24, 3))
    v = m_scan.init(jax.random.PRNGKey(1), x)
    out_s = m_scan.apply(v, x, train=False)
    out_u = m_unr.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_u), rtol=1e-5, atol=1e-6
    )
    # train mode: identical logits AND identical running-stat updates
    rngs = {"dropout": jax.random.PRNGKey(2)}
    out_s2, upd_s = m_scan.apply(
        v, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    out_u2, upd_u = m_unr.apply(
        v, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    np.testing.assert_allclose(
        np.asarray(out_s2), np.asarray(out_u2), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(upd_s), jax.tree_util.tree_leaves(upd_u)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


@pytest.mark.slow
def test_convlstm_scan_grad_and_remat():
    kw = dict(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(5,),
        batch_norm=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16, 16, 3))
    m = ConvLSTMClassifier(use_scan=True, **kw)
    m_r = ConvLSTMClassifier(use_scan=True, remat=True, **kw)
    v = m.init(jax.random.PRNGKey(1), x)
    loss = lambda mdl: lambda p: jnp.sum(mdl.apply({"params": p}, x) ** 2)
    g = jax.grad(loss(m))(v["params"])
    g_r = jax.grad(loss(m_r))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_kernel_l2_penalty():
    from ivf_tpu.train.loop import _kernel_l2_penalty

    params = {
        "clstm": {
            "cells_0": {
                "wx": jnp.ones((2, 2, 3, 8)),
                "wh": jnp.ones((2, 2, 2, 8)),
                "bx": jnp.ones((8,)),
            }
        },
        "end_fc": {"kernel": jnp.ones((4, 2))},
    }
    # only wx enters: 2*2*3*8 = 96; coeff 0.01 -> 0.96 (Keras l2: no 1/2)
    np.testing.assert_allclose(
        float(_kernel_l2_penalty(params, 0.01)), 0.96, rtol=1e-6
    )


@pytest.mark.slow
def test_i3d_use_pallas_matches_xla():
    """use_pallas routes every 1x1x1 conv (branch entries, fused trio,
    b3b, logits head) through the Pallas kernel — identical output
    (interpret mode off-TPU)."""
    from ivf_tpu.models import i3d_smth

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32, 32, 3))
    m_ref = i3d_smth(num_classes=7, dropout_rate=0.0, pool_shape=(1, 1, 1))
    m_pl = i3d_smth(
        num_classes=7, dropout_rate=0.0, pool_shape=(1, 1, 1), use_pallas=True
    )
    v = m_ref.init(jax.random.PRNGKey(1), x)
    ref = m_ref.apply(v, x, train=False)
    out = m_pl.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_config_use_pallas_plumbs_to_models():
    cfg = Config()
    cfg.model.use_pallas = True
    assert build_model(cfg).use_pallas is True
    cfg.model.conv_model = "clstm_kth"
    assert build_model(cfg).use_pallas is True


def test_patience_halving_reference_exact():
    """train_kth.py:294-312: <1e-4 gain counts as no improvement; the
    patience counter resets even when the lr floor blocks halving."""
    from ivf_tpu.train import PatienceHalving

    s = PatienceHalving(lr=0.1, patience=2, lr_end=0.04)
    assert s.step(0.5) == 0.1  # improvement
    assert s.step(0.50005) == 0.1  # gain < 1e-4 -> bad 1
    assert s.step(0.50005) == 0.05  # bad 2 -> halve
    assert s.step(0.50005) == 0.05  # bad 1 (counter reset after halving)
    # 0.05 < 2*lr_end=0.08 -> halving blocked, but counter still resets
    assert s.step(0.50005) == 0.05
    assert s.step(0.50005) == 0.05
    assert s.monitor == "accuracy"


def test_iteration_suffix_and_train_split_flags():
    """--iteration suffixes model_name (utils.py:23, train_clstm_kth.py:37);
    find-masks --train selects the train split (utils.py:43)."""
    import argparse
    import inspect

    from ivf_tpu.api import find_masks
    from ivf_tpu.config import Config, add_cli_overrides, apply_cli_overrides

    parser = argparse.ArgumentParser()
    add_cli_overrides(parser)
    args = parser.parse_args(
        ["-i", "3", "-l1", "0.5", "-fpro", "0", "-rfl", "0", "-etap", "3"]
    )
    cfg = Config()
    base = cfg.model_name
    cfg = apply_cli_overrides(cfg, args)
    assert cfg.model_name == base + "3"
    assert cfg.mask.lam1 == 0.5
    assert cfg.mask.fuse_prologue is False  # int 0 -> bool coercion
    # refill is Optional[bool] (None=auto): the CLI int must coerce to a
    # real bool so `refill is not None` distinguishes forced-off from auto
    assert cfg.mask.refill is False
    assert cfg.mask.eta_patience == 3
    assert Config().mask.refill is None  # untouched default stays auto

    assert inspect.signature(find_masks).parameters["split"].default == "validation"


@pytest.mark.parametrize(
    "name", ["config_i3d_smth.py", "config_i3d_kth.py", "config_clstm_kth.py"]
)
def test_reference_config_files_load_verbatim(name):
    """The REFERENCE's own config modules load unchanged through
    Config.load and build a model (the from_dict verbatim-keys contract)."""
    import os

    from ivf_tpu.api import build_model
    from ivf_tpu.config import Config

    path = os.path.join(
        "/root/reference/video_features_pytorch/configs", name
    )
    if not os.path.exists(path):
        pytest.skip("reference repo not mounted")
    cfg = Config.load(path)
    assert cfg.model.num_classes in (6, 174)
    assert cfg.data.batch_size > 0 and cfg.data.clip_size in (16, 32)
    model = build_model(cfg)
    assert model.num_classes == cfg.model.num_classes


def test_clstm_scan_config_resolution():
    """clstm_scan ('auto'|'scan'|'unrolled') resolves the measured-fastest
    recurrence per clip length (PERF.md round 3): unrolled for every
    reference shape, scan+remat only as the long-T compile-size hatch."""
    from ivf_tpu.api import build_model
    from ivf_tpu.config import Config

    cfg = Config.from_dict({"conv_model": "clstm", "num_classes": 6})
    m = build_model(cfg)  # auto, clip_size=16 -> unrolled
    assert m.use_scan is False and m.remat is False

    cfg.data.clip_size = 128  # auto, long T -> scan (+ remat: plain scan
    assert build_model(cfg).use_scan is True  # grad does not compile)
    assert build_model(cfg).remat is True

    cfg.model.clstm_scan = "scan"
    cfg.data.clip_size = 16
    assert build_model(cfg).use_scan is True

    cfg.model.clstm_scan = "unrolled"
    cfg.data.clip_size = 128
    assert build_model(cfg).use_scan is False
