"""Full-model golden parity: reference torch models vs ivf_tpu Flax models
with weights synced through the checkpoint importer."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ivf_tpu.models import I3D, ConvLSTMClassifier, CNN3D, get_model, i3d_kth
from ivf_tpu.utils.import_torch import (
    convlstm_state_dict_to_variables,
    i3d_state_dict_to_variables,
)


def _to_jax_clip(x_torch):
    # torch (B, C, T, H, W) -> jax (B, T, H, W, C)
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 4, 1))


@pytest.fixture(scope="module")
def i3d_pair(reference_pt_path):
    """Reference KTH-head I3D (torch, eval) + our i3d_kth with synced weights."""
    import importlib

    ref_mod = importlib.import_module("models.I3D_doubled_kth")
    torch.manual_seed(0)
    ref = ref_mod.Model(
        num_classes=6,
        finalTimeLength=2,
        dropout_keep_prob=0.0,
        stride_mod_layers="",
    )
    ref.eval()
    variables = i3d_state_dict_to_variables(ref.state_dict())
    model = i3d_kth(num_classes=6, final_time_length=2, dropout_rate=0.0)
    return ref, model, variables


@pytest.mark.slow
def test_i3d_full_forward_parity(i3d_pair):
    ref, model, variables = i3d_pair
    torch.manual_seed(1)
    # reference KTH head hardcodes a (·,4,5) pool => (H,W) = (120,160)
    x_t = torch.randn(2, 3, 16, 120, 160)
    with torch.no_grad():
        ref_out = ref(x_t).numpy()
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, _to_jax_clip(x_t))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_i3d_softmax_and_endpoint_capture(i3d_pair):
    ref, _, variables = i3d_pair
    model = i3d_kth(
        num_classes=6, final_time_length=2, dropout_rate=0.0, softmax=True
    )
    x = jnp.zeros((1, 16, 120, 160, 3))
    out, interms = model.apply(
        variables, x, mutable=["intermediates"]
    )
    np.testing.assert_allclose(float(jnp.sum(out)), 1.0, rtol=1e-5)
    eps = interms["intermediates"]
    assert "Mixed_5c_out" in eps and "Conv3d_1a_7x7_out" in eps
    assert eps["Mixed_5c_out"][0].shape == (1, 2, 4, 5, 1024)


@pytest.mark.slow
def test_i3d_trunk_head_split_consistency(i3d_pair):
    ref, model, variables = i3d_pair
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 120, 160, 3))
    full = model.apply(variables, x)
    feats = model.apply(variables, x, method=model.features_to, endpoint="Mixed_5c")
    via_split = model.apply(
        variables, feats, method=model.head_from, endpoint="Mixed_5c"
    )
    np.testing.assert_allclose(
        np.asarray(via_split), np.asarray(full), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_i3d_stride_mod_layers_temporal_resolution():
    """stride_mod_layers removes temporal striding (mask-search config)."""
    model = I3D(
        num_classes=4,
        last_stride=1,
        stride_mod_layers=("MaxPool3d_4a_3x3", "MaxPool3d_5a_2x2"),
        final_endpoint="Mixed_5c",
    )
    x = jnp.zeros((1, 8, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    # T: conv1a stride2 -> 4; 4a,5a strides removed -> stays 4
    assert out.shape[1] == 4
    # pool formula: int(2 * (2/1)**2) == 8
    assert model.logits_pool_shape() == (8, 7, 7)


def test_i3d_last_relu_leaky_is_dead_like_reference():
    """Checkpoint parity: the reference's lastRelu='leaky' branch is DEAD
    (I3D_doubled.py:321-325 — the following if/else resets last_actf to
    None), so 'leaky' must behave as no final activation; 'leaky_fixed'
    provides the evidently-intended semantics."""
    # T=16 (trunk T=2) so the (2,2,2) logits pool is non-degenerate, and
    # random input so some logits are negative (where leaky != identity)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 64, 64, 3))
    base = I3D(num_classes=16, pool_shape=(2, 2, 2), dropout_rate=0.0)
    vars_ = base.init(jax.random.PRNGKey(0), x)
    out_none = np.asarray(base.apply(vars_, x, train=False))
    assert out_none.size and (out_none < 0).any()  # leaky would bite here
    out_leaky = I3D(
        num_classes=16, pool_shape=(2, 2, 2), dropout_rate=0.0,
        last_relu="leaky",
    ).apply(vars_, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_leaky), out_none)
    out_fixed = I3D(
        num_classes=16, pool_shape=(2, 2, 2), dropout_rate=0.0,
        last_relu="leaky_fixed",
    ).apply(vars_, x, train=False)
    assert not np.array_equal(np.asarray(out_fixed), out_none)


def test_convlstm_effective_steps_out_of_range_scan_matches_unrolled():
    """effective_steps beyond the clip are silently skipped (the reference's
    `if step in effective_step` semantics) identically on BOTH recurrence
    paths — the raw scan indexing used to trace-fail on steps >= T."""
    kwargs = dict(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(4, 8, 12, 15),  # T=9: only 4 and 8 exist
        batch_norm=False,
        dropout_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 16, 16, 3))
    m_unroll = ConvLSTMClassifier(use_scan=False, **kwargs)
    vars_ = m_unroll.init(jax.random.PRNGKey(1), x)
    out_u = m_unroll.apply(vars_, x, train=False)
    m_scan = ConvLSTMClassifier(use_scan=True, **kwargs)
    out_s = m_scan.apply(vars_, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_u), rtol=1e-5, atol=1e-6
    )


@pytest.fixture(scope="module")
def clstm_pair(reference_pt_path):
    import importlib

    clstm_mod = importlib.import_module("models.CLSTM_4")
    torch.manual_seed(0)
    ref = clstm_mod.Model(
        num_classes=6,
        nb_lstm_units=4,
        lstm_layers=2,
        conv_kernel_size=(5, 5),
        pool_kernel_size=(2, 2),
        step=8,
        image_size=(32, 32),
        conv_stride=1,
        effective_step=[3, 7],
        batch_normalization=True,
        dropout=0,
    )
    ref.eval()
    # randomize BN running stats so eval parity actually exercises them
    with torch.no_grad():
        ref.clstm.bn.running_mean.uniform_(-0.5, 0.5)
        ref.clstm.bn.running_var.uniform_(0.5, 1.5)
    variables = convlstm_state_dict_to_variables(
        ref.state_dict(),
        image_size=(32, 32),
        conv_stride=1,
        pool_kernel=(2, 2),
        lstm_layers=2,
        nb_lstm_units=4,
    )
    model = ConvLSTMClassifier(
        num_classes=6,
        nb_lstm_units=4,
        lstm_layers=2,
        conv_kernel_size=5,
        conv_stride=1,
        pool_kernel=(2, 2),
        effective_steps=(3, 7),
        batch_norm=True,
        shared_bn=True,
        dropout_rate=0.0,
    )
    return ref, model, variables


def test_convlstm_classifier_parity(clstm_pair):
    ref, model, variables = clstm_pair
    torch.manual_seed(3)
    x_t = torch.randn(2, 3, 8, 32, 32)
    with torch.no_grad():
        ref_out = ref(x_t).numpy()
    out = model.apply(variables, _to_jax_clip(x_t))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_convlstm_use_entire_seq_shape():
    model = ConvLSTMClassifier(
        num_classes=5,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(1, 3),
        use_entire_seq=True,
        batch_norm=False,
    )
    x = jnp.zeros((2, 4, 16, 16, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (2, 5)


@pytest.mark.slow
def test_convlstm_feature_offset_is_gradcam_path():
    """grad wrt feature_offset at 0 is nonzero through the head but the
    forward value is unchanged."""
    model = ConvLSTMClassifier(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(3,),
        batch_norm=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 3))
    vars_ = model.init(jax.random.PRNGKey(1), x)
    feats = model.apply(vars_, x, method=model.features)
    zero = jnp.zeros_like(feats)
    out0 = model.apply(vars_, x)
    out1 = model.apply(vars_, x, feature_offset=zero)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-6)
    g = jax.grad(
        lambda off: model.apply(vars_, x, feature_offset=off)[0, 0]
    )(zero)
    # only the last effective step feeds the FC head -> its grad is nonzero
    assert float(jnp.abs(g[:, 3]).max()) > 0
    # earlier steps do not reach the head (effective_steps=(3,)):
    assert float(jnp.abs(g[:, 0]).max()) == 0


@pytest.mark.slow
def test_cnn3d_shapes_and_registry():
    model = get_model("cnn_3d", num_classes=6)
    assert isinstance(model, CNN3D)
    x = jnp.zeros((1, 8, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (1, 6)
    assert isinstance(get_model("models.CLSTM_4"), ConvLSTMClassifier)
    assert get_model("clstm_gap").head == "gap"
    assert get_model("models.I3D_doubled_kth").pool_shape == (2, 4, 5)


@pytest.mark.slow
def test_i3d_extract_features(i3d_pair):
    ref, model, variables = i3d_pair
    x_t = torch.randn(1, 3, 16, 120, 160)
    with torch.no_grad():
        ref_feats = ref.extract_features(x_t).numpy()
    feats = model.apply(
        variables, _to_jax_clip(x_t), method=model.extract_features
    )
    np.testing.assert_allclose(
        np.asarray(feats).transpose(0, 4, 1, 2, 3), ref_feats, rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_convlstm_dropout_train_path():
    """ConvLSTM with dropout>0 trains (regression: nn.Dropout must be
    created in setup for the setup-based stack)."""
    model = ConvLSTMClassifier(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=2,
        conv_kernel_size=3,
        effective_steps=(3,),
        batch_norm=True,
        dropout_rate=0.5,
    )
    x = jnp.ones((2, 4, 16, 16, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out_eval = model.apply(vars_, x)  # deterministic path
    assert out_eval.shape == (2, 3)
    out_train, _ = model.apply(
        vars_,
        x,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(out_train)).all()


@pytest.mark.slow
def test_i3d_doubled_smth_stride_mod_parity(reference_pt_path):
    """The 'doubled' feature numerically: smth I3D with temporal striding
    removed (stride_mod_layers + last_stride=1 — the exact mask-search
    model config, FindMasksComparison_I3D_smth.py:55-58) vs the reference
    I3D_doubled.Model with synced weights, incl. the stride-adjusted
    avg-pool formula int(2*(2/last_stride)^n) (I3D_doubled.py:310-317)."""
    import importlib

    from ivf_tpu.models import i3d_smth
    from ivf_tpu.utils.import_torch import i3d_state_dict_to_variables

    mods = "MaxPool3d_4a_3x3,MaxPool3d_5a_2x2"
    ref_mod = importlib.import_module("models.I3D_doubled")
    torch.manual_seed(0)
    ref = ref_mod.Model(
        num_classes=5,
        dropout_keep_prob=0.0,
        last_stride=1,
        stride_mod_layers=mods,
    )
    ref.eval()
    variables = i3d_state_dict_to_variables(ref.state_dict())
    model = i3d_smth(
        num_classes=5,
        dropout_rate=0.0,
        last_stride=1,
        stride_mod_layers=tuple(mods.split(",")),
    )

    torch.manual_seed(1)
    x_t = torch.randn(1, 3, 16, 224, 224)
    with torch.no_grad():
        ref_out = ref(x_t).numpy()
    out = jax.jit(lambda v, x: model.apply(v, x))(
        variables, _to_jax_clip(x_t)
    )
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-4)
