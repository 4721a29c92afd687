"""TF-checkpoint import: bundle format round-trip + golden name-mapping
tests.

The ConvLSTM golden test builds a synthetic ``tf.train.Saver``-style bundle
with Keras graph variable names (video_features_tf/models/clstm.py), imports
it, and checks our model's logits against an INDEPENDENT numpy
implementation of the Keras ConvLSTM2D -> TimeDistributed(MaxPool) -> BN ->
dense graph — so gate order, padding, activation, and flatten order are all
pinned by math, not by our own code."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ivf_tpu.utils.tf_bundle import list_variables, load_bundle, save_bundle


def test_bundle_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "a/kernel": rng.randn(3, 5, 3, 16).astype(np.float32),
        "a/bias": rng.randn(16).astype(np.float32),
        "nested/deep/var": rng.randn(7, 7).astype(np.float64),
        "global_step": np.asarray(1234, np.int64),
        "flags": np.asarray([True, False]),
    }
    prefix = os.path.join(tmp_path, "ckpts", "model.ckpt")
    save_bundle(prefix, tensors)
    assert sorted(os.listdir(os.path.join(tmp_path, "ckpts"))) == [
        "model.ckpt.data-00000-of-00001",
        "model.ckpt.index",
    ]
    lv = list_variables(prefix)
    assert lv["a/kernel"] == ((3, 5, 3, 16), np.dtype("float32"))
    back = load_bundle(prefix)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


# ---------------------------------------------------------------------------
# independent numpy replica of the Keras clstm graph
# ---------------------------------------------------------------------------


def _np_conv2d(x, w, stride, padding):
    """x (B,H,W,Cin), w (k1,k2,Cin,Cout); padding 'valid'|'same' (odd k)."""
    k1, k2 = w.shape[0], w.shape[1]
    if padding == "same":
        p1, p2 = (k1 - 1) // 2, (k2 - 1) // 2
        x = np.pad(x, ((0, 0), (p1, p1), (p2, p2), (0, 0)))
    b, h, wd, cin = x.shape
    oh = (h - k1) // stride + 1
    ow = (wd - k2) // stride + 1
    out = np.zeros((b, oh, ow, w.shape[3]), np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i * stride : i * stride + k1, j * stride : j * stride + k2]
            out[:, i, j] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out


def _hard_sigmoid(x):
    return np.clip(0.2 * x + 0.5, 0.0, 1.0)


def _np_keras_convlstm2d(clip, kernel, rkernel, bias, stride, padding):
    """Keras ConvLSTM2D forward, return_sequences=True. Gate order i,f,c,o."""
    b, t = clip.shape[:2]
    ch = rkernel.shape[2]
    # state spatial dims = x-conv output dims
    probe = _np_conv2d(clip[:, 0], kernel, stride, padding)
    h = np.zeros_like(probe[..., :ch])
    c = np.zeros_like(h)
    seq = []
    for step in range(t):
        zx = _np_conv2d(clip[:, step], kernel, stride, padding) + bias
        zh = _np_conv2d(h, rkernel, 1, "same")
        z = zx + zh
        zi, zf, zc, zo = np.split(z, 4, axis=-1)
        i = _hard_sigmoid(zi)
        f = _hard_sigmoid(zf)
        c = f * c + i * np.tanh(zc)
        o = _hard_sigmoid(zo)
        h = o * np.tanh(c)
        seq.append(h)
    return np.stack(seq, axis=1)  # (B,T,H',W',Ch)


def _np_maxpool2(x):
    b, h, w, c = x.shape
    oh, ow = h // 2, w // 2
    x = x[:, : oh * 2, : ow * 2]
    return x.reshape(b, oh, 2, ow, 2, c).max(axis=(2, 4))


def _np_bn(x, gamma, beta, mean, var, eps=1e-3):
    return (x - mean) / np.sqrt(var + eps) * gamma + beta


def test_clstm_tf_import_golden(tmp_path):
    """Synthetic Keras-named bundle -> import -> our logits == numpy Keras."""
    from ivf_tpu.models import ConvLSTMClassifier
    from ivf_tpu.utils.import_tf import load_tf_checkpoint

    rng = np.random.RandomState(7)
    t, hgt, wid, cin = 4, 24, 32, 3
    layers = (4, 4)
    k1, k2, stride = 3, 5, 2
    n_classes = 6

    tensors = {"global_step": np.asarray(42, np.int64)}
    np_layers = []
    c_in = cin
    for li, ch in enumerate(layers):
        sfx = "" if li == 0 else f"_{li}"
        kern = (rng.randn(k1, k2, c_in, 4 * ch) * 0.3).astype(np.float32)
        rkern = (rng.randn(k1, k2, ch, 4 * ch) * 0.3).astype(np.float32)
        bias = (rng.randn(4 * ch) * 0.1).astype(np.float32)
        tensors[f"conv_lst_m2d{sfx}/kernel"] = kern
        tensors[f"conv_lst_m2d{sfx}/recurrent_kernel"] = rkern
        tensors[f"conv_lst_m2d{sfx}/bias"] = bias
        # optimizer slots must be skipped by the importer
        tensors[f"conv_lst_m2d{sfx}/kernel/Adam"] = np.zeros_like(kern)
        tensors[f"conv_lst_m2d{sfx}/kernel/Adam_1"] = np.zeros_like(kern)
        gamma = (1.0 + 0.1 * rng.randn(ch)).astype(np.float32)
        beta = (0.1 * rng.randn(ch)).astype(np.float32)
        mmean = (0.05 * rng.randn(ch)).astype(np.float32)
        mvar = (1.0 + 0.1 * rng.rand(ch)).astype(np.float32)
        tensors[f"batch_normalization{sfx}/gamma"] = gamma
        tensors[f"batch_normalization{sfx}/beta"] = beta
        tensors[f"batch_normalization{sfx}/moving_mean"] = mmean
        tensors[f"batch_normalization{sfx}/moving_variance"] = mvar
        np_layers.append((kern, rkern, bias, gamma, beta, mmean, mvar))
        c_in = ch

    # numpy forward to find the dense input size
    clip = rng.rand(2, t, hgt, wid, cin).astype(np.float32)
    x = clip.astype(np.float64)
    for kern, rkern, bias, gamma, beta, mmean, mvar in np_layers:
        seq = _np_keras_convlstm2d(x, kern, rkern, bias, stride, "valid")
        pooled = np.stack([_np_maxpool2(seq[:, s]) for s in range(t)], axis=1)
        x = _np_bn(pooled, gamma, beta, mmean, mvar)
    feats = x[:, -1].reshape(2, -1)  # flatten(x[:, -1]) — clstm.py:111-117
    dk = (rng.randn(feats.shape[1], n_classes) * 0.2).astype(np.float32)
    db = (0.1 * rng.randn(n_classes)).astype(np.float32)
    tensors["dense/kernel"] = dk
    tensors["dense/bias"] = db
    expected = feats @ dk + db

    prefix = os.path.join(tmp_path, "model.ckpt")
    save_bundle(prefix, tensors)
    variables = load_tf_checkpoint(prefix, "clstm")
    assert sorted(variables["params"]["clstm"]) == [
        "bns_0",
        "bns_1",
        "cells_0",
        "cells_1",
    ]

    model = ConvLSTMClassifier(
        num_classes=n_classes,
        nb_lstm_units=4,
        lstm_layers=2,
        conv_kernel_size=(k1, k2),
        conv_stride=stride,
        effective_steps=(t - 1,),
        batch_norm=True,
        shared_bn=False,
        block_order="tf",
        recurrent_activation="hard_sigmoid",
        x_padding="valid",
    )
    out = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(clip),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_i3d_tf_import_roundtrip():
    """Our I3D params -> Sonnet-style names -> import -> identical tree +
    identical forward (pins the name mapping as a bijection; I3D math is
    separately parity-tested against the torch reference)."""
    from ivf_tpu.models import i3d_smth
    from ivf_tpu.utils.import_tf import i3d_bundle_to_variables

    model = i3d_smth(num_classes=5, dropout_rate=0.0, pool_shape=(2, 2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x)

    inv_branch = {
        "b0": ("Branch_0", "Conv3d_0a_1x1"),
        "b1a": ("Branch_1", "Conv3d_0a_1x1"),
        "b1b": ("Branch_1", "Conv3d_0b_3x3"),
        "b2a": ("Branch_2", "Conv3d_0a_1x1"),
        "b2b": ("Branch_2", "Conv3d_0b_3x3"),
        "b3b": ("Branch_3", "Conv3d_0b_1x1"),
    }

    tensors = {}

    def emit_unit(scope_tf, node, stats_node):
        if "kernel" in node:
            tensors[f"{scope_tf}/conv_3d/w"] = np.asarray(node["kernel"])
        if "bias" in node:
            tensors[f"{scope_tf}/conv_3d/b"] = np.asarray(node["bias"])
        if "bn" in node:
            bn = node["bn"]
            tensors[f"{scope_tf}/batch_norm/beta"] = np.asarray(bn["bias"])
            tensors[f"{scope_tf}/batch_norm/gamma"] = np.asarray(bn["scale"])
            tensors[f"{scope_tf}/batch_norm/moving_mean"] = np.asarray(
                stats_node["bn"]["mean"]
            )
            tensors[f"{scope_tf}/batch_norm/moving_variance"] = np.asarray(
                stats_node["bn"]["var"]
            )

    params = variables["params"]
    stats = variables["batch_stats"]
    for ep, node in params.items():
        if ep == "logits":
            emit_unit(
                "RGB/inception_i3d/Logits/Conv3d_0c_1x1", node, {}
            )
        elif "kernel" in node:
            emit_unit(f"RGB/inception_i3d/{ep}", node, stats[ep])
        else:  # inception module
            for unit, sub in node.items():
                br, conv = inv_branch[unit]
                emit_unit(
                    f"RGB/inception_i3d/{ep}/{br}/{conv}",
                    sub,
                    stats[ep][unit],
                )
    tensors["global_step"] = np.asarray(7, np.int64)

    imported = i3d_bundle_to_variables(tensors)
    ref_out = model.apply(variables, x, train=False)
    out = model.apply(
        {
            "params": imported["params"],
            "batch_stats": imported["batch_stats"],
        },
        x,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-6)


def test_clstm_gap_import_golden(tmp_path):
    """clstm_gap variant: conv3d/* maps to gap_conv and the gap head
    consumes the pooled+BN BLOCK-output sequence (clstm.py:54-84 — the
    avg_pool3d input is x after TimeDistributed pooling + BN, not the raw
    hidden states), checked against the same independent numpy replica."""
    from ivf_tpu.models import ConvLSTMClassifier
    from ivf_tpu.utils.import_tf import load_tf_checkpoint

    rng = np.random.RandomState(11)
    t, hgt, wid, cin = 4, 24, 32, 3
    layers = (4, 4)
    k1, k2, stride = 3, 5, 2
    n_classes = 5

    tensors = {"global_step": np.asarray(1, np.int64)}
    np_layers = []
    c_in = cin
    for li, ch in enumerate(layers):
        sfx = "" if li == 0 else f"_{li}"
        kern = (rng.randn(k1, k2, c_in, 4 * ch) * 0.3).astype(np.float32)
        rkern = (rng.randn(k1, k2, ch, 4 * ch) * 0.3).astype(np.float32)
        bias = (rng.randn(4 * ch) * 0.1).astype(np.float32)
        tensors[f"conv_lst_m2d{sfx}/kernel"] = kern
        tensors[f"conv_lst_m2d{sfx}/recurrent_kernel"] = rkern
        tensors[f"conv_lst_m2d{sfx}/bias"] = bias
        gamma = (1.0 + 0.1 * rng.randn(ch)).astype(np.float32)
        beta = (0.1 * rng.randn(ch)).astype(np.float32)
        mmean = (0.05 * rng.randn(ch)).astype(np.float32)
        mvar = (1.0 + 0.1 * rng.rand(ch)).astype(np.float32)
        tensors[f"batch_normalization{sfx}/gamma"] = gamma
        tensors[f"batch_normalization{sfx}/beta"] = beta
        tensors[f"batch_normalization{sfx}/moving_mean"] = mmean
        tensors[f"batch_normalization{sfx}/moving_variance"] = mvar
        np_layers.append((kern, rkern, bias, gamma, beta, mmean, mvar))
        c_in = ch

    clip = rng.rand(2, t, hgt, wid, cin).astype(np.float32)
    x = clip.astype(np.float64)
    for kern, rkern, bias, gamma, beta, mmean, mvar in np_layers:
        seq = _np_keras_convlstm2d(x, kern, rkern, bias, stride, "valid")
        pooled = np.stack([_np_maxpool2(seq[:, s]) for s in range(t)], axis=1)
        x = _np_bn(pooled, gamma, beta, mmean, mvar)
    # gap head: temporal mean of the block sequence, spatial GAP, 1x1 conv
    feats = x.mean(axis=1).mean(axis=(1, 2))  # (B, C)
    gk = (rng.randn(1, 1, 1, layers[-1], n_classes) * 0.2).astype(np.float32)
    gb = (0.1 * rng.randn(n_classes)).astype(np.float32)
    tensors["conv3d/kernel"] = gk
    tensors["conv3d/bias"] = gb
    expected = feats @ gk.reshape(layers[-1], n_classes) + gb

    prefix = os.path.join(tmp_path, "model.ckpt")
    save_bundle(prefix, tensors)
    variables = load_tf_checkpoint(prefix, "clstm")
    assert "gap_conv" in variables["params"]

    model = ConvLSTMClassifier(
        head="gap",
        num_classes=n_classes,
        nb_lstm_units=4,
        lstm_layers=2,
        conv_kernel_size=(k1, k2),
        conv_stride=stride,
        effective_steps=(t - 1,),
        batch_norm=True,
        shared_bn=False,
        block_order="tf",
        recurrent_activation="hard_sigmoid",
        x_padding="valid",
    )
    out = model.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(clip),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)
