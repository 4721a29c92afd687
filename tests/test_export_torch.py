"""Torch checkpoint EXPORT round trips: ivf_tpu variables -> reference
state dict loaded with strict=True into the actual reference modules, and
byte-level equality through an import->export cycle."""

import importlib

import numpy as np
import pytest
import torch

from ivf_tpu.utils.export_torch import (
    convlstm_variables_to_state_dict,
    i3d_variables_to_state_dict,
    save_checkpoint_file,
)
from ivf_tpu.utils.import_torch import (
    convlstm_state_dict_to_variables,
    i3d_state_dict_to_variables,
    load_checkpoint_file,
)


def _assert_state_dicts_equal(a, b):
    assert set(a.keys()) == set(b.keys())
    for k in a:
        np.testing.assert_allclose(
            a[k].detach().numpy(),
            b[k].detach().numpy(),
            rtol=0,
            atol=0,
            err_msg=k,
        )


@pytest.mark.slow
def test_i3d_export_roundtrip_strict_load(reference_pt_path):
    """torch I3D -> import -> export -> load_state_dict(strict=True) into a
    fresh reference model reproduces every tensor exactly."""
    ref_mod = importlib.import_module("models.I3D_doubled_kth")
    torch.manual_seed(0)
    ref = ref_mod.Model(
        num_classes=6,
        finalTimeLength=2,
        dropout_keep_prob=0.0,
        stride_mod_layers="",
    )
    variables = i3d_state_dict_to_variables(ref.state_dict())
    exported = i3d_variables_to_state_dict(variables)

    torch.manual_seed(123)  # different init: strict load must overwrite it
    ref2 = ref_mod.Model(
        num_classes=6,
        finalTimeLength=2,
        dropout_keep_prob=0.0,
        stride_mod_layers="",
    )
    ref2.load_state_dict(exported, strict=True)
    _assert_state_dicts_equal(ref.state_dict(), ref2.state_dict())

    ref.eval(), ref2.eval()
    x = torch.randn(1, 3, 16, 120, 160)
    with torch.no_grad():
        np.testing.assert_array_equal(ref(x).numpy(), ref2(x).numpy())


@pytest.mark.slow
def test_convlstm_export_roundtrip_strict_load(reference_pt_path):
    """Same round trip for the CLSTM_4 family (gate split/merge, shared BN,
    endFC flatten-order permutation)."""
    clstm_mod = importlib.import_module("models.CLSTM_4")
    torch.manual_seed(0)
    geom = dict(
        image_size=(32, 32),
        conv_stride=1,
        pool_kernel=(2, 2),
        lstm_layers=2,
        nb_lstm_units=4,
    )
    def build():
        return clstm_mod.Model(
            num_classes=3,
            nb_lstm_units=geom["nb_lstm_units"],
            lstm_layers=geom["lstm_layers"],
            conv_kernel_size=(5, 5),
            pool_kernel_size=geom["pool_kernel"],
            step=4,
            image_size=geom["image_size"],
            conv_stride=geom["conv_stride"],
            effective_step=[3],
            batch_normalization=True,
            dropout=0,
        )

    ref = build()
    variables = convlstm_state_dict_to_variables(ref.state_dict(), **geom)
    exported = convlstm_variables_to_state_dict(variables, **geom)

    torch.manual_seed(99)
    ref2 = build()
    ref2.load_state_dict(exported, strict=True)
    _assert_state_dicts_equal(ref.state_dict(), ref2.state_dict())


def test_save_checkpoint_file_roundtrip(tmp_path):
    """save_checkpoint_file writes the reference's {'epoch','arch',
    'state_dict','best_loss'} layout; load_checkpoint_file reads it back."""
    sd = {"w": torch.arange(6, dtype=torch.float32).reshape(2, 3)}
    path = str(tmp_path / "checkpoint.pth.tar")
    save_checkpoint_file(path, sd, epoch=7, best_loss=0.25, arch="i3d")
    back = load_checkpoint_file(path)
    np.testing.assert_array_equal(back["w"].numpy(), sd["w"].numpy())
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 7 and raw["best_loss"] == 0.25 and raw["arch"] == "i3d"
