"""Import reference torch checkpoints (.pth.tar) into ivf_tpu param trees.

Converts the reference's layer naming into our Flax variable collections:

I3D (``video_features_pytorch/models/I3D_doubled*.py``):
  ``<EP>.conv3d.weight``  (Cout,Cin,kT,kH,kW) -> params/<EP>/kernel (DHWIO)
  ``<EP>.conv3d.bias``                         -> params/<EP>/bias
  ``<EP>.bn.weight|bias``                      -> params/<EP>/bn/{scale,bias}
  ``<EP>.bn.running_mean|var``                 -> batch_stats/<EP>/bn/{mean,var}
  Inception branches keep their names (b0, b1a, b1b, b2a, b2b, b3b).
  ``logits.conv3d.*`` -> params/logits/*

ConvLSTM (``models/convolution_lstm.py`` + ``CLSTM_4.py``):
  ``clstm.cell<i>.Wx{i,f,c,o}.weight`` concat (i,f,c,o) on Cout -> cells_<i>/wx
  ``clstm.cell<i>.Wx*.bias``  concat -> cells_<i>/bx
  ``clstm.cell<i>.Wh*.weight`` concat -> cells_<i>/wh
  (zero peephole Wci/Wcf/Wco constants are not in the state dict — elided)
  ``clstm.bn.*`` -> clstm/bn (the shared-BN quirk)
  ``endFC.weight`` -> end_fc/kernel, with the input features permuted from
  torch's (C,H,W) flatten order to our (H,W,C).

``remove_module_prefix`` strips DataParallel's ``module.`` prefix, the JAX
counterpart of ``utils.remove_module_from_checkpoint_state_dict``
(video_features_pytorch/utils.py:94-104).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def remove_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    return {re.sub(r"^module\.", "", k): v for k, v in state_dict.items()}


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def i3d_state_dict_to_variables(state_dict: Mapping[str, Any]) -> Dict:
    """Reference I3D state dict -> {'params': ..., 'batch_stats': ...}."""
    sd = remove_module_prefix(state_dict)
    params: Dict = {}
    stats: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        arr = _np(val)
        if parts[-2] == "conv3d":
            scope = tuple(parts[:-2])
            if parts[-1] == "weight":
                _set(params, scope + ("kernel",), arr.transpose(2, 3, 4, 1, 0))
            else:
                _set(params, scope + ("bias",), arr)
        elif parts[-2] == "bn":
            scope = tuple(parts[:-1])
            leaf = parts[-1]
            if leaf == "weight":
                _set(params, scope + ("scale",), arr)
            elif leaf == "bias":
                _set(params, scope + ("bias",), arr)
            elif leaf == "running_mean":
                _set(stats, scope + ("mean",), arr)
            elif leaf == "running_var":
                _set(stats, scope + ("var",), arr)
            # num_batches_tracked: dropped
    return {"params": params, "batch_stats": stats}


_GATE_ORDER = ("i", "f", "c", "o")


def convlstm_state_dict_to_variables(
    state_dict: Mapping[str, Any],
    image_size: Tuple[int, int],
    conv_stride: int,
    pool_kernel: Tuple[int, int],
    lstm_layers: int,
    nb_lstm_units: int,
) -> Dict:
    """Reference CLSTM_4 state dict -> ivf_tpu ConvLSTMClassifier variables.

    ``image_size``/strides are needed to un-permute the FC weight from
    torch's (C, H', W') flatten order into ours (H', W', C)
    (CLSTM_4.py:54-63 computes the same H', W').
    """
    sd = remove_module_prefix(state_dict)
    params: Dict = {}
    stats: Dict = {}

    cell_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"clstm\.cell(\d+)\.", k))
        }
    )
    for ci in cell_ids:
        wx = np.concatenate(
            [
                _np(sd[f"clstm.cell{ci}.Wx{g}.weight"]).transpose(2, 3, 1, 0)
                for g in _GATE_ORDER
            ],
            axis=-1,
        )
        bx = np.concatenate(
            [_np(sd[f"clstm.cell{ci}.Wx{g}.bias"]) for g in _GATE_ORDER]
        )
        wh = np.concatenate(
            [
                _np(sd[f"clstm.cell{ci}.Wh{g}.weight"]).transpose(2, 3, 1, 0)
                for g in _GATE_ORDER
            ],
            axis=-1,
        )
        scope = ("clstm", f"cells_{ci}")
        _set(params, scope + ("wx",), wx)
        _set(params, scope + ("bx",), bx)
        _set(params, scope + ("wh",), wh)

    if "clstm.bn.weight" in sd:
        _set(params, ("clstm", "bn", "scale"), _np(sd["clstm.bn.weight"]))
        _set(params, ("clstm", "bn", "bias"), _np(sd["clstm.bn.bias"]))
        _set(stats, ("clstm", "bn", "mean"), _np(sd["clstm.bn.running_mean"]))
        _set(stats, ("clstm", "bn", "var"), _np(sd["clstm.bn.running_var"]))

    if "endFC.weight" in sd:
        w = _np(sd["endFC.weight"])  # (num_classes, in_features)
        hp = image_size[0] // ((conv_stride * pool_kernel[0]) ** lstm_layers)
        wp = image_size[1] // ((conv_stride * pool_kernel[0]) ** lstm_layers)
        c = nb_lstm_units
        n_eff = w.shape[1] // (c * hp * wp)
        # torch flatten order per effective step: (C, H', W') -> ours (H', W', C)
        w = w.reshape(w.shape[0], n_eff, c, hp, wp)
        w = w.transpose(0, 1, 3, 4, 2).reshape(w.shape[0], -1)
        _set(params, ("end_fc", "kernel"), w.T)
        _set(params, ("end_fc", "bias"), _np(sd["endFC.bias"]))

    return {"params": params, "batch_stats": stats}


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    """Load a reference .pth.tar checkpoint (returns its state_dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt
