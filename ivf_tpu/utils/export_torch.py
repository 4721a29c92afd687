"""Export ivf_tpu variables back to reference torch checkpoints (.pth.tar).

The exact inverse of ``import_torch``: a model trained (or fine-tuned) in
this framework can be handed back to the reference stack
(``video_features_pytorch``) and loaded with ``strict=True`` — the
completion of the two-way migration matrix (torch->jax importer, TF->jax
importer, jax->torch exporter).

Name maps mirror the reference modules:
  I3D:      ``<EP>.conv3d.weight|bias``, ``<EP>.bn.{weight,bias,
            running_mean,running_var,num_batches_tracked}``
            (``models/I3D_doubled.py:43-118`` Unit3D layout)
  ConvLSTM: ``clstm.cell<i>.Wx{i,f,c,o}.{weight,bias}``,
            ``clstm.cell<i>.Wh{i,f,c,o}.weight`` (Wh convs are bias-free,
            ``models/convolution_lstm.py:25-32``), shared ``clstm.bn.*``,
            ``endFC.{weight,bias}`` with the (H',W',C)->(C,H',W') flatten
            permutation of ``CLSTM_4.py:54-63``.

Only canonical (unfused, un-BN-folded) variable trees export — the
checkpoint on disk is always the canonical format, exactly like the
reference's.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

_GATE_ORDER = ("i", "f", "c", "o")


def _t(arr) -> "Any":
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(arr)))


def i3d_variables_to_state_dict(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """{'params', 'batch_stats'} -> reference I3D state dict (torch tensors).

    Inverse of ``import_torch.i3d_state_dict_to_variables``: Flax DHWIO
    kernels -> torch (Cout,Cin,kT,kH,kW); bn scale/bias + stats ->
    bn.weight/bias/running_mean/running_var (+ a zero
    ``num_batches_tracked`` so modern-torch ``strict=True`` loads succeed).
    """
    import torch

    sd: Dict[str, Any] = {}

    def walk_params(node: Mapping[str, Any], scope: Tuple[str, ...]):
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk_params(v, scope + (k,))
            elif k == "kernel":
                sd[".".join(scope) + ".conv3d.weight"] = _t(
                    np.asarray(v).transpose(4, 3, 0, 1, 2)
                )
            elif k == "bias" and scope and scope[-1] == "bn":
                sd[".".join(scope) + ".bias"] = _t(v)
            elif k == "bias":
                sd[".".join(scope) + ".conv3d.bias"] = _t(v)
            elif k == "scale":  # bn scale; scope already ends in 'bn'
                sd[".".join(scope) + ".weight"] = _t(v)

    def walk_stats(node: Mapping[str, Any], scope: Tuple[str, ...]):
        for k, v in node.items():
            if isinstance(v, Mapping):
                walk_stats(v, scope + (k,))
            elif k == "mean":
                sd[".".join(scope) + ".running_mean"] = _t(v)
                sd[".".join(scope) + ".num_batches_tracked"] = torch.zeros(
                    (), dtype=torch.long
                )
            elif k == "var":
                sd[".".join(scope) + ".running_var"] = _t(v)

    walk_params(variables["params"], ())
    walk_stats(variables.get("batch_stats", {}), ())
    return sd


def convlstm_variables_to_state_dict(
    variables: Mapping[str, Any],
    image_size: Tuple[int, int],
    conv_stride: int,
    pool_kernel: Tuple[int, int],
    lstm_layers: int,
    nb_lstm_units: int,
) -> Dict[str, Any]:
    """ConvLSTMClassifier variables -> reference CLSTM_4 state dict.

    Inverse of ``import_torch.convlstm_state_dict_to_variables`` (same
    geometry arguments, used to re-permute the FC weight back to torch's
    (C, H', W') flatten order).
    """
    import torch

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, Any] = {}

    clstm = params["clstm"]
    for name, cell in clstm.items():
        if not name.startswith("cells_"):
            continue
        ci = int(name.split("_")[1])
        c = np.asarray(cell["wx"]).shape[-1] // 4
        for gi, g in enumerate(_GATE_ORDER):
            wx_g = np.asarray(cell["wx"])[..., gi * c : (gi + 1) * c]
            wh_g = np.asarray(cell["wh"])[..., gi * c : (gi + 1) * c]
            bx_g = np.asarray(cell["bx"])[gi * c : (gi + 1) * c]
            # Flax HWIO -> torch (Cout, Cin, kH, kW)
            sd[f"clstm.cell{ci}.Wx{g}.weight"] = _t(wx_g.transpose(3, 2, 0, 1))
            sd[f"clstm.cell{ci}.Wx{g}.bias"] = _t(bx_g)
            sd[f"clstm.cell{ci}.Wh{g}.weight"] = _t(wh_g.transpose(3, 2, 0, 1))

    if "bn" in clstm:
        sd["clstm.bn.weight"] = _t(clstm["bn"]["scale"])
        sd["clstm.bn.bias"] = _t(clstm["bn"]["bias"])
        sd["clstm.bn.running_mean"] = _t(stats["clstm"]["bn"]["mean"])
        sd["clstm.bn.running_var"] = _t(stats["clstm"]["bn"]["var"])
        sd["clstm.bn.num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    if "end_fc" in params:
        w = np.asarray(params["end_fc"]["kernel"]).T  # (classes, in_features)
        hp = image_size[0] // ((conv_stride * pool_kernel[0]) ** lstm_layers)
        wp = image_size[1] // ((conv_stride * pool_kernel[0]) ** lstm_layers)
        c = nb_lstm_units
        n_eff = w.shape[1] // (c * hp * wp)
        # ours (H', W', C) per effective step -> torch flatten order (C, H', W')
        w = w.reshape(w.shape[0], n_eff, hp, wp, c)
        w = w.transpose(0, 1, 4, 2, 3).reshape(w.shape[0], -1)
        sd["endFC.weight"] = _t(w)
        sd["endFC.bias"] = _t(params["end_fc"]["bias"])

    return sd


def save_checkpoint_file(
    path: str,
    state_dict: Mapping[str, Any],
    epoch: int = 0,
    best_loss: float = float("inf"),
    arch: str = "",
) -> None:
    """Write a reference-layout .pth.tar (utils.py:142-148 checkpoint keys:
    the training drivers save {'epoch', 'arch', 'state_dict', 'best_loss'},
    e.g. train_i3d_smth.py:184-189)."""
    import torch

    torch.save(
        {
            "epoch": epoch,
            "arch": arch,
            "state_dict": dict(state_dict),
            "best_loss": best_loss,
        },
        path,
    )
