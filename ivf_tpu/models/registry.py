"""Model registry — maps config names to constructors.

Covers the union of both reference halves' model selectors:
torch ``config['conv_model']`` values (``models.I3D_doubled``,
``models.I3D_doubled_kth``, ``models.CLSTM_4``) and TF ``--model`` flag
values (``clstm``, ``cnn_3d``) — see SURVEY.md §2.
"""

from __future__ import annotations

from typing import Any, Dict

from ivf_tpu.models.cnn3d import CNN3D
from ivf_tpu.models.convlstm import ConvLSTMClassifier
from ivf_tpu.models.i3d import i3d_kth, i3d_smth


def get_model(name: str, **kwargs: Any):
    """Build a model by registry name.

    Accepted names (reference aliases in parens):
      i3d / i3d_smth (models.I3D_doubled), i3d_kth (models.I3D_doubled_kth),
      convlstm / clstm (models.CLSTM_4 / TF clstm),
      clstm_gap (TF clstm_gap), cnn_3d (TF cnn_3d).
    """
    key = name.lower().replace("-", "_")
    aliases: Dict[str, str] = {
        "models.i3d_doubled": "i3d_smth",
        "models.i3d_doubled_kth": "i3d_kth",
        "models.clstm_4": "convlstm",
        "clstm": "convlstm",
        "i3d": "i3d_smth",
    }
    key = aliases.get(key, key)
    if key == "i3d_smth":
        return i3d_smth(**kwargs)
    if key == "i3d_kth":
        return i3d_kth(**kwargs)
    if key == "convlstm":
        return ConvLSTMClassifier(**kwargs)
    if key == "clstm_gap":
        return ConvLSTMClassifier(head="gap", **kwargs)
    if key == "cnn_3d":
        return CNN3D(**kwargs)
    raise ValueError(f"Unknown model '{name}'")
