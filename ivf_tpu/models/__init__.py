from ivf_tpu.models.i3d import I3D, i3d_smth, i3d_kth
from ivf_tpu.models.convlstm import ConvLSTM, ConvLSTMClassifier
from ivf_tpu.models.cnn3d import CNN3D
from ivf_tpu.models.registry import get_model

__all__ = [
    "I3D",
    "i3d_smth",
    "i3d_kth",
    "ConvLSTM",
    "ConvLSTMClassifier",
    "CNN3D",
    "get_model",
]
