from ivf_tpu.train.metrics import topk_accuracy, AverageMeter
from ivf_tpu.train.optim import build_optimizer
from ivf_tpu.train.schedule import ReduceLROnPlateau, PatienceHalving
from ivf_tpu.train.state import TrainState, create_train_state
from ivf_tpu.train.loop import (
    make_train_step,
    make_eval_step,
    train_epoch,
    evaluate,
    fit,
)

__all__ = [
    "topk_accuracy",
    "AverageMeter",
    "build_optimizer",
    "ReduceLROnPlateau",
    "PatienceHalving",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "train_epoch",
    "evaluate",
    "fit",
]
