"""ConvLSTM (TF family) on KTH records — runnable preset.

Mirrors the TF flag config
(/root/reference/video_features_tf/configs/config_train_kth_clstm.py):
records input with per-subject shards (train 1-16 / val 17-25), layers
[32,32] kernel 3 stride 2, batch 24, momentum optimizer with decoupled
weight decay 1e-5, lr 1e-3 halved on val-acc patience 2 down to 1e-8,
Keras cell semantics (hard-sigmoid gates, unit forget bias via
block_order='tf') and L2 kernel regularization 0.01 in the loss.
"""

config = {
    "model_name": "clstm_kth_tf",
    "output_dir": "trained_models/",
    "input_mode": "records",

    "records_folder": "data/kth_records/",
    "train_subjects": tuple(range(1, 17)),
    "val_subjects": tuple(range(17, 26)),

    "num_workers": 8,
    "num_classes": 6,
    "batch_size": 24,
    "clip_size": 32,

    "optimizer": "momentum_decoupled",
    "lr": 0.001,
    "last_lr": 0.00000001,
    "momentum": 0.2,
    "weight_decay": 0.00001,
    "lr_schedule": "patience_halving",
    "lr_patience": 2,
    "num_epochs": 300,
    "print_freq": 16,

    "conv_model": "clstm",
    "input_spatial_size": (120, 160),

    "shuffle": 1,
    "soft_max": 0,
    "clstm_hidden": 32,
    "clstm_layers": 2,
    "conv_stride": 2,
    "kernel_size_1": 3,
    "kernel_size_2": 5,
    "padding_clstm": "valid",
    "batch_norm": True,
    "dropout": 0.5,
    "block_order": "tf",
    "pooling": "max",
    "recurrent_activation": "hard_sigmoid",
    "kernel_l2": 0.01,
    "pretrained_model_path": "no_ckpt",

    # TF mask drivers skip clips scoring < 0.1 (find_mask_smth.py:364-366)
    "min_score": 0.1,
    "lam1": 0.02,
    "lam2": 0.04,
    "optIter": 100,
}
