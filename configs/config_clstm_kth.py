"""ConvLSTM (torch family) on KTH — runnable preset.

Mirrors /root/reference/video_features_pytorch/configs/config_clstm_kth.py:
2 ConvLSTM layers x 4 hidden units, conv stride 2, shared-BN torch block
order, effective steps at clip quarters [7,15,23,31]
(train_clstm_kth.py:51-55).
"""

config = {
    "model_name": "clstm_v4_",
    "output_dir": "trained_models/",
    "input_mode": "jpg",

    "data_folder": "data/kth/",
    "num_workers": 8,
    "num_classes": 6,
    "batch_size": 16,
    "clip_size": 32,

    "nclips_train": 1,
    "nclips_val": 1,
    "upscale_factor_train": 1.4,
    "upscale_factor_eval": 1.0,
    "step_size_train": 1,
    "step_size_val": 1,

    "optimizer": "ADAM",
    "lr": 0.008,
    "last_lr": 0.00001,
    "momentum": 0.2,
    "weight_decay": 0.00001,
    "num_epochs": 1,
    "print_freq": 4,

    "conv_model": "clstm_kth",
    "input_spatial_size": (120, 160),

    "shuffle": 1,
    "soft_max": 0,
    "last_relu": None,
    "clstm_hidden": 4,
    "clstm_layers": 2,
    "conv_stride": 2,
    "conv_kernel_size": 5,
    "batch_norm": True,
    "dropout": 0.5,
    "effective_steps": (7, 15, 23, 31),
    "pretrained_model_path": "no_ckpt",
    "maskPerturbType": "freeze",
    "splitType": "original",
}
