"""I3D on KTH actions — runnable preset.

Mirrors /root/reference/video_features_pytorch/configs/config_i3d_kth.py
(clip 32, 6 classes, ADAM 8e-3). KTH frames are 160w x 120h, so the
spatial size is the (H, W) pair rather than the reference's square-int
field; the KTH model's final avg-pool is sized (final_temp_time, 4, 5)
for this input (models/I3D_doubled_kth.py:299-308).
"""

config = {
    "model_name": "modelI3d_kth",
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
    "momentum": 0.9,
    "weight_decay": 0.00001,
    "num_epochs": 1,
    "print_freq": 4,

    "conv_model": "i3d_kth",
    "input_spatial_size": (120, 160),

    "shuffle": 1,
    "soft_max": 0,
    "last_relu": None,
    "last_stride": 1,
    "final_temp_time": 2,
    "stride_mod_layers": "",
    "dropout": 0.5,
    "pretrained_model_path": "no_ckpt",

    # KTH mask-driver defaults (FindMasksComparison_I3D_KTH.py:104-118)
    "lam1": 0.02,
    "lam2": 0.04,
    "optIter": 100,
    "maskInitType": "central",
    "maskPerturbType": "freeze",
    "gradCamType": "guessed",
    "splitType": "original",
}
