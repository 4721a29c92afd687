"""I3D on Something-Something-V2 — runnable preset.

Values mirror the reference torch config
(/root/reference/video_features_pytorch/configs/config_i3d_smth.py) with
two deliberate corrections: the reference file ships with a stale
``conv_model: models.I3D_doubled_kth`` + ``input_spatial_size: 160``
(a KTH leftover); the smth drivers actually use the 224x224 smth model
(FindMasksComparison_I3D_smth.py + train_i3d_smth.py), which is what this
preset selects. Point ``data_folder`` at your frame-dir root.
"""

config = {
    "model_name": "modelI3d_scratch",
    "output_dir": "trained_models/",
    "input_mode": "jpg",

    "data_folder": "data/smth_smth/frames/",
    "json_data_train": "data/smth_smth/train.json",
    "json_data_val": "data/smth_smth/validation.json",
    "json_data_test": "data/smth_smth/test.json",
    "json_file_labels": "data/smth_smth/labels.json",

    "num_workers": 8,
    "num_classes": 174,
    "batch_size": 16,
    "clip_size": 16,

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

    "conv_model": "i3d_smth",
    "input_spatial_size": 224,

    "shuffle": 1,
    "soft_max": 0,
    "last_relu": None,
    "last_stride": 1,
    "final_temp_time": 2,
    "stride_mod_layers": "",
    "dropout": 0.5,
    "pretrained_model_path": "no_ckpt",

    # mask-search defaults of the smth driver
    # (FindMasksComparison_I3D_smth.py:106-119)
    "lam1": 0.01,
    "lam2": 0.02,
    "optIter": 300,
    "maskInitType": "central",
    "maskPerturbType": "freeze",
    "gradCamType": "guessed",
}
