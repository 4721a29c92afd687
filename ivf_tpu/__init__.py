"""ivf_tpu — TPU-native video-interpretability framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
``interpreting-video-features`` (arXiv 2002.00367): I3D and ConvLSTM video
classifiers on KTH / Something-Something-V2, plus the two interpretability
techniques — gradient-optimized temporal masks (freeze / reverse
perturbations with L1+TV regularization) and Grad-CAM saliency volumes —
redesigned TPU-first:

* all tensors are channels-last ``(B, T, H, W, C)`` (NDHWC) so XLA tiles
  convs onto the MXU;
* the ConvLSTM recurrence and the freeze perturbation are ``lax.scan`` ops;
* the per-clip temporal-mask search (300 Adam steps/clip in the reference,
  sequential) is ``vmap``-ed over clips and sharded over a device mesh;
* data-parallel scaling uses ``jax.sharding.Mesh`` + XLA collectives, not
  host-side replica scatter/gather.

Reference layout map (see SURVEY.md for the full inventory):
  ops/        <- TF-SAME conv/pool semantics (I3D_doubled.py:8-118)
  models/     <- I3D_doubled*.py, convolution_lstm.py, CLSTM_4.py, cnn_3d.py
  interpret/  <- mask.py, grad_cam_videos.py, mask/gradcam.py
  train/      <- train_*.py loops, utils.py optimizer/ckpt/metric helpers
  data/       <- data_loader_*.py, data_parser.py, tfrecords/*
  viz/        <- visualisation.py, mask/viz.py
  parallel/   <- (new) mesh + sharding layer; reference only had DataParallel
"""

__version__ = "0.3.0"
