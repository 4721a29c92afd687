"""Grad-CAM for video — jax.grad instead of hooks.

Replaces both reference implementations:
  * torch ``grad_cam_videos.py`` + the vendored ``pytorch-grad-cam`` — hook
    capture of a target layer's activation/gradient, manual head
    re-application, CAM = ReLU(sum_c w_c * act_c) with channel weights
    w = mean grad over (T, H, W), spatial resize + temporal repeat to the
    input resolution, per-frame or per-sequence normalization
    (grad_cam_videos.py:64-142);
  * TF ``mask/gradcam.py`` — ``tf.gradients(y_c, clstm_output)`` with
    *per-frame* channel weights (mean grad over (H, W) only,
    mask/gradcam.py:101-111) — available via ``weight_mode='per_frame'``.

Here the target activation is a first-class function input: for I3D the
model's ``features_to`` / ``head_from`` split; for the ConvLSTM the
``feature_offset`` zero-perturbation input (grad at 0 == grad w.r.t. the
sown ``clstm_output``, matching the TF gradient's no-backprop-through-time
semantics).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def cam_from_activation(
    activation: jax.Array,
    grads: jax.Array,
    clip_len: int,
    spatial_size: Tuple[int, int],
    normalize_per_frame: bool = False,
    weight_mode: str = "global",
) -> jax.Array:
    """activation/grads: (T', H', W', C) -> cam volume (T, H, W) in [0, 1].

    weight_mode 'global': channel weights = mean grad over (T', H', W')
    (torch path, grad_cam_videos.py:98); 'per_frame': mean over (H', W')
    per timestep (TF path, mask/gradcam.py:102).
    """
    if weight_mode == "per_frame":
        weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # (T',1,1,C)
    else:
        weights = jnp.mean(grads, axis=(0, 1, 2), keepdims=True)  # (1,1,1,C)
    cam = jnp.maximum(jnp.sum(weights * activation, axis=-1), 0.0)  # (T',H',W')

    # spatial upsample to input resolution (reference: cv2.resize bilinear)
    cam = jax.image.resize(
        cam, (cam.shape[0], spatial_size[0], spatial_size[1]), "bilinear"
    )
    # temporal re-upsample by integer repeats (grad_cam_videos.py:112-126)
    step = clip_len // cam.shape[0]
    cam = jnp.repeat(cam, step, axis=0)

    # (the reference divides unguarded and NaNs when the CAM is all-zero —
    # e.g. every channel weight negative; we emit zeros instead)
    if normalize_per_frame:
        mn = jnp.min(cam, axis=(1, 2), keepdims=True)
        mx = jnp.max(cam - mn, axis=(1, 2), keepdims=True)
        return jnp.where(mx > 0, (cam - mn) / mx, 0.0)
    mn = jnp.min(cam)
    mx = jnp.max(cam - mn)
    return jnp.where(mx > 0, (cam - mn) / mx, 0.0)


def grad_cam(
    features_fn: Callable[[jax.Array], jax.Array],
    head_fn: Callable[[jax.Array], jax.Array],
    clip: jax.Array,
    target_index: jax.Array | None = None,
    normalize_per_frame: bool = False,
    weight_mode: str = "global",
) -> Tuple[jax.Array, jax.Array]:
    """Grad-CAM for one clip (T, H, W, C).

    features_fn: clip -> target activation (T', H', W', C)
    head_fn: activation -> class scores (num_classes,)
    target_index: class to explain; None = predicted argmax
    (grad_cam_videos.py:70-71).

    Returns (cam (T, H, W) in [0,1], class scores).
    """
    activation = features_fn(clip)
    scores = head_fn(activation)
    if target_index is None:
        target_index = jnp.argmax(scores)
    grads = jax.grad(lambda a: head_fn(a)[target_index])(activation)
    cam = cam_from_activation(
        activation,
        grads,
        clip.shape[0],
        (clip.shape[1], clip.shape[2]),
        normalize_per_frame,
        weight_mode,
    )
    return cam, scores


def grad_cam_batched(
    features_fn: Callable[[jax.Array], jax.Array],
    head_fn: Callable[[jax.Array], jax.Array],
    clips: jax.Array,
    targets: jax.Array,
    normalize_per_frame: bool = False,
    weight_mode: str = "global",
) -> Tuple[jax.Array, jax.Array]:
    """vmapped Grad-CAM over a leading clip axis (targets required —
    pass argmax scores for the reference's 'guessed' mode). Returns
    (cams (B, T, H, W), scores (B, C))."""

    def one(clip, target):
        return grad_cam(
            features_fn, head_fn, clip, target, normalize_per_frame, weight_mode
        )

    return jax.vmap(one)(clips, targets)


def i3d_grad_cam_fns(model, variables, endpoint: str = "Mixed_5c"):
    """(features_fn, head_fn) pair for an ivf_tpu I3D model — single-clip
    versions (add/strip the batch dim internally)."""

    def features_fn(clip):
        return model.apply(
            variables, clip[None], method=model.features_to, endpoint=endpoint
        )[0]

    def head_fn(act):
        return model.apply(
            variables, act[None], method=model.head_from, endpoint=endpoint
        )[0]

    return features_fn, head_fn


def convlstm_grad_cam(
    model,
    variables,
    clip: jax.Array,
    target_index: jax.Array | None = None,
    normalize_per_frame: bool = False,
    weight_mode: str = "per_frame",
):
    """Grad-CAM for the ConvLSTM classifier via the feature_offset
    zero-perturbation (see models/convlstm.py). clip: (T, H, W, C)."""
    feats = model.apply(variables, clip[None], method=model.features)[0]
    zero = jnp.zeros_like(feats)

    def scores_with_offset(off):
        return model.apply(variables, clip[None], feature_offset=off[None])[0]

    scores = scores_with_offset(zero)
    if target_index is None:
        target_index = jnp.argmax(scores)
    grads = jax.grad(lambda off: scores_with_offset(off)[target_index])(zero)
    cam = cam_from_activation(
        feats,
        grads,
        clip.shape[0],
        (clip.shape[1], clip.shape[2]),
        normalize_per_frame,
        weight_mode,
    )
    return cam, scores
