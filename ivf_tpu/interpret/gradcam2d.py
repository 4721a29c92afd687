"""Generic 2D Grad-CAM + guided backprop — the vendored library's surface.

Functional JAX restatement of the reference's vendored
``pytorch-grad-cam/grad-cam.py``:

  * ``GradCam.__call__`` (grad-cam.py:96-145) — forward to a target layer,
    backprop the chosen class score to it, CAM = ReLU(sum_c w_c * A_c) with
    channel weights w = spatial mean of the gradients, bilinear resize to
    the input size, min-max normalize. The torch version walks
    ``model.features._modules`` and registers hooks; here the split is two
    pure functions (``features_fn``, ``head_fn``) — any model that exposes a
    trunk/head split works (I3D's ``features_to``/``head_from``, the
    ConvLSTM's ``features``, or an arbitrary user model).
  * ``GuidedBackpropReLUModel`` (grad-cam.py:165-205) — the torch version
    mutates the model, swapping every ReLU module for GuidedBackpropReLU;
    here the model opts in via the ``guided_relu`` custom-VJP activation
    (``interpret/guided_backprop.py``) and this module differentiates the
    score w.r.t. the input.
  * ``preprocess_image`` (grad-cam.py:74-87) / ``show_cam_on_image``
    (grad-cam.py:89-94) / the ``cam * gb`` combination of the ``__main__``
    driver (grad-cam.py:254-258).

Unlike the original (fixed batch-1, numpy post-processing), everything here
is jittable and vmappable; arrays are channels-last ``(H, W, C)``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEANS = (0.485, 0.456, 0.406)
IMAGENET_STDS = (0.229, 0.224, 0.225)


def preprocess_image(img: np.ndarray, bgr: bool = True) -> jnp.ndarray:
    """(H, W, 3) float image in [0, 1] -> normalized (H, W, 3).

    Mirrors grad-cam.py:74-87: channel flip (the reference's images come
    from cv2, i.e. BGR; pass ``bgr=False`` for RGB input), ImageNet
    mean/std. We keep channels-last instead of the torch CHW transpose.
    """
    img = np.asarray(img, np.float32)
    if bgr:
        img = img[:, :, ::-1]
    mean = np.asarray(IMAGENET_MEANS, np.float32)
    std = np.asarray(IMAGENET_STDS, np.float32)
    return jnp.asarray((img - mean) / std)


def grad_cam_image(
    features_fn: Callable[[jax.Array], jax.Array],
    head_fn: Callable[[jax.Array], jax.Array],
    image: jax.Array,
    target_index: jax.Array | None = None,
    output_size: Tuple[int, int] | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Grad-CAM for one image (H, W, C) (GradCam.__call__, grad-cam.py:109-145).

    features_fn: image -> activation (H', W', C'); head_fn: activation ->
    class scores. ``target_index=None`` explains the predicted class.
    Returns (cam (H, W) in [0, 1], scores).
    """
    activation = features_fn(image)
    scores = head_fn(activation)
    if target_index is None:
        target_index = jnp.argmax(scores)
    grads = jax.grad(lambda a: head_fn(a)[target_index])(activation)
    weights = jnp.mean(grads, axis=(0, 1), keepdims=True)  # (1, 1, C')
    cam = jnp.maximum(jnp.sum(weights * activation, axis=-1), 0.0)
    if output_size is None:
        output_size = (image.shape[0], image.shape[1])
    cam = jax.image.resize(cam, output_size, "bilinear")
    mn = jnp.min(cam)
    mx = jnp.max(cam - mn)
    # the reference divides unguarded (NaN when the CAM is all-zero); we
    # emit zeros — same deliberate deviation as interpret/gradcam.py
    return jnp.where(mx > 0, (cam - mn) / mx, 0.0), scores


def guided_backprop_image(
    score_fn: Callable[[jax.Array], jax.Array],
    image: jax.Array,
    target_index: jax.Array | None = None,
) -> jax.Array:
    """Input-space guided-backprop saliency for one image
    (GuidedBackpropReLUModel.__call__, grad-cam.py:181-205).

    ``score_fn`` must be a forward pass whose ReLUs are the ``guided_relu``
    custom-VJP primitive (e.g. any flax model built with
    ``activation=guided_relu``; ``I3D(guided_relu=True)`` for video).
    Returns d score[target] / d image, shape (H, W, C).
    """
    scores = score_fn(image)
    if target_index is None:
        target_index = jnp.argmax(scores)
    return jax.grad(lambda x: score_fn(x)[target_index])(image)


def combine_cam_gb(cam: jax.Array, gb: jax.Array) -> jax.Array:
    """cam (H, W) x guided-backprop map (H, W, C) -> masked saliency,
    the reference __main__'s ``cam_gb`` product (grad-cam.py:254-258)."""
    return cam[..., None] * gb


def show_cam_on_image(
    img: np.ndarray, mask: np.ndarray, path: str = "cam.jpg"
) -> np.ndarray:
    """JET-heatmap blend + write (grad-cam.py:89-94). img: (H, W, 3) RGB in
    [0, 1]; mask: (H, W) in [0, 1]. Returns the blended uint8 image."""
    from PIL import Image

    from ivf_tpu.viz.render import _apply_jet

    heatmap = _apply_jet(np.asarray(mask))[:, :, ::-1].astype(np.float32) / 255
    cam = heatmap + np.asarray(img, np.float32)
    cam = cam / max(float(np.max(cam)), 1e-12)
    out = np.uint8(255 * cam)
    Image.fromarray(out).save(path)
    return out
