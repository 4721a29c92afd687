"""Guided backpropagation — custom-VJP ReLU instead of autograd hooks.

Mirrors the vendored ``pytorch-grad-cam/grad-cam.py`` GuidedBackpropReLU
(lines 147-205): forward is plain ReLU; backward passes gradient only where
BOTH the forward input and the incoming gradient are positive. The torch
version monkey-patches module backward hooks; here it is a
``jax.custom_vjp`` primitive the model opts into (``I3D(guided_relu=True)``
— same variables, identical forward, guided backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def guided_relu(x):
    return jnp.maximum(x, 0.0)


def _guided_relu_fwd(x):
    return jnp.maximum(x, 0.0), x


def _guided_relu_bwd(x, g):
    return (jnp.where((x > 0) & (g > 0), g, 0.0),)


guided_relu.defvjp(_guided_relu_fwd, _guided_relu_bwd)


def guided_backprop_i3d(variables, clip, target_index, **i3d_kwargs):
    """Input-space saliency for one clip (T, H, W, C) via guided backprop
    through an I3D (GuidedBackpropReLUModel.__call__, grad-cam.py:165-205).

    Returns the gradient of the target class score w.r.t. the input.
    """
    from ivf_tpu.models.i3d import I3D

    i3d_kwargs.setdefault("guided_relu", True)
    model = I3D(**i3d_kwargs)

    def score(c):
        return model.apply(variables, c[None], train=False)[0, target_index]

    return jax.grad(score)(clip)
