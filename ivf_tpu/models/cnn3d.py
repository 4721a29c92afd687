"""Plain 5-block 3D CNN (the TF half's ``--model cnn_3d`` option).

Mirrors ``video_features_tf/models/cnn_3d.py`` block-for-block: conv3d(SAME)
-> BN -> ReLU stacks with spatial stride-2 downsampling per block, a
temporal SAME avg-pool in block2, channel-mean "GAP" (the reference reduces
over the *channel* axis, cnn_3d.py:78 — reproduced faithfully), flatten,
dense. The reference file depends on undefined globals ``FLAGS`` /
``NUM_CLASSES`` (SURVEY.md §2.4); here they are proper fields.

Note the reference applies dropout with ``training=True`` unconditionally
(cnn_3d.py:12,27,45,63) — we gate it on ``train`` like a sane model, since
always-on eval dropout is one of the catalogued defects, not intent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from ivf_tpu.models.layers import Unit3D


class CNN3D(nn.Module):
    num_classes: int = 6
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def conv_bn_relu(x, filters, kernel, strides, name):
            return Unit3D(
                filters, kernel, strides, use_batch_norm=True, name=name
            )(x, train)

        drop = lambda x, i: nn.Dropout(self.dropout_rate, name=f"drop{i}")(
            x, deterministic=not train
        )

        x = conv_bn_relu(x, 32, (3, 5, 5), (1, 2, 2), "block1_conv1")
        x = drop(x, 1)

        x = conv_bn_relu(x, 64, (3, 3, 3), (1, 1, 1), "block2_conv1")
        x = conv_bn_relu(x, 128, (3, 3, 3), (1, 2, 2), "block2_conv2")
        # temporal SAME avg-pool k=3 s=2 (cnn_3d.py:25-26)
        summed = lax.reduce_window(
            x,
            0.0,
            lax.add,
            window_dimensions=(1, 3, 1, 1, 1),
            window_strides=(1, 2, 1, 1, 1),
            padding="SAME",
        )
        counts = lax.reduce_window(
            jnp.ones_like(x),
            0.0,
            lax.add,
            window_dimensions=(1, 3, 1, 1, 1),
            window_strides=(1, 2, 1, 1, 1),
            padding="SAME",
        )
        x = summed / counts
        x = drop(x, 2)

        x = conv_bn_relu(x, 128, (3, 3, 3), (1, 1, 1), "block3_conv1")
        x = conv_bn_relu(x, 128, (3, 3, 3), (1, 1, 1), "block3_conv2")
        x = conv_bn_relu(x, 256, (3, 3, 3), (1, 2, 2), "block3_conv3")
        x = drop(x, 3)

        x = conv_bn_relu(x, 256, (3, 3, 3), (1, 1, 1), "block4_conv1")
        x = conv_bn_relu(x, 256, (3, 3, 3), (1, 1, 1), "block4_conv2")
        x = conv_bn_relu(x, 512, (3, 3, 3), (1, 2, 2), "block4_conv3")
        x = drop(x, 4)

        x = conv_bn_relu(x, 512, (3, 3, 3), (1, 1, 1), "block5_conv1")
        x = conv_bn_relu(x, 512, (3, 3, 3), (1, 2, 2), "block5_conv2")

        x = jnp.mean(x, axis=-1)  # channel-mean, faithful to cnn_3d.py:78
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="fc")(x)
