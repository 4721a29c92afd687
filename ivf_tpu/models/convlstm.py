"""ConvLSTM video classifier, TPU-native Flax implementation.

One model family covering both reference implementations:
  * torch ``models/convolution_lstm.py`` + ``models/CLSTM_4.py`` — peephole
    terms are zero constants (never trained) so they are elided; per-step
    block order is dropout -> batchnorm -> maxpool with ONE BatchNorm
    instance shared across all layers and timesteps (the reference quirk at
    convolution_lstm.py:85,120-123 — reproduced by default via
    ``shared_bn=True``; set False for a sane per-layer BN),
  * TF ``models/clstm.py`` — Keras ConvLSTM2D blocks with per-block
    max/avg TimeDistributed pooling and BN *after* pooling
    (``block_order='tf'``), FC head over the last timestep or the whole
    sequence, plus the ``clstm_gap`` temporal-GAP + 1x1x1-conv head
    (``head='gap'``).

The recurrence runs as a compile-time-unrolled loop over the (static,
16-32 frame) clip length; each step is two fused convs + one fused gate
block (see ops/convlstm_cell.py). Throughput scaling comes from vmap/
data-sharding over clips, not from the time axis (SURVEY.md §5).

Grad-CAM targets: the full per-timestep output sequence of the last layer
(``clstm_output`` in TF, find_mask_*'s gradcam target) is sown as
``intermediates/clstm_output`` and also returned by ``features``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ivf_tpu.models.layers import TorchBatchNorm
from ivf_tpu.ops.conv import avg_pool2d_valid, max_pool2d_valid
from ivf_tpu.ops.convlstm_cell import convlstm_cell_step


class ConvLSTMCell(nn.Module):
    """Single cell; params fused in (i,f,c,o) gate order.

    ``recurrent_activation='hard_sigmoid'`` + ``unit_forget_bias=True``
    reproduce the Keras ConvLSTM2D gate semantics of the TF model family
    (video_features_tf/models/clstm.py:21-50). Spatial padding follows the
    family: ``x_padding='torch'`` (symmetric (k-1)//2) for the torch
    models, ``x_padding='valid'`` for the Keras blocks (the TF configs use
    padding='valid'); the recurrent conv is SAME-padded in both, exactly
    as Keras does (see ops/convlstm_cell.py)."""

    hidden_channels: int
    kernel_size: Tuple[int, int] | int = 5  # may be rectangular, e.g. (3, 5)
    conv_stride: int = 1
    use_pallas: bool = False
    recurrent_activation: str = "sigmoid"  # sigmoid | hard_sigmoid
    unit_forget_bias: bool = False  # Keras default: forget-gate bias = 1
    x_padding: str = "torch"  # torch (symmetric same-ish) | valid (Keras)

    @nn.compact
    def __call__(self, x, h, c):
        cin, ch = x.shape[-1], self.hidden_channels
        k1, k2 = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        wx = self.param(
            "wx",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k1, k2, cin, 4 * ch),
        )
        if self.unit_forget_bias:
            bias_init = lambda key, shape, dtype=jnp.float32: (
                jnp.zeros(shape, dtype).at[ch : 2 * ch].set(1.0)
            )
        else:
            bias_init = nn.initializers.zeros
        bx = self.param("bx", bias_init, (4 * ch,))
        wh = self.param(
            "wh",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k1, k2, ch, 4 * ch),
        )
        return convlstm_cell_step(
            x,
            h,
            c,
            wx,
            bx,
            wh,
            self.conv_stride,
            self.use_pallas,
            self.recurrent_activation,
            self.x_padding,
        )


class ConvLSTM(nn.Module):
    """Multi-layer ConvLSTM over a clip (reference convolution_lstm.py:63-132).

    Input ``(B, T, H, W, C)``. Returns ``(effective_outputs, clstm_output)``:
      * ``effective_outputs``: (n_eff, B, H', W', C') block outputs (post
        pool) at ``effective_steps`` of the last layer,
      * ``clstm_output``: (B, T, H'', W'', C') full pre-pool hidden sequence
        of the last layer — the Grad-CAM target.
    """

    hidden_channels: Tuple[int, ...]
    kernel_size: Tuple[int, int] | int = 5
    conv_stride: int = 1
    pool_kernel: Tuple[int, int] = (2, 2)
    effective_steps: Tuple[int, ...] = ()
    batch_norm: bool = True
    shared_bn: bool = True  # reference quirk: one BN for all layers/steps
    pooling: str = "max"  # 'max' | 'avg'
    block_order: str = "torch"  # 'torch': drop->bn->pool ; 'tf': pool->bn
    dropout_rate: float = 0.0
    use_pallas: bool = False
    recurrent_activation: str = "sigmoid"
    unit_forget_bias: bool = False
    x_padding: str = "torch"  # torch | valid (Keras padding='valid')
    # nn.scan recurrence (one compiled step body, O(1) HLOs in T) vs the
    # compile-time-unrolled loop (O(T) HLOs). Unrolled is the default: on
    # the bench TPU it is ~40% faster at steady state (204 vs 145 train
    # clips/s; 326 vs 217 mask-steps/s at batch 16) and the scan path's
    # gradient fails to compile at production mask-search batches (>=32) —
    # remat is then forced, and its per-step body recompute IS the measured
    # gap (PERF.md round 3). scan remains the right choice for long-T
    # compile-size protection (ModelConfig.clstm_scan='auto' picks per T).
    use_scan: bool = False
    remat: bool = False  # rematerialize carries in the scan body

    def setup(self):
        self.cells = [
            ConvLSTMCell(
                ch,
                self.kernel_size,
                self.conv_stride,
                self.use_pallas,
                self.recurrent_activation,
                self.unit_forget_bias,
                self.x_padding,
            )
            for ch in self.hidden_channels
        ]
        if self.batch_norm:
            if self.block_order == "tf":
                # tf.layers.batch_normalization defaults (clstm.py:49)
                bn_eps, bn_mom = 1e-3, 0.01
            else:
                # torch BatchNorm2d defaults (convolution_lstm.py:85)
                bn_eps, bn_mom = 1e-5, 0.1
            if self.shared_bn:
                self.bn = TorchBatchNorm(eps=bn_eps, momentum=bn_mom)
            else:
                self.bns = [
                    TorchBatchNorm(eps=bn_eps, momentum=bn_mom)
                    for _ in self.hidden_channels
                ]
        if self.dropout_rate:
            # one Dropout per layer (the reference shares a single instance,
            # convolution_lstm.py:87 — stateless, so per-layer is identical)
            self.dropouts = [
                nn.Dropout(self.dropout_rate) for _ in self.hidden_channels
            ]

    def _pool(self, x):
        if self.pooling == "avg":
            return avg_pool2d_valid(x, self.pool_kernel)
        return max_pool2d_valid(x, self.pool_kernel)

    def _block_tail(self, x, layer: int, train: bool):
        """Post-cell per-step processing for one layer."""
        if self.block_order == "tf":
            x = self._pool(x)
            if self.batch_norm:
                bn = self.bn if self.shared_bn else self.bns[layer]
                x = bn(x, train=train)
            return x
        if self.dropout_rate:
            x = self.dropouts[layer](x, deterministic=not train)
        if self.batch_norm:
            bn = self.bn if self.shared_bn else self.bns[layer]
            x = bn(x, train=train)
        return self._pool(x)

    def __call__(
        self,
        clip: jax.Array,
        train: bool = False,
        feature_offset: Optional[jax.Array] = None,
    ):
        """``feature_offset`` (B, T, H'', W'', C'), when given, is added to the
        last layer's per-step hidden output *after* the recurrence reads it —
        so ``d logits / d feature_offset`` at zeros equals the reference's
        ``tf.gradients(y_c, clstm_output)`` (mask/gradcam.py:49), which flows
        through the pooling/dense consumers but not back through time."""
        b, t = clip.shape[0], clip.shape[1]
        n_layers = len(self.hidden_channels)
        effective = list(self.effective_steps) or [t - 1]
        # normalize ONCE so scan and unrolled stay bit-identical: the
        # reference's `if step in effective_step` collection (CLSTM_4 /
        # convolution_lstm.py) is time-ordered, deduplicated, and silently
        # skips steps beyond the clip — indexing block_outs[s] raw would
        # instead reorder/duplicate/trace-fail under scan
        effective = sorted({s for s in effective if 0 <= s < t}) or [t - 1]

        # per-layer zero states with statically computed spatial dims:
        # the cell conv uses torch padding p=(k-1)//2 (or none for 'valid'),
        # so out = (s + 2p - k)//stride + 1; the block tail then VALID-pools
        # by pool_kernel (out = s//pk for stride=pk windows)
        k1, k2 = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        if self.x_padding == "valid":
            p1, p2 = 0, 0
        else:
            p1, p2 = (k1 - 1) // 2, (k2 - 1) // 2
        carry = []
        h_sp, w_sp = clip.shape[2], clip.shape[3]
        for ch in self.hidden_channels:
            hh = (h_sp + 2 * p1 - k1) // self.conv_stride + 1
            ww = (w_sp + 2 * p2 - k2) // self.conv_stride + 1
            zeros = jnp.zeros((b, hh, ww, ch), clip.dtype)
            carry.append((zeros, zeros))
            h_sp = (hh - self.pool_kernel[0]) // self.pool_kernel[0] + 1
            w_sp = (ww - self.pool_kernel[1]) // self.pool_kernel[1] + 1
        carry = tuple(carry)

        if self.use_scan:
            def body(mdl, states, xs):
                x, offset_t = xs
                new_states = []
                h_eff = None
                for i, cell in enumerate(mdl.cells):
                    h, c = cell(x, *states[i])
                    new_states.append((h, c))
                    h_eff = h
                    if i == n_layers - 1 and offset_t is not None:
                        h_eff = h + offset_t
                    x = mdl._block_tail(h_eff, i, train)
                return tuple(new_states), (x, h_eff)

            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            if train and self.batch_norm:
                # running stats update per timestep, sequentially — the
                # stats are threaded through the scan as a carried collection
                var_kwargs = dict(
                    variable_broadcast="params",
                    variable_carry="batch_stats",
                )
            else:
                var_kwargs = dict(
                    variable_broadcast=("params", "batch_stats")
                )
            scan = nn.scan(
                body,
                in_axes=0,
                out_axes=0,
                split_rngs={"params": False, "dropout": True},
                **var_kwargs,
            )
            xs_clip = jnp.swapaxes(clip, 0, 1)  # (T, B, H, W, C)
            offs = (
                jnp.swapaxes(feature_offset, 0, 1)
                if feature_offset is not None
                else None
            )
            _, (block_outs, clstm_seq) = scan(self, carry, (xs_clip, offs))
            effective_outputs = jnp.stack(
                [block_outs[s] for s in effective], axis=0
            )
            clstm_output = jnp.swapaxes(clstm_seq, 0, 1)  # (B, T, ...)
            block_seq = jnp.swapaxes(block_outs, 0, 1)  # (B, T, H', W', C)
        else:
            states = list(carry)
            outputs = []
            clstm_seq = []
            block_list = []
            for step in range(t):
                x = clip[:, step]
                for i, cell in enumerate(self.cells):
                    h, c = cell(x, *states[i])
                    states[i] = (h, c)
                    h_eff = h
                    if i == n_layers - 1:
                        if feature_offset is not None:
                            h_eff = h + feature_offset[:, step]
                        clstm_seq.append(h_eff)
                    x = self._block_tail(h_eff, i, train)
                block_list.append(x)
                if step in effective:
                    outputs.append(x)
            effective_outputs = jnp.stack(outputs, axis=0)
            clstm_output = jnp.stack(clstm_seq, axis=1)  # (B, T, ...)
            block_seq = jnp.stack(block_list, axis=1)  # (B, T, H', W', C)
        self.sow("intermediates", "clstm_output", clstm_output)
        return effective_outputs, clstm_output, block_seq


class ConvLSTMClassifier(nn.Module):
    """Classifier head over the ConvLSTM stack.

    ``head='fc'`` mirrors torch CLSTM_4.Model (CLSTM_4.py:38-85) and the TF
    ``clstm`` dense head (models/clstm.py:111-120): flatten the last
    effective-step output (or the concat of all effective steps when
    ``use_entire_seq``) into a dense layer.
    ``head='gap'`` mirrors TF ``clstm_gap`` (models/clstm.py:54-84):
    temporal avg-pool over the full sequence then a 1x1 conv to classes.
    """

    num_classes: int = 174
    nb_lstm_units: int = 32
    lstm_layers: int = 4
    conv_kernel_size: Tuple[int, int] | int = 5
    conv_stride: int = 1
    pool_kernel: Tuple[int, int] = (2, 2)
    effective_steps: Tuple[int, ...] = (4, 8, 12, 15)
    batch_norm: bool = True
    shared_bn: bool = True
    pooling: str = "max"
    block_order: str = "torch"
    dropout_rate: float = 0.0
    use_entire_seq: bool = False
    add_softmax: bool = False
    head: str = "fc"  # 'fc' | 'gap'
    hidden_channels_override: Optional[Tuple[int, ...]] = None
    recurrent_activation: str = "sigmoid"
    unit_forget_bias: bool = False
    x_padding: str = "torch"
    use_scan: bool = False  # see ConvLSTM.use_scan for the measured rationale
    remat: bool = False
    use_pallas: bool = False  # fused gate math via ops/pallas/fused_gates

    def setup(self):
        hidden = self.hidden_channels_override or (
            (self.nb_lstm_units,) * self.lstm_layers
        )
        self.clstm = ConvLSTM(
            hidden_channels=hidden,
            kernel_size=self.conv_kernel_size,
            conv_stride=self.conv_stride,
            pool_kernel=self.pool_kernel,
            effective_steps=self.effective_steps,
            batch_norm=self.batch_norm,
            shared_bn=self.shared_bn,
            pooling=self.pooling,
            block_order=self.block_order,
            dropout_rate=self.dropout_rate,
            recurrent_activation=self.recurrent_activation,
            unit_forget_bias=self.unit_forget_bias,
            x_padding=self.x_padding,
            use_scan=self.use_scan,
            remat=self.remat,
            use_pallas=self.use_pallas,
        )
        if self.head == "fc":
            self.end_fc = nn.Dense(self.num_classes)
        else:
            self.gap_conv = nn.Dense(self.num_classes)  # 1x1x1 conv == dense

    def __call__(
        self,
        clip: jax.Array,
        train: bool = False,
        feature_offset: Optional[jax.Array] = None,
    ) -> jax.Array:
        outputs, clstm_output, block_seq = self.clstm(
            clip, train=train, feature_offset=feature_offset
        )
        if self.head == "gap":
            # temporal GAP over the BLOCK-output sequence — the features
            # after TimeDistributed pooling + batch_normalization, exactly
            # what clstm_gap's avg_pool3d consumes (clstm.py:72-82) — then
            # the 1x1 conv head. Spatial GAP replaces the reference's
            # trailing reshape (which only typechecks at 1x1 spatial).
            feats = jnp.mean(block_seq, axis=1)  # (B, H', W', C)
            feats = jnp.mean(feats, axis=(1, 2))  # spatial GAP
            out = self.gap_conv(feats)
        else:
            if self.use_entire_seq:
                feats = jnp.reshape(
                    jnp.moveaxis(outputs, 0, 1), (clip.shape[0], -1)
                )
            else:
                feats = jnp.reshape(outputs[-1], (clip.shape[0], -1))
            out = self.end_fc(feats)
        if self.add_softmax:
            out = jax.nn.softmax(out, axis=-1)
        return out

    def features(self, clip: jax.Array, train: bool = False) -> jax.Array:
        """Grad-CAM target: the last layer's full pre-pool hidden sequence."""
        _, clstm_output, _ = self.clstm(clip, train=train)
        return clstm_output
