"""Optimizer zoo — the union of both reference halves' optimizers.

torch half (train_i3d_smth.py:128-134): SGD(momentum, coupled L2 wd),
Adam(coupled L2 wd). TF half (train_kth.py:142-185): adam, sgd, adadelta,
momentum, momentum with decoupled weight decay (tf.contrib.opt
MomentumW / extend_with_decoupled_weight_decay).

All optimizers are built with ``optax.inject_hyperparams`` so the learning
rate lives in the optimizer state and the plateau schedulers can adjust it
between epochs without re-jitting the train step.
"""

from __future__ import annotations

import optax


def _coupled_wd(weight_decay: float):
    """torch-style L2: grad += wd * param (applied before the update rule)."""
    if weight_decay and weight_decay > 0:
        return [optax.add_decayed_weights(weight_decay)]
    return []


def build_optimizer(
    name: str,
    lr: float,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """name: sgd | adam | adadelta | momentum | momentum_decoupled.

    'sgd' and 'adam' follow the torch half (coupled L2 weight decay);
    'momentum'/'momentum_decoupled'/'adadelta' follow the TF half. The TF
    'sgd' (no momentum, no wd) is 'sgd' with momentum=0, weight_decay=0.
    """
    key = name.lower()

    @optax.inject_hyperparams
    def make(learning_rate):
        if key == "sgd":
            chain = _coupled_wd(weight_decay)
            if momentum:
                chain.append(optax.trace(decay=momentum))
            chain.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*chain)
        if key == "adam":
            chain = _coupled_wd(weight_decay)
            chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            chain.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*chain)
        if key == "adadelta":
            return optax.chain(
                optax.scale_by_adadelta(),
                optax.scale_by_learning_rate(learning_rate),
            )
        if key in ("momentum", "momentum_decoupled"):
            # Both reference spellings are tf.contrib's DECOUPLED decay
            # (train_kth.py:142-166: 'momentum' w/ wd>0 -> MomentumWOptimizer,
            # 'momentum_decoupled' -> extend_with_decoupled_weight_decay):
            # w <- w - wd*w - lr*m. The decay bypasses the momentum buffer
            # AND is NOT scaled by lr (unlike torch/optax AdamW convention),
            # so LR-halving schedules leave the regularization strength
            # unchanged — hence add_decayed_weights(-wd) AFTER the lr scale.
            chain = [
                optax.trace(decay=momentum),
                optax.scale_by_learning_rate(learning_rate),
            ]
            if weight_decay and weight_decay > 0:
                chain.append(optax.add_decayed_weights(-weight_decay))
            return optax.chain(*chain)
        raise ValueError(f"Unknown optimizer '{name}'")

    return make(lr)


def set_learning_rate(opt_state, lr: float):
    """Return a copy of ``opt_state`` with the injected learning rate
    replaced — copy-on-write, so aliases of the old state (best-state
    snapshots, history entries) keep their original LR."""
    import jax
    import jax.numpy as jnp

    old = opt_state.hyperparams["learning_rate"]
    new = jnp.asarray(lr, old.dtype)
    if isinstance(old, jax.Array) and hasattr(old, "sharding"):
        # keep the old value's placement: the train state is replicated
        # over the global mesh, and a bare jnp scalar is host-local
        # (SingleDeviceSharding) — orbax refuses to serialize host-local
        # arrays under jax.process_count()>1 (caught by the real 2-process
        # test, tests/test_multihost_real.py)
        new = jax.device_put(new, old.sharding)
    return opt_state._replace(
        hyperparams={
            **opt_state.hyperparams,
            "learning_rate": new,
        }
    )


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
