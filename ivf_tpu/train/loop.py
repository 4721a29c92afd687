"""Training / evaluation loops — jitted steps + host orchestration.

Replaces the reference's four hand-rolled loops (train_i3d_smth.py,
train_i3d_kth32.py, train_clstm_kth.py, TF train_kth.py / train_smth.py)
with ONE jitted ``train_step`` / ``eval_step`` pair:

  * loss: 'cross_entropy' (torch CrossEntropyLoss on logits / TF
    softmax_cross_entropy_with_logits) or 'nll_on_probs' — the torch half's
    ``soft_max=1`` path feeds *raw softmax probabilities* to NLLLoss
    (train_i3d_smth.py:117-120), i.e. loss = mean(-p[target]); reproduced
    verbatim as an option.
  * BatchNorm running stats update through the mutable 'batch_stats'
    collection; dropout via a per-step folded rng.
  * data parallelism: batches placed with a ``('data',)`` sharding (see
    parallel/mesh.py) — XLA inserts the gradient reductions over ICI;
    there is no DataParallel-style host scatter/gather.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp

from ivf_tpu.train.metrics import AverageMeter, topk_accuracy
from ivf_tpu.train.state import TrainState


def _compute_loss(logits: jax.Array, labels: jax.Array, loss_type: str):
    if loss_type == "cross_entropy":
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    if loss_type == "nll_on_probs":
        # reference behavior: model outputs softmax probs, NLLLoss applied
        # directly to them (not their log)
        return -jnp.mean(jnp.take_along_axis(logits, labels[:, None], axis=1))
    raise ValueError(f"unknown loss_type {loss_type}")


def _kernel_l2_penalty(params, coeff: float) -> jax.Array:
    """lambda * sum(w^2) over ConvLSTM input kernels ('wx') — the Keras
    ``kernel_regularizer=l2(lambda)`` term the TF blocks feed into the loss
    (video_features_tf/models/clstm.py:21, configs kernel_regularizer=0.01).
    Keras l2 has no 1/2 factor and applies to the input kernel only."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if getattr(path[-1], "key", None) == "wx":
            total = total + jnp.sum(jnp.square(leaf))
    return coeff * total


def _cast_f32(tree, dtype):
    """Cast every f32 leaf to ``dtype`` (non-f32 leaves — ints, counters —
    pass through untouched)."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        tree,
    )


def make_train_step(
    loss_type: str = "cross_entropy",
    donate: bool = True,
    kernel_l2: float = 0.0,
    compute_dtype: str = "float32",
):
    """``compute_dtype='bfloat16'`` = mixed-precision training (beyond
    reference — it has none): the forward/backward runs on bf16 casts of
    the params and clips, while the MASTER params, optimizer state, BN
    running statistics, loss, and gradients all stay float32 (the cast is
    differentiable, so cotangents land back in f32 on the f32 leaves). No
    loss scaling is needed: bf16 keeps f32's exponent range. The kernel-L2
    penalty reads the f32 master params."""
    bf16 = compute_dtype == "bfloat16"

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(
        state: TrainState, clips: jax.Array, labels: jax.Array, rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        # loaders ship uint8 over PCIe (4x fewer bytes); cast on device.
        # 0..255 is exact in bf16 (8 significand bits cover integers <=256)
        if clips.dtype == jnp.uint8:
            clips = clips.astype(jnp.bfloat16 if bf16 else jnp.float32)
        elif bf16 and clips.dtype == jnp.float32:
            clips = clips.astype(jnp.bfloat16)
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {
                "params": _cast_f32(params, jnp.bfloat16) if bf16 else params
            }
            has_stats = state.batch_stats is not None
            if has_stats:
                # running stats stay f32 across steps; the model's update
                # math promotes as needed and the merged result is re-cast
                # below in case the model computed it in bf16
                variables["batch_stats"] = state.batch_stats
            if has_stats:
                logits, updated = state.apply_fn(
                    variables,
                    clips,
                    train=True,
                    rngs={"dropout": step_rng},
                    mutable=["batch_stats"],
                )
            else:
                logits = state.apply_fn(
                    variables, clips, train=True, rngs={"dropout": step_rng}
                )
                updated = {}
            loss = _compute_loss(logits.astype(jnp.float32), labels, loss_type)
            if kernel_l2:
                loss = loss + _kernel_l2_penalty(params, kernel_l2)
            new_stats = updated.get("batch_stats")
            if bf16 and new_stats is not None:
                new_stats = jax.tree.map(
                    lambda a: a.astype(jnp.float32)
                    if hasattr(a, "dtype") and a.dtype == jnp.bfloat16
                    else a,
                    new_stats,
                )
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        top1, top5 = topk_accuracy(logits, labels, (1, 5))
        return new_state, {"loss": loss, "top1": top1, "top5": top5}

    return train_step


def make_eval_step(
    loss_type: str = "cross_entropy", compute_dtype: str = "float32"
):
    bf16 = compute_dtype == "bfloat16"

    @jax.jit
    def eval_step(
        state: TrainState, clips: jax.Array, labels: jax.Array
    ) -> Dict[str, jax.Array]:
        if clips.dtype == jnp.uint8:
            clips = clips.astype(jnp.bfloat16 if bf16 else jnp.float32)
        elif bf16 and clips.dtype == jnp.float32:
            clips = clips.astype(jnp.bfloat16)
        variables = state.variables()
        if bf16:
            variables = _cast_f32(variables, jnp.bfloat16)
        logits = state.apply_fn(variables, clips, train=False).astype(
            jnp.float32
        )
        loss = _compute_loss(logits, labels, loss_type)
        top1, top5 = topk_accuracy(logits, labels, (1, 5))
        return {"loss": loss, "top1": top1, "top5": top5, "logits": logits}

    return eval_step


def train_epoch(
    state: TrainState,
    loader: Iterable,
    train_step: Callable,
    rng: jax.Array,
    print_freq: int = 0,
    max_steps: Optional[int] = None,
    skip_steps: int = 0,
    step_offset: int = 0,
    step_callback: Optional[Callable[[TrainState, int], None]] = None,
) -> Tuple[TrainState, Dict[str, float]]:
    """One epoch over ``loader`` yielding (clips, labels) device-ready
    batches. Returns (state, epoch metrics).

    Mid-epoch resume support: ``skip_steps`` discards the loader's first
    batches (the fallback when the loader can't skip at the index level —
    ClipLoader.set_epoch does it for free); ``step_offset`` is how many
    batches of this epoch an upstream mechanism already handled, so
    ``step_callback(state, done_in_epoch)`` sees the true in-epoch batch
    count for periodic mid-epoch checkpoints."""
    meters = {k: AverageMeter() for k in ("loss", "top1", "top5", "batch_time")}
    # Defer metric fetches: a float() per step blocks the host on every
    # step's completion, serializing dispatch and defeating the loader's
    # prefetch overlap (worst on high-dispatch-latency backends). Device
    # scalars are held and drained in bulk at print points / epoch end.
    pend = []

    def _drain():
        for m, n in pend:
            vals = jax.device_get(m)
            meters["loss"].update(float(vals["loss"]), n)
            meters["top1"].update(float(vals["top1"]), n)
            meters["top5"].update(float(vals["top5"]), n)
        pend.clear()

    t_epoch = time.time()
    steps = 0
    for i, (clips, labels) in enumerate(loader):
        if i < skip_steps:
            continue  # already trained before the mid-epoch checkpoint
        if max_steps is not None and steps >= max_steps:
            break
        state, metrics = train_step(state, clips, labels, rng)
        pend.append((metrics, clips.shape[0]))
        steps += 1
        if (print_freq and i % print_freq == 0) or len(pend) >= 64:
            _drain()
            if print_freq and i % print_freq == 0:
                dt = (time.time() - t_epoch) / steps
                print(
                    f"  step {i}: loss {meters['loss'].avg:.4f} "
                    f"top1 {meters['top1'].avg:.2f} "
                    f"({dt:.3f}s/batch)"
                )
        if step_callback is not None:
            step_callback(state, step_offset + steps)
    _drain()
    if steps:
        meters["batch_time"].update((time.time() - t_epoch) / steps, steps)
    return state, {k: m.avg for k, m in meters.items()}


def _host_value(x):
    """Materialize an array on this host. On multi-host runtimes a
    data-sharded global array is not fully addressable — gather it (every
    host gets the full value, so prediction dumps are whole either way);
    the single-process path is a plain np.asarray."""
    import numpy as np

    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def evaluate(
    state: TrainState,
    loader: Iterable,
    eval_step: Callable,
    max_steps: Optional[int] = None,
    collect_predictions: bool = False,
    top_k: int = 5,
):
    """Validation pass; optionally collects (y_true, y_hat, top-k, default 5)
    like inference_kth.py:154-178. ``top_k`` widens the collected prediction
    matrix (cfg.model.top_k > 5 must not be silently truncated)."""
    meters = {k: AverageMeter() for k in ("loss", "top1", "top5")}
    y_true, y_hat, y_hat_top5 = [], [], []
    for i, (clips, labels) in enumerate(loader):
        if max_steps is not None and i >= max_steps:
            break
        metrics = eval_step(state, clips, labels)
        n = clips.shape[0]
        for k in ("loss", "top1", "top5"):
            meters[k].update(float(metrics[k]), n)
        if collect_predictions:
            import numpy as np

            logits = _host_value(metrics["logits"])
            y_true.append(_host_value(labels))
            y_hat.append(logits.argmax(-1))
            y_hat_top5.append(np.argsort(-logits, axis=-1)[:, :top_k])
    out = {k: m.avg for k, m in meters.items()}
    if collect_predictions:
        import numpy as np

        out["y_true"] = np.concatenate(y_true)
        out["y_hat"] = np.concatenate(y_hat)
        out["y_hat_top5"] = np.concatenate(y_hat_top5)
    return out


def fit(
    state: TrainState,
    train_loader_fn: Callable[[], Iterable],
    val_loader_fn: Callable[[], Iterable],
    num_epochs: int,
    loss_type: str = "cross_entropy",
    scheduler=None,
    checkpointer=None,
    rng: Optional[jax.Array] = None,
    print_freq: int = 0,
    last_lr: float = 0.0,
    max_steps_per_epoch: Optional[int] = None,
    plotter=None,
    kernel_l2: float = 0.0,
    start_epoch: int = 0,
    best_loss: float = float("inf"),
    checkpoint_every_steps: int = 0,
    start_batch_offset: int = 0,
    compute_dtype: str = "float32",
) -> Tuple[TrainState, list]:
    """Epoch orchestration mirroring train_i3d_smth.main (33-189): train,
    validate, plateau-LR step, plot, checkpoint best-on-val-loss; stops
    early when lr decays below ``last_lr`` (train_i3d_smth.py:156-158).
    ``start_epoch``/``best_loss`` come from a resumed checkpoint — the
    epoch loop is range(start_epoch, num_epochs) exactly as the reference
    (train_i3d_smth.py:150-152).

    Preemption safety (beyond-reference): ``checkpoint_every_steps`` > 0
    additionally checkpoints mid-epoch every N train batches (pair with
    ``Checkpointer(async_save=True)`` so the save never blocks the step
    loop); ``start_batch_offset`` (from a mid-epoch restore) fast-forwards
    the first epoch's loader past the already-trained prefix — order is
    deterministic because ClipLoader shuffles by (seed, epoch). Metrics
    for a resumed epoch cover only its remainder."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    train_step = make_train_step(
        loss_type, kernel_l2=kernel_l2, compute_dtype=compute_dtype
    )
    eval_step = make_eval_step(loss_type, compute_dtype=compute_dtype)
    try:
        return _fit_epochs(
            state,
            train_loader_fn,
            val_loader_fn,
            num_epochs,
            train_step,
            eval_step,
            scheduler,
            checkpointer,
            rng,
            print_freq,
            last_lr,
            max_steps_per_epoch,
            plotter,
            start_epoch,
            best_loss,
            checkpoint_every_steps,
            start_batch_offset,
        )
    finally:
        if checkpointer is not None and hasattr(
            checkpointer, "wait_until_finished"
        ):
            # async_save: the in-flight write and its deferred best-copy
            # must land even on an abnormal exit (an epoch raising after a
            # best save would otherwise leave model_best stale)
            checkpointer.wait_until_finished()


def _fit_epochs(
    state,
    train_loader_fn,
    val_loader_fn,
    num_epochs,
    train_step,
    eval_step,
    scheduler,
    checkpointer,
    rng,
    print_freq,
    last_lr,
    max_steps_per_epoch,
    plotter,
    start_epoch,
    best_loss,
    checkpoint_every_steps=0,
    start_batch_offset=0,
):
    from ivf_tpu.train.optim import get_learning_rate, set_learning_rate

    history = []
    for epoch in range(start_epoch, num_epochs):
        lr_now = get_learning_rate(state.opt_state)
        if last_lr and lr_now < last_lr:
            print(f" > stopping: lr {lr_now} < last_lr {last_lr}")
            break
        train_loader = train_loader_fn()
        offset = start_batch_offset if epoch == start_epoch else 0
        skip = offset
        if hasattr(train_loader, "set_epoch"):
            # deterministic (seed, epoch) order + free index-level skip
            train_loader.set_epoch(epoch, skip_batches=offset)
            skip = 0
        step_cb = None
        if checkpointer is not None and checkpoint_every_steps:

            def step_cb(s, done_in_epoch, _epoch=epoch):
                if done_in_epoch % checkpoint_every_steps == 0:
                    checkpointer.save(
                        s,
                        _epoch,
                        is_best=False,
                        best_loss=best_loss,
                        batch_offset=done_in_epoch,
                    )

        state, train_metrics = train_epoch(
            state,
            train_loader,
            train_step,
            rng,
            print_freq,
            max_steps_per_epoch,
            skip_steps=skip,
            step_offset=offset,
            step_callback=step_cb,
        )
        val_metrics = evaluate(
            state, val_loader_fn(), eval_step, max_steps_per_epoch
        )
        if scheduler is not None:
            if getattr(scheduler, "monitor", "loss") == "accuracy":
                monitored = val_metrics["top1"] / 100.0
            else:
                monitored = val_metrics["loss"]
            new_lr = scheduler.step(monitored)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, new_lr)
            )
        record = {
            "epoch": epoch,
            "lr": lr_now,
            "train": train_metrics,
            "val": val_metrics,
        }
        history.append(record)
        print(
            f" > epoch {epoch}: train loss {train_metrics['loss']:.4f} "
            f"val loss {val_metrics['loss']:.4f} "
            f"val top1 {val_metrics['top1']:.2f}"
        )
        if plotter is not None:
            plotter.plot(
                {
                    "loss": train_metrics["loss"],
                    "val_loss": val_metrics["loss"],
                    "acc": train_metrics["top1"] / 100.0,
                    "val_acc": val_metrics["top1"] / 100.0,
                    "learning_rate": lr_now,
                }
            )
        if checkpointer is not None:
            is_best = val_metrics["loss"] < best_loss
            best_loss = min(val_metrics["loss"], best_loss)
            checkpointer.save(state, epoch, is_best=is_best, best_loss=best_loss)
    return state, history
