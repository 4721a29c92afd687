"""Train-loop tests: optimizer parity vs torch, smoke training on synthetic
data, plateau schedules, checkpoint round-trip, 8-device data parallelism."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ivf_tpu.models import CNN3D, ConvLSTMClassifier
from ivf_tpu.parallel import get_mesh, shard_batch, replicate
from ivf_tpu.train import (
    ReduceLROnPlateau,
    PatienceHalving,
    build_optimizer,
    create_train_state,
    evaluate,
    fit,
    make_eval_step,
    make_train_step,
    topk_accuracy,
)
from ivf_tpu.train.optim import get_learning_rate, set_learning_rate


def test_topk_accuracy_matches_reference_semantics():
    logits = jnp.asarray(
        [[0.1, 0.9, 0.0, 0.0], [0.8, 0.1, 0.05, 0.05], [0.0, 0.0, 0.3, 0.7]]
    )
    labels = jnp.asarray([1, 2, 2])
    top1, top2 = topk_accuracy(logits, labels, (1, 2))
    np.testing.assert_allclose(float(top1), 100.0 / 3)
    np.testing.assert_allclose(float(top2), 200.0 / 3)


@pytest.mark.parametrize("name", ["sgd", "adam"])
def test_optimizer_parity_vs_torch(name):
    """Same quadratic objective, same hyperparams: trajectories match."""
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    lr, momentum, wd = 0.1, 0.9, 0.01

    wt = torch.tensor(w0, requires_grad=True)
    if name == "sgd":
        opt_t = torch.optim.SGD([wt], lr=lr, momentum=momentum, weight_decay=wd)
    else:
        opt_t = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    for _ in range(12):
        loss = (wt**2).sum()
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()

    tx = build_optimizer(name, lr, momentum=momentum, weight_decay=wd)
    wj = jnp.asarray(w0)
    opt_state = tx.init(wj)
    grad_fn = jax.grad(lambda w: jnp.sum(w**2))
    for _ in range(12):
        g = grad_fn(wj)
        updates, opt_state = tx.update(g, opt_state, wj)
        wj = wj + jax.tree.map(lambda u: u, updates)
    np.testing.assert_allclose(
        np.asarray(wj), wt.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_lr_injection():
    tx = build_optimizer("adam", 0.01)
    state = tx.init(jnp.zeros(3))
    assert get_learning_rate(state) == pytest.approx(0.01)
    old = state
    state = set_learning_rate(state, 0.005)
    assert get_learning_rate(state) == pytest.approx(0.005)
    # copy-on-write: aliases of the old state (best-state snapshots, history
    # entries) must keep their LR (code-review regression)
    assert get_learning_rate(old) == pytest.approx(0.01)


@pytest.mark.parametrize("name", ["momentum", "momentum_decoupled"])
def test_momentum_decoupled_wd_matches_tf_contrib(name):
    """Both reference spellings are tf.contrib's DecoupledWeightDecayExtension
    over MomentumOptimizer (train_kth.py:142-166): w -= wd*w then
    w -= lr*(m = mu*m + g). Decay bypasses the momentum buffer and is NOT
    scaled by lr (code-review regression: it was coupled / lr-scaled)."""
    lr, mu, wd = 0.1, 0.9, 0.01
    w_ref = np.array([1.0, -2.0, 3.0], np.float32)
    m_ref = np.zeros_like(w_ref)
    tx = build_optimizer(name, lr, momentum=mu, weight_decay=wd)
    wj = jnp.asarray(w_ref)
    opt_state = tx.init(wj)
    grad_fn = jax.grad(lambda w: jnp.sum(jnp.sin(w)))
    for _ in range(10):
        g = np.cos(w_ref)  # grad of sum(sin(w)), at PRE-decay weights
        w_ref = w_ref - wd * w_ref  # tf.contrib applies decay first
        m_ref = mu * m_ref + g
        w_ref = w_ref - lr * m_ref
        updates, opt_state = tx.update(grad_fn(wj), opt_state, wj)
        wj = wj + updates
    np.testing.assert_allclose(np.asarray(wj), w_ref, rtol=1e-5, atol=1e-6)
    # halving the lr must NOT halve the effective weight decay: with a zero
    # gradient and empty momentum buffer the whole update IS the decay term
    for lr_probe in (lr, lr / 2):
        fresh = set_learning_rate(tx.init(wj), lr_probe)
        updates, _ = tx.update(jnp.zeros(3), fresh, wj)
        np.testing.assert_allclose(
            np.asarray(updates), -wd * np.asarray(wj), rtol=1e-6
        )


def test_reduce_lr_on_plateau_torch_semantics():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
    lrs = [s.step(m) for m in [1.0, 0.9, 0.9, 0.9, 0.9, 0.8, 0.8, 0.8, 0.8]]
    # epochs 2,3,4 are bad (0.9 not better) -> reduce after 3rd bad
    assert lrs[:4] == [1.0, 1.0, 1.0, 1.0]
    assert lrs[4] == 0.5


def test_patience_halving():
    s = PatienceHalving(lr=0.1, patience=2, lr_end=1e-3)
    out = [s.step(m) for m in [0.5, 0.5, 0.5, 0.6, 0.6, 0.6]]
    assert out[2] == 0.05  # two bad epochs after the best
    assert out[-1] == 0.025


def _synthetic_clips(n, t=4, hw=16, c=3, classes=3, seed=0):
    """Class-separable synthetic clips: class k has brightness ~ k."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, classes, n)
    clips = rng.randn(n, t, hw, hw, c).astype(np.float32) * 0.1
    clips += labels[:, None, None, None, None].astype(np.float32)
    return clips, labels.astype(np.int32)


def _batches(clips, labels, bs):
    for i in range(0, len(clips), bs):
        yield jnp.asarray(clips[i : i + bs]), jnp.asarray(labels[i : i + bs])


@pytest.mark.slow
def test_train_smoke_loss_decreases():
    model = ConvLSTMClassifier(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(3,),
        batch_norm=True,
    )
    clips, labels = _synthetic_clips(32)
    tx = build_optimizer("adam", 0.01)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    train_step = make_train_step()
    rng = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(4):
        for clips_b, labels_b in _batches(clips, labels, 8):
            state, metrics = train_step(state, clips_b, labels_b, rng)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    # batch_stats were updated
    assert state.batch_stats is not None

    eval_step = make_eval_step()
    res = evaluate(
        state, _batches(clips, labels, 8), eval_step, collect_predictions=True
    )
    assert res["top1"] > 50.0
    assert res["y_true"].shape == (32,)
    # 3 classes < top-5: the collected matrix clamps to num_classes
    assert res["y_hat_top5"].shape == (32, 3)


@pytest.mark.slow
def test_fit_with_scheduler_and_checkpoint(tmp_path):
    from ivf_tpu.utils.checkpoint import Checkpointer

    model = CNN3D(num_classes=3, dropout_rate=0.0)
    clips, labels = _synthetic_clips(16, t=4, hw=32)
    tx = build_optimizer("sgd", 0.05, momentum=0.9)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    ckpt = Checkpointer(str(tmp_path / "run"))
    sched = ReduceLROnPlateau(lr=0.05)
    state, history = fit(
        state,
        lambda: _batches(clips, labels, 8),
        lambda: _batches(clips, labels, 8),
        num_epochs=2,
        scheduler=sched,
        checkpointer=ckpt,
        print_freq=0,
    )
    assert len(history) == 2
    assert ckpt.exists("checkpoint") and ckpt.exists("model_best")

    # restore round-trip
    state2 = create_train_state(
        model, jax.random.PRNGKey(9), jnp.asarray(clips[:2]), tx
    )
    restored, start_epoch, best_loss, _ = ckpt.restore(state2)
    assert start_epoch == 2
    assert best_loss == min(h["val"]["loss"] for h in history)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )

    # partial restore skipping the classifier head (class-count transfer)
    state3 = create_train_state(
        model, jax.random.PRNGKey(11), jnp.asarray(clips[:2]), tx
    )
    fresh_fc = jax.tree.map(np.asarray, state3.params["fc"])
    restored3, _, _, _ = ckpt.restore(state3, skip_logits=True)
    np.testing.assert_allclose(
        np.asarray(restored3.params["fc"]["kernel"]), fresh_fc["kernel"]
    )


def test_evaluate_top_k_width():
    """cfg.model.top_k > 5 must widen the collected prediction matrix, not
    silently truncate to 5 columns (code-review regression)."""
    model = CNN3D(num_classes=8, dropout_rate=0.0)
    clips, labels = _synthetic_clips(8, classes=8)
    tx = build_optimizer("sgd", 0.01)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    res = evaluate(
        state,
        _batches(clips, labels, 4),
        make_eval_step(),
        collect_predictions=True,
        top_k=7,
    )
    assert res["y_hat_top5"].shape == (8, 7)


def test_get_mesh_rejects_oversubscription():
    """Requesting more devices than visible must fail loudly — a silently
    downsized mesh breaks the caller's per-device batch math."""
    with pytest.raises(AssertionError):
        get_mesh(jax.device_count() + 1)


def test_restore_skip_logits_across_class_counts(tmp_path):
    """Class-count transfer (the reference's resume path,
    train_i3d_smth.py:60-92): restore a 4-class checkpoint into a 2-class
    model with skip_logits=True, then take a training step. The opt_state
    must be the FRESH one — orbax restores stored shapes regardless of the
    template, so keeping the checkpoint's Adam moments (shaped for 4
    classes) would crash at the first update."""
    from ivf_tpu.utils.checkpoint import Checkpointer

    clips, labels = _synthetic_clips(4, classes=2)
    tx = build_optimizer("adam", 0.01)

    big = CNN3D(num_classes=4, dropout_rate=0.0)
    state_big = create_train_state(
        big, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    ckpt = Checkpointer(str(tmp_path / "run"))
    ckpt.save(state_big, epoch=0)

    small = CNN3D(num_classes=2, dropout_rate=0.0)
    state_small = create_train_state(
        small, jax.random.PRNGKey(7), jnp.asarray(clips[:2]), tx
    )
    fresh_fc = jax.tree.map(np.asarray, state_small.params["fc"])
    restored, _, _, _ = ckpt.restore(state_small, skip_logits=True)
    # head kept fresh (2-class), trunk taken from the checkpoint
    np.testing.assert_allclose(
        np.asarray(restored.params["fc"]["kernel"]), fresh_fc["kernel"]
    )
    trunk_key = next(k for k in restored.params if k != "fc")
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params[trunk_key])[0]),
        np.asarray(jax.tree.leaves(state_big.params[trunk_key])[0]),
    )
    # one optimizer update must succeed (stale 4-class moments would throw)
    train_step = make_train_step(donate=False)
    restored, metrics = train_step(
        restored, jnp.asarray(clips), jnp.asarray(labels), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_data_parallel_8_devices_matches_single():
    """Same batch, sharded over the 8-device mesh vs single device: identical
    loss and updates (XLA collectives == DataParallel semantics)."""
    assert jax.device_count() >= 8
    model = ConvLSTMClassifier(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(3,),
        batch_norm=False,
    )
    clips, labels = _synthetic_clips(16)
    tx = build_optimizer("adam", 0.01)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    train_step = make_train_step(donate=False)
    rng = jax.random.PRNGKey(1)

    mesh = get_mesh(8)
    state_r = replicate(state, mesh)
    clips_s, labels_s = shard_batch(
        (jnp.asarray(clips), jnp.asarray(labels)), mesh
    )
    new_sharded, m_sharded = train_step(state_r, clips_s, labels_s, rng)
    new_single, m_single = train_step(
        state, jnp.asarray(clips), jnp.asarray(labels), rng
    )
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        new_sharded.params,
        new_single.params,
    )


def test_multislice_data_parallel_matches_single():
    """2-slice x 4-chip hierarchical mesh: batch sharded over BOTH axes
    gives the identical loss/updates as single device — the multi-slice
    (DCN) data-parallel mode; the hierarchical all-reduce is implied by
    the mesh axis ordering."""
    from ivf_tpu.parallel import get_multislice_mesh, multislice_sharding

    assert jax.device_count() >= 8
    model = ConvLSTMClassifier(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(3,),
        batch_norm=False,
    )
    clips, labels = _synthetic_clips(16)
    tx = build_optimizer("adam", 0.01)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    train_step = make_train_step(donate=False)
    rng = jax.random.PRNGKey(1)

    mesh = get_multislice_mesh(2, 4)
    state_r = replicate(state, mesh)
    sh = multislice_sharding(mesh)
    clips_s = jax.device_put(jnp.asarray(clips), sh)
    labels_s = jax.device_put(jnp.asarray(labels), sh)
    new_sharded, m_sharded = train_step(state_r, clips_s, labels_s, rng)
    new_single, m_single = train_step(
        state, jnp.asarray(clips), jnp.asarray(labels), rng
    )
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        new_sharded.params,
        new_single.params,
    )


@pytest.mark.slow
def test_spatial_model_parallel_i3d_matches_single():
    """H-axis (model) sharding over a 2x4 mesh == single device (GSPMD
    inserts the conv halo exchanges)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ivf_tpu.models import i3d_smth
    from ivf_tpu.parallel import get_2d_mesh, spatial_sharding

    assert jax.device_count() >= 8
    # model axis 2 with 128^2 input: H reaches 128/32 = 4 at Mixed_5 -> 2
    # rows/device. One-row-per-device shards are degenerate under GSPMD
    # (wrong values observed) — see parallel/mesh.py constraint note.
    mesh = get_2d_mesh(4, 2)
    model = i3d_smth(num_classes=6, dropout_rate=0.0, pool_shape=(2, 4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(1), x[:1])
    ref = model.apply(v, x)
    x_sh = jax.device_put(x, spatial_sharding(mesh))
    v_sh = jax.tree.map(lambda a: jax.device_put(a, NamedSharding(mesh, P())), v)
    out = jax.jit(lambda v, x: model.apply(v, x))(v_sh, x_sh)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_tensor_parallel_i3d_matches_single():
    """Megatron-style TP via GSPMD kernel-channel sharding
    (parallel/mesh.py::tensor_parallel_variables): output matches the
    single-device forward on a 2x4 data x model mesh."""
    import jax

    from ivf_tpu.models import i3d_smth
    from ivf_tpu.parallel import get_2d_mesh, shard_batch, tensor_parallel_variables

    model = i3d_smth(num_classes=8, dropout_rate=0.0, pool_shape=(2, 2, 2))
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (4, 16, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init)(rng, clips[:1])
    ref = model.apply(v, clips, train=False)

    mesh = get_2d_mesh(2, 4)
    v_tp = tensor_parallel_variables(v, mesh)
    clips_s = shard_batch(clips, mesh)
    out = jax.jit(lambda v, c: model.apply(v, c, train=False))(v_tp, clips_s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=1e-4
    )


@pytest.mark.slow
def test_checkpoint_restore_tolerates_missing_best_loss(tmp_path):
    """v0.1.0 checkpoints were written without 'best_loss'; restore() must
    not break --resume on them (ADVICE r2): it retries without the key and
    defaults best_loss to inf."""
    import orbax.checkpoint as ocp

    from ivf_tpu.utils.checkpoint import Checkpointer

    model = CNN3D(num_classes=3, dropout_rate=0.0)
    clips, _labels = _synthetic_clips(4, t=4, hw=32)
    tx = build_optimizer("sgd", 0.05)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    # hand-write a legacy checkpoint WITHOUT best_loss
    legacy = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": 3,
        "step": state.step,
    }
    path = str(tmp_path / "run" / "checkpoint")
    saver = ocp.StandardCheckpointer()
    saver.save(path, legacy)
    saver.wait_until_finished()

    ckpt = Checkpointer(str(tmp_path / "run"))
    state2 = create_train_state(
        model, jax.random.PRNGKey(5), jnp.asarray(clips[:2]), tx
    )
    restored, start_epoch, best_loss, _ = ckpt.restore(state2)
    assert start_epoch == 4
    assert best_loss == float("inf")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )


def test_pipeline_harness_matches_sequential():
    """GPipe harness (parallel/pipeline.py): heterogeneous-shape stages over
    a 4-device 'stage' mesh == sequential composition. Exercises the flat
    activation buffer (stages change both width and rank), the lax.switch
    stage dispatch, the ppermute ring, and the bubble ticks."""
    from ivf_tpu.parallel import get_mesh
    from ivf_tpu.parallel.pipeline import pipeline_apply, stage_io_shapes

    assert jax.device_count() >= 4
    mesh = get_mesh(4, axis_name="stage")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    w1 = jax.random.normal(ks[0], (6, 10)) * 0.3  # widen
    w2 = jax.random.normal(ks[1], (10, 3)) * 0.3  # shrink
    w3 = jax.random.normal(ks[2], (12, 5)) * 0.3  # consumed after reshape

    stages = [
        lambda x: jnp.tanh(x @ w1),  # (mb,6) -> (mb,10)
        lambda x: jnp.concatenate([x @ w2, x[:, :1]], -1),  # -> (mb,4)
        lambda x: (x[:, None, :] * x[:, :, None]).reshape(x.shape[0], -1)[
            :, :12
        ],  # rank bump + flatten -> (mb,12)
        lambda x: jax.nn.softmax(x @ w3, -1),  # -> (mb,5)
    ]
    x = jax.random.normal(ks[3], (8, 6))
    ref = x
    for f in stages:
        ref = f(ref)

    shapes = stage_io_shapes(stages, (1, 6))
    assert [s.shape for s in shapes] == [
        (1, 6), (1, 10), (1, 4), (1, 12), (1, 5)
    ]
    for n_micro in (4, 8):  # minimum bubble and mb=1 cases
        out = pipeline_apply(stages, x, mesh, n_micro=n_micro)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7
        )


@pytest.mark.slow
def test_pipeline_parallel_i3d_matches_single():
    """4-stage I3D pipeline (trunk split at endpoint boundaries + head stage)
    over the 'stage' mesh axis matches the single-device forward."""
    from ivf_tpu.models import i3d_smth
    from ivf_tpu.parallel import get_mesh
    from ivf_tpu.parallel.pipeline import i3d_stage_fns, pipeline_apply

    assert jax.device_count() >= 4
    model = i3d_smth(num_classes=8, dropout_rate=0.0, pool_shape=(2, 2, 2))
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (8, 16, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init)(rng, clips[:1])
    ref = model.apply(v, clips, train=False)

    mesh = get_mesh(4, axis_name="stage")
    stages = i3d_stage_fns(model, v, 4)
    out = jax.jit(
        lambda x: pipeline_apply(stages, x, mesh, n_micro=8)
    )(clips)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=1e-5
    )


def test_pipeline_apply_is_differentiable():
    """Gradients flow through the GPipe schedule (shard_map + scan + switch
    + ppermute): input AND parameter grads match the sequential composition,
    so the harness supports pipelined training, not just inference."""
    from ivf_tpu.parallel import get_mesh
    from ivf_tpu.parallel.pipeline import pipeline_apply

    assert jax.device_count() >= 4
    mesh = get_mesh(4, axis_name="stage")
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    ws = [jax.random.normal(k, (8, 8)) * 0.3 for k in ks[:4]]
    stages = [lambda x, w=w: jnp.tanh(x @ w) for w in ws]
    x = jax.random.normal(ks[4], (8, 8))

    def seq_loss(x, w0):
        h = jnp.tanh(x @ w0)
        for f in stages[1:]:
            h = f(h)
        return jnp.sum(h**2)

    def pp_loss(x, w0):
        st = [lambda a: jnp.tanh(a @ w0)] + stages[1:]
        return jnp.sum(pipeline_apply(st, x, mesh, n_micro=4) ** 2)

    gx_s, gw_s = jax.grad(seq_loss, argnums=(0, 1))(x, ws[0])
    gx_p, gw_p = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(x, ws[0])
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_step_bf16_mixed_precision_learns_and_keeps_f32_master():
    """Mixed-precision training (compute_dtype='bfloat16', beyond
    reference): the step computes fwd/bwd on bf16 casts but the MASTER
    params, optimizer state, and BN running stats must remain float32
    throughout; the loss still decreases on the separable synthetic set;
    a bf16-eval of the trained state agrees with f32 eval on accuracy."""
    model = ConvLSTMClassifier(
        num_classes=3,
        nb_lstm_units=4,
        lstm_layers=1,
        conv_kernel_size=3,
        effective_steps=(3,),
        batch_norm=True,
    )
    clips, labels = _synthetic_clips(32)
    tx = build_optimizer("adam", 0.01)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.asarray(clips[:2]), tx
    )
    train_step = make_train_step(compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(1)
    losses = []
    for _epoch in range(4):
        for clips_b, labels_b in _batches(clips, labels, 8):
            state, metrics = train_step(state, clips_b, labels_b, rng)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

    def _dtypes(tree):
        return {
            str(leaf.dtype)
            for leaf in jax.tree.leaves(tree)
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        }

    assert _dtypes(state.params) == {"float32"}
    assert _dtypes(state.batch_stats) == {"float32"}
    assert _dtypes(state.opt_state) == {"float32"}

    res16 = evaluate(
        state,
        _batches(clips, labels, 8),
        make_eval_step(compute_dtype="bfloat16"),
    )
    res32 = evaluate(state, _batches(clips, labels, 8), make_eval_step())
    assert res16["top1"] > 50.0
    assert abs(res16["top1"] - res32["top1"]) <= 25.0  # same model, coarser math


def test_train_step_bf16_uint8_clips_cast_once():
    """uint8 loader batches cast straight to bf16 on device under mixed
    precision (0..255 is bf16-exact), and the step runs end to end."""
    model = CNN3D(num_classes=2, dropout_rate=0.0)
    rng = np.random.RandomState(0)
    clips = rng.randint(0, 255, (4, 4, 32, 32, 3)).astype(np.uint8)
    labels = np.array([0, 1, 0, 1], np.int32)
    tx = build_optimizer("adam", 0.001)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        tx,
    )
    step = make_train_step(compute_dtype="bfloat16")
    state, metrics = step(
        state, jnp.asarray(clips), jnp.asarray(labels), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.params)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    )
