"""Preemption-safe mid-epoch checkpointing (beyond-reference; the
reference has no failure-recovery story at all, SURVEY.md §5).

The core guarantee: interrupt training mid-epoch, restore the mid-epoch
checkpoint, resume — and land on EXACTLY the parameters an uninterrupted
run produces. This holds because (a) the optimizer state, BN stats and
step counter are all in the checkpoint, (b) the per-step dropout rng is
folded by state.step (train/loop.py), and (c) batch order is a pure
function of (seed, epoch) with an index-level fast-forward
(ClipLoader.set_epoch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ivf_tpu.models.cnn3d import CNN3D
from ivf_tpu.train import build_optimizer, create_train_state, fit
from ivf_tpu.utils.checkpoint import Checkpointer


def _data():
    rng = np.random.RandomState(0)
    batches = []
    for b in range(4):
        clips = jnp.asarray(rng.rand(4, 4, 32, 32, 3).astype(np.float32))
        labels = jnp.asarray((rng.randint(0, 3, 4)).astype(np.int32))
        batches.append((clips, labels))
    return batches


def _fresh_state():
    model = CNN3D(num_classes=3, dropout_rate=0.0)
    return create_train_state(
        model,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        build_optimizer("sgd", 0.05, momentum=0.9),
    )


@pytest.mark.slow
def test_mid_epoch_resume_matches_uninterrupted(tmp_path):
    batches = _data()
    val = [batches[0]]
    rng = jax.random.PRNGKey(42)

    # ---- run A: uninterrupted, 2 epochs x 4 batches
    state_a, _ = fit(
        _fresh_state(), lambda: batches, lambda: val, num_epochs=2, rng=rng
    )

    # ---- run B: preempted after 2 batches of epoch 0, then resumed
    ckpt = Checkpointer(str(tmp_path / "run"), async_save=True)
    calls = {"n": 0}

    def interrupted_loader():
        calls["n"] += 1
        if calls["n"] == 1:

            def gen():
                yield batches[0]
                yield batches[1]
                raise KeyboardInterrupt("preempted")

            return gen()
        return batches

    with pytest.raises(KeyboardInterrupt):
        fit(
            _fresh_state(),
            interrupted_loader,
            lambda: val,
            num_epochs=2,
            rng=rng,
            checkpointer=ckpt,
            checkpoint_every_steps=2,
        )

    # the mid-epoch checkpoint landed (fit's finally barrier) and resumes
    # epoch 0 at batch 2
    restored, start_epoch, best, offset = ckpt.restore(_fresh_state())
    assert (start_epoch, offset) == (0, 2)
    assert int(restored.step) == 2

    state_b, history = fit(
        restored,
        lambda: batches,
        lambda: val,
        num_epochs=2,
        rng=rng,
        checkpointer=ckpt,
        checkpoint_every_steps=2,
        start_epoch=start_epoch,
        best_loss=best,
        start_batch_offset=offset,
    )
    assert len(history) == 2  # the resumed epoch 0 + epoch 1

    # exact parameter equality with the uninterrupted run
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        state_a.params,
        state_b.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        state_a.batch_stats,
        state_b.batch_stats,
    )
    assert int(state_a.step) == int(state_b.step) == 8


class _IndexDataset:
    def __len__(self):
        return 32

    def __getitem__(self, i):
        return np.full((2, 4, 4, 3), i, np.uint8), i


def test_clip_loader_set_epoch_deterministic_and_skips():
    from ivf_tpu.data import ClipLoader

    loader = ClipLoader(
        _IndexDataset(),
        batch_size=4,
        shuffle=True,
        seed=3,
        to_device=False,
        use_native=False,
    )
    loader.set_epoch(5)
    full = [np.asarray(labels) for _, labels in loader]
    loader.set_epoch(5)
    again = [np.asarray(labels) for _, labels in loader]
    for a, b in zip(full, again):
        np.testing.assert_array_equal(a, b)  # (seed, epoch)-deterministic

    # index-level fast-forward: same order minus the skipped prefix
    loader.set_epoch(5, skip_batches=3)
    tail = [np.asarray(labels) for _, labels in loader]
    assert len(tail) == len(full) - 3
    for a, b in zip(full[3:], tail):
        np.testing.assert_array_equal(a, b)

    # the skip is consumed by that single iteration only
    loader.set_epoch(5)
    assert len(list(loader)) == len(full)

    # different epochs reshuffle
    loader.set_epoch(6)
    other = [np.asarray(labels) for _, labels in loader]
    assert any(
        not np.array_equal(a, b) for a, b in zip(full, other)
    )
