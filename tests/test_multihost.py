"""Multi-host layer (parallel/multihost.py) + async checkpointing.

Single-process (process_count == 1) is the identity case these tests pin
exactly; the index math and global-array assembly are additionally
exercised at simulated process counts (the shard selection is pure Python,
so fake process_index/process_count cover the multi-host split without a
multi-process launch — the same strategy SURVEY.md §4 sets for mesh tests).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ivf_tpu.parallel.multihost import (
    ShardedDataset,
    global_device_batch,
    initialize,
    process_shard,
)


def test_process_shard_disjoint_balanced_covering():
    for n in (0, 1, 7, 8, 25, 1000):
        for count in (1, 2, 3, 8):
            shards = [process_shard(n, i, count) for i in range(count)]
            flat = [idx for s in shards for idx in s]
            assert flat == list(range(n))  # disjoint + covering + ordered
            sizes = [len(s) for s in shards]
            assert max(sizes) - min(sizes) <= 1  # balanced
            # even=True: EXACTLY equal shards (drop the tail remainder) —
            # the SPMD requirement: a +1 shard can cross a batch boundary
            # and give one process an extra collective step (deadlock)
            even = [process_shard(n, i, count, even=True) for i in range(count)]
            assert len({len(s) for s in even}) == 1
            assert [idx for s in even for idx in s] == list(
                range(n - n % count)
            )
    with pytest.raises(ValueError):
        process_shard(10, 3, 3)


def test_process_shard_defaults_to_jax_process():
    # single-process runtime: the default shard is everything
    assert list(process_shard(5)) == [0, 1, 2, 3, 4]
    assert initialize() is False  # no coordinator configured -> no-op


class _ToyDataset:
    def __init__(self, n):
        self.n = n
        self.catalog = "sentinel"

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        clip = np.full((2, 4, 4, 3), i, np.uint8)
        return clip, i % 3

    def get_payloads(self, i):
        return [b"payload%d" % i], i % 3


class _ToyDatasetNoPayloads:
    def __len__(self):
        return 4

    def __getitem__(self, i):
        return np.zeros((2, 4, 4, 3), np.uint8), 0


def test_sharded_dataset_views_disjoint_slices():
    ds = _ToyDataset(10)
    # default even=True: equal shards for SPMD (3,3,3 — item 9 dropped)
    even_parts = [ShardedDataset(ds, i, 3) for i in range(3)]
    assert [len(p) for p in even_parts] == [3, 3, 3]
    # even=False: balanced cover for independent per-process drivers
    parts = [ShardedDataset(ds, i, 3, even=False) for i in range(3)]
    assert [len(p) for p in parts] == [4, 3, 3]
    seen = []
    for p in parts:
        for j in range(len(p)):
            clip, label = p[j]
            seen.append(int(clip[0, 0, 0, 0]))
    assert seen == list(range(10))
    # native-decode hook forwards with shard-local indices
    payloads, _ = parts[1].get_payloads(0)
    assert payloads == [b"payload4"]
    # attribute pass-through (catalog metadata)
    assert parts[0].catalog == "sentinel"
    # hasattr contract: no get_payloads on the view when the inner dataset
    # lacks it (ClipLoader feature-detects native decode via hasattr)
    assert not hasattr(ShardedDataset(_ToyDatasetNoPayloads(), 0, 2), "get_payloads")


def test_global_device_batch_single_process_equals_device_put():
    from ivf_tpu.parallel import data_sharding, get_mesh

    mesh = get_mesh(8)
    clips = np.arange(8 * 2 * 4, dtype=np.float32).reshape(8, 2, 4)
    labels = np.arange(8, dtype=np.int32)
    ids = ["a", "b"]  # non-array leaves stay host-side
    g_clips, g_labels, g_ids = global_device_batch((clips, labels, ids), mesh)
    ref = jax.device_put(clips, data_sharding(mesh))
    assert g_ids is ids
    assert g_clips.sharding == ref.sharding
    np.testing.assert_array_equal(np.asarray(g_clips), clips)
    np.testing.assert_array_equal(np.asarray(g_labels), labels)
    # and a jitted SPMD reduction over the global array works
    total = jax.jit(lambda x: jnp.sum(x))(g_clips)
    assert float(total) == float(clips.sum())


def test_clip_loader_global_batch_path_via_sharded_dataset():
    """ClipLoader(mesh=...) over a ShardedDataset: on this single-process
    runtime the global array equals the plain sharded batch, which pins the
    multi-host assembly path end-to-end (process_count>1 takes the same
    code through global_device_batch)."""
    from ivf_tpu.data import ClipLoader
    from ivf_tpu.parallel import get_mesh

    ds = ShardedDataset(_ToyDataset(16))
    assert len(ds) == 16
    loader = ClipLoader(
        ds, batch_size=8, shuffle=False, mesh=get_mesh(8), use_native=False
    )
    batches = list(loader)
    assert len(batches) == 2
    clips, labels = batches[0]
    assert clips.shape == (8, 2, 4, 4, 3)
    assert len(clips.sharding.device_set) == 8
    np.testing.assert_array_equal(
        np.asarray(labels), np.arange(8, dtype=np.int32) % 3
    )


def test_async_checkpointer_roundtrip_and_deferred_best(tmp_path):
    from ivf_tpu.models.cnn3d import CNN3D
    from ivf_tpu.train import build_optimizer, create_train_state
    from ivf_tpu.utils.checkpoint import Checkpointer

    model = CNN3D(num_classes=3, dropout_rate=0.0)
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), sample, build_optimizer("adam", 1e-3)
    )

    ckpt = Checkpointer(str(tmp_path / "run"), async_save=True)
    ckpt.save(state, epoch=0, is_best=True, best_loss=1.5)
    # the best-copy is deferred until a barrier; exists() is itself a
    # barrier, so observing model_best through the API is always consistent
    assert ckpt.exists("model_best")

    # restore barriers on the in-flight write and round-trips the values
    fresh = create_train_state(
        model, jax.random.PRNGKey(7), sample, build_optimizer("adam", 1e-3)
    )
    restored, start_epoch, best, _ = ckpt.restore(fresh)
    assert start_epoch == 1 and best == 1.5
    jax.tree.map(
        np.testing.assert_array_equal, restored.params, state.params
    )

    # a second async save with is_best=False must NOT refresh model_best
    state2 = restored.replace(step=restored.step + 1)
    ckpt.save(state2, epoch=1, is_best=False, best_loss=1.5)
    ckpt.wait_until_finished()
    ckpt.wait_until_finished()  # idempotent
    best_vars = ckpt.load_variables("model_best")
    jax.tree.map(
        np.testing.assert_array_equal, best_vars["params"], state.params
    )
    # while the live checkpoint moved on
    _, epoch2, _, _ = ckpt.restore(fresh)
    assert epoch2 == 2


def test_multihost_requires_global_mesh(monkeypatch, tmp_path):
    """process_count>1 with mesh=None must raise loudly: otherwise each
    process would silently train/evaluate a divergent model on its own
    shard (code-review finding, r3)."""
    from ivf_tpu import api
    from ivf_tpu.config import Config

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    cfg = Config()
    cfg.output_dir = str(tmp_path)
    ds = _ToyDataset(8)
    with pytest.raises(ValueError, match="multi-host training"):
        api.train(cfg, train_dataset=ds, val_dataset=ds, mesh=None)
    with pytest.raises(ValueError, match="multi-host inference"):
        api.infer(cfg, state=object(), dataset=ds, mesh=None)


def test_fit_async_best_copy_lands_on_abnormal_exit(tmp_path):
    """An epoch raising AFTER a deferred best-save must still materialize
    model_best (fit's finally barrier) — otherwise model_best is stale
    versus sync mode."""
    from ivf_tpu.models.cnn3d import CNN3D
    from ivf_tpu.train import build_optimizer, create_train_state, fit
    from ivf_tpu.utils.checkpoint import Checkpointer

    rng = np.random.RandomState(0)
    clips = rng.rand(8, 4, 32, 32, 3).astype(np.float32)
    labels = (np.arange(8) % 3).astype(np.int32)
    calls = {"n": 0}

    def train_batches():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("boom in epoch 1")
        return [(jnp.asarray(clips), jnp.asarray(labels))]

    model = CNN3D(num_classes=3, dropout_rate=0.0)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        jnp.asarray(clips[:2]),
        build_optimizer("sgd", 0.01, momentum=0.9),
    )
    ckpt = Checkpointer(str(tmp_path / "run"), async_save=True)
    with pytest.raises(RuntimeError, match="boom"):
        fit(
            state,
            train_batches,
            lambda: [(jnp.asarray(clips), jnp.asarray(labels))],
            num_epochs=3,
            checkpointer=ckpt,
            print_freq=0,
        )
    # epoch 0 was best; its deferred copy must have landed in the finally
    assert ckpt.exists("model_best")
    best_vars = ckpt.load_variables("model_best")
    assert "params" in best_vars


def test_fit_with_async_checkpointer_completes_final_write(tmp_path):
    """fit() must barrier the last epoch's async write before returning —
    a run that ends mid-write would drop its final (possibly best) epoch."""
    from ivf_tpu.models.cnn3d import CNN3D
    from ivf_tpu.train import build_optimizer, create_train_state, fit
    from ivf_tpu.utils.checkpoint import Checkpointer

    rng = np.random.RandomState(0)
    clips = rng.rand(8, 4, 32, 32, 3).astype(np.float32)
    labels = (np.arange(8) % 3).astype(np.int32)
    batches = lambda: [(jnp.asarray(clips), jnp.asarray(labels))]

    model = CNN3D(num_classes=3, dropout_rate=0.0)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        jnp.asarray(clips[:2]),
        build_optimizer("sgd", 0.01, momentum=0.9),
    )
    ckpt = Checkpointer(str(tmp_path / "run"), async_save=True)
    state, history = fit(
        state,
        batches,
        batches,
        num_epochs=2,
        checkpointer=ckpt,
        print_freq=0,
    )
    assert len(history) == 2
    # both the rolling checkpoint and the best-copy landed on disk
    restored, start_epoch, best, _ = ckpt.restore(state)
    assert start_epoch == 2
    assert ckpt.exists("model_best")
    assert np.isfinite(best)
