"""Checkpointing with the reference's save/best-copy semantics.

Mirrors ``utils.save_checkpoint`` (video_features_pytorch/utils.py:142-148):
write ``checkpoint`` every epoch, copy to ``model_best`` on improvement —
implemented over orbax for TPU-friendly async-capable saves. Stores params,
batch_stats, opt_state and epoch so training resumes exactly
(train_i3d_smth.py:63-92), including the logits-skipping partial restore
used for class-count transfer.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ivf_tpu.train.state import TrainState


def _primary() -> bool:
    return jax.process_index() == 0


def _sync(tag: str):
    """Cross-process barrier around host-side file ops (rmtree/copytree):
    orbax coordinates its own array writes across processes, but the
    directory surgery here must be primary-only and fenced so no process
    reads/writes a directory another is mutating. No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


class Checkpointer:
    """``async_save=True`` makes ``save`` non-blocking: orbax serializes
    the (host-copied) arrays in a background thread while training
    continues — the next ``save``/``restore``/``exists`` call (or an
    explicit ``wait_until_finished``) barriers on it first, and the
    best-copy is deferred until the write has landed. Single-epoch cost on
    a TPU train loop drops from the full serialize time to ~the host copy."""

    def __init__(self, directory: str, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._saver = ocp.StandardCheckpointer()
        self.async_save = async_save
        self._pending_best = False

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def wait_until_finished(self):
        """Barrier: block until any in-flight async save has landed, then
        apply its deferred best-copy. Idempotent; no-op when nothing is in
        flight."""
        self._saver.wait_until_finished()
        if self._pending_best:
            self._copy_best()
            self._pending_best = False

    def _copy_best(self):
        _sync("ivf-ckpt-pre-best")  # every process's write has landed
        if _primary():
            best = self._path("model_best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(self._path("checkpoint"), best)
        _sync("ivf-ckpt-post-best")  # best is whole before anyone reads it

    def save(
        self,
        state: TrainState,
        epoch: int,
        is_best: bool = False,
        best_loss: float = float("inf"),
        batch_offset: int = 0,
    ):
        """``batch_offset`` > 0 marks a MID-epoch checkpoint (preemption
        safety): ``batch_offset`` train batches of ``epoch`` are already in
        ``state``, and restore resumes that epoch at that batch instead of
        the next epoch (train/loop.py fast-forwards the loader)."""
        self.wait_until_finished()  # epoch N's write before touching N+1's
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": epoch,
            "step": state.step,
            "best_loss": float(best_loss),
            "batch_offset": int(batch_offset),
        }
        path = self._path("checkpoint")
        if _primary() and os.path.exists(path):
            shutil.rmtree(path)
        _sync("ivf-ckpt-pre-save")  # no writes into a dir being deleted
        self._saver.save(path, payload)
        if self.async_save:
            # orbax's StandardCheckpointer copies arrays to host before
            # returning; the durable write + the best-copy complete at the
            # next barrier (wait_until_finished / next save / restore)
            self._pending_best = is_best
            return
        self._saver.wait_until_finished()
        if is_best:
            self._copy_best()

    def restore(
        self,
        state: TrainState,
        name: str = "checkpoint",
        skip_logits: bool = False,
        logits_keys: tuple = ("logits", "end_fc", "fc", "gap_conv"),
    ) -> tuple[TrainState, int, float, int]:
        """Restore into ``state``; with ``skip_logits`` the classifier-head
        params keep their fresh values (class-count transfer,
        train_i3d_smth.py:76-88). Returns
        (state, start_epoch, best_loss, batch_offset) — the reference
        resume restores best_loss too (train_i3d_smth.py:76-88) so a worse
        post-resume epoch can't overwrite model_best. A mid-epoch
        checkpoint (batch_offset > 0) resumes ITS epoch at that batch;
        epoch-end checkpoints resume the next epoch with offset 0."""
        self.wait_until_finished()
        if skip_logits:
            return self._restore_skip_logits(state, name, logits_keys)
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": 0,
            "step": 0,
            "best_loss": float("inf"),
            "batch_offset": 0,
        }
        # checkpoints written before best_loss/batch_offset existed fail
        # orbax's strict tree matching — probe the stored keys (metadata
        # read, no array IO) and default the missing values, instead of a
        # blanket retry that could mask real restore failures
        stored_keys = set(
            self._saver.metadata(self._path(name)).item_metadata.tree
        )
        defaults = {"best_loss": float("inf"), "batch_offset": 0}
        missing = [k for k in defaults if k not in stored_keys]
        for k in missing:
            del template[k]
        restored = self._saver.restore(self._path(name), template)
        for k in missing:
            restored[k] = defaults[k]
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        offset = int(restored["batch_offset"])
        epoch = int(restored["epoch"])
        return (
            new_state,
            epoch if offset > 0 else epoch + 1,
            float(restored["best_loss"]),
            offset,
        )

    def _restore_skip_logits(
        self, state: TrainState, name: str, logits_keys: tuple
    ) -> tuple[TrainState, int, float, int]:
        """Class-count transfer: the checkpoint's classifier head (and its
        optimizer moments) may have a DIFFERENT class count than ``state``,
        so a templated restore fails orbax's strict shape matching. Restore
        template-free instead, keep the fresh head params, and start from a
        FRESH optimizer — exactly like the reference, which restores only
        model weights and constructs the optimizer afterwards
        (train_i3d_smth.py:60-92)."""
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(self._path(name))
        params = dict(restored["params"])
        for k in logits_keys:
            if k in state.params:
                params[k] = state.params[k]
        new_state = state.replace(
            params=params,
            batch_stats=restored["batch_stats"],
        )
        best = restored.get("best_loss")
        # class-count transfer starts a FRESH optimizer, so a mid-epoch
        # offset is meaningless here — always begin at the next epoch
        return (
            new_state,
            int(restored["epoch"]) + 1,
            float(best) if best is not None else float("inf"),
            0,
        )

    def exists(self, name: str = "checkpoint") -> bool:
        self.wait_until_finished()
        return os.path.exists(self._path(name))

    def load_variables(self, name: str = "checkpoint") -> dict:
        """Template-free restore of just the model variables — for
        inference/mask-search consumers that don't care about the optimizer
        state (the reference mask drivers likewise restore all-but-optimizer,
        mask/find_mask_smth.py:301-313)."""
        self.wait_until_finished()
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(self._path(name))
        out = {"params": restored["params"]}
        if restored.get("batch_stats") is not None:
            out["batch_stats"] = restored["batch_stats"]
        return out
