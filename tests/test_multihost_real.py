"""REAL multi-process multi-host validation (not the fake-process_count
unit tests in test_multihost.py): two actual OS processes join a
``jax.distributed`` coordinator on the CPU backend, run the production
``api.train`` path over a 2-device GLOBAL mesh (1 local device each), and
the result must match an equivalent single-process run bit-closely.

This exercises for real what the reference never had (SURVEY §2.3 — it is
strictly single-process): the coordinator handshake, per-process dataset
sharding, ``jax.make_array_from_process_local_data`` batch assembly, Gloo
cross-process gradient/BN collectives, orbax multi-process checkpointing,
and the primary-only artifact writes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from tests._mh_worker import make_cfg, make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mh_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_real_processes_match_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # each worker gets ONE local CPU device; jax platform is forced to cpu
    # in-process by the worker (env vars don't override sitecustomize here)
    env.pop("XLA_FLAGS", None)
    out_dir = tmp_path / "mh"
    out_dir.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(out_dir)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out

    # ---- single-process reference on a 2-device slice of the test mesh,
    # same GLOBAL batch (4) and data order ----
    from ivf_tpu.api import train
    from ivf_tpu.parallel.mesh import get_mesh

    cfg = make_cfg(tmp_path / "single", batch_size=4)
    state, history = train(
        cfg,
        mesh=get_mesh(2),
        train_dataset=make_dataset(),
        val_dataset=make_dataset(),
    )

    got = np.load(out_dir / "params.npz")
    want = [np.asarray(a) for a in jax.tree_util.tree_leaves(
        jax.device_get(state.params)
    )]
    assert len(got.files) == len(want)
    for f, w in zip(got.files, want):
        np.testing.assert_allclose(got[f], w, rtol=1e-5, atol=1e-6)

    mh_losses = json.load(open(out_dir / "val_losses.json"))
    sp_losses = [float(h["val"]["loss"]) for h in history]
    np.testing.assert_allclose(mh_losses, sp_losses, rtol=1e-5, atol=1e-6)

    # primary-only artifact discipline: exactly one process wrote them
    save = out_dir / "mh_real"
    assert (save / "history.json").exists()
    assert (save / "plots").exists()


MASKS_WORKER = os.path.join(REPO, "tests", "_mh_masks_worker.py")


def _load_tm_pickle(out_dir):
    import pickle

    p = os.path.join(
        str(out_dir), "mh_masks", "results", "allTimeMaskResults_mh_masks_None_.p"
    )
    with open(p, "rb") as f:
        return pickle.load(f)


@pytest.mark.slow
def test_two_process_find_masks_shards_disjoint_and_complete(tmp_path):
    """The documented multi-host mask-search layout
    (``parallel/multihost.py:26-31``) as REAL processes: two independent
    ``find_masks`` drivers over ``ShardedDataset(even=False)`` — no
    coordinator, nothing synchronizes. The union of the two per-process
    pickle result shards must equal the single-process run's result set,
    be disjoint, and match per clip (VERDICT r3 #5)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out_dir = tmp_path / "mh_masks"
    out_dir.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, MASKS_WORKER, str(i), "2", str(out_dir)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"masks worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out

    shards = [
        {r["video_id"]: r for r in _load_tm_pickle(out_dir / f"proc{i}")}
        for i in range(2)
    ]
    assert not (set(shards[0]) & set(shards[1])), "shards overlap"

    # ---- single-process reference over the full dataset ----
    from tests._mh_masks_worker import build_variables, make_cfg, make_dataset

    from ivf_tpu.api import find_masks

    cfg = make_cfg(tmp_path / "single")
    tm, _ = find_masks(
        cfg, build_variables(cfg), dataset=make_dataset(), save_viz=False
    )
    single = {r["video_id"]: r for r in tm}
    assert set(shards[0]) | set(shards[1]) == set(single), "union != full set"
    for shard in shards:
        for vid, r in shard.items():
            np.testing.assert_allclose(
                r["time_mask"], single[vid]["time_mask"], rtol=1e-5, atol=1e-6
            )
            np.testing.assert_allclose(
                r["freeze_score"],
                single[vid]["freeze_score"],
                rtol=1e-5,
                atol=1e-6,
            )
