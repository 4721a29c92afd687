"""Worker process for tests/test_multihost_real.py — a REAL 2-process
``jax.distributed`` run on the CPU backend (Gloo cross-process collectives).

Not collected by pytest (leading underscore). Invoked as

    python tests/_mh_worker.py <process_id> <num_processes> <port> <out_dir>

Each process joins the coordinator, builds the SAME synthetic dataset,
and drives the production ``api.train`` path: ``ShardedDataset`` splits the
data per process inside ``train()``, ``ClipLoader`` assembles global
arrays via ``jax.make_array_from_process_local_data``, and the jitted SPMD
step's gradient/BN reductions cross the process boundary through Gloo.
Process 0 dumps the final params + per-epoch val losses for the parent
test to compare against an equivalent single-process run.
"""

import json
import os
import sys


def make_cfg(out_dir, batch_size):
    """Tiny ConvLSTM train config shared with the parent test.

    ``batch_size`` is per-process under multi-host (the global batch is
    batch_size * process_count — ShardedDataset docstring), so the parent
    passes 2 here and 4 for its single-process reference run."""
    from ivf_tpu.config import Config

    return Config.from_dict(
        {
            "model_name": "mh_real",
            "output_dir": str(out_dir),
            "data_folder": "",  # datasets are passed to train() directly
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": batch_size,
            "clip_size": 4,
            "input_spatial_size": 16,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "batch_norm": True,
            "dropout": 0.0,
            "optimizer": "ADAM",
            "lr": 0.01,
            "num_epochs": 2,
            "num_workers": 1,
            "shuffle": 0,
            "print_freq": 0,
        }
    )


class _TrainView:
    """(clip, label) view of SyntheticClips — train_epoch unpacks pairs
    (the id element is a find_masks/infer concern)."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        clip, label, _ = self.ds[i]
        return clip, label


def make_dataset():
    from ivf_tpu.data.synthetic import SyntheticClips

    # 4 clips = exactly one global batch (2/process x 2 processes), so the
    # multi-process batch composition matches the single-process reference
    return _TrainView(
        SyntheticClips(4, t=4, hw=16, num_classes=2, seed=3, lazy=False)
    )


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ivf_tpu.parallel.multihost import initialize

    assert initialize(f"localhost:{port}", nproc, pid), "expected multi-process"
    assert jax.process_count() == nproc

    import numpy as np

    from ivf_tpu.api import train
    from ivf_tpu.parallel.mesh import get_mesh

    cfg = make_cfg(out_dir, batch_size=2)
    state, history = train(
        cfg,
        mesh=get_mesh(),  # global mesh: 1 CPU device per process
        train_dataset=make_dataset(),
        val_dataset=make_dataset(),
    )
    if jax.process_index() == 0:
        # params are fully mesh-replicated -> every process holds a full copy
        leaves = [np.asarray(a) for a in jax.tree_util.tree_leaves(
            jax.device_get(state.params)
        )]
        np.savez(os.path.join(out_dir, "params.npz"), *leaves)
        with open(os.path.join(out_dir, "val_losses.json"), "w") as f:
            json.dump([float(h["val"]["loss"]) for h in history], f)
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
