"""Worker process for tests/test_multihost_real.py's find_masks layout test.

Not collected by pytest (leading underscore). Invoked as

    python tests/_mh_masks_worker.py <process_id> <num_processes> <out_dir>

Drives the DOCUMENTED multi-host mask-search layout
(``parallel/multihost.py:26-31``): the search is embarrassingly
clip-parallel with no cross-clip collectives, so each host runs an
INDEPENDENT ``api.find_masks`` driver over ``ShardedDataset(even=False)``
and writes its own result shard — no coordinator, no collectives, which is
exactly the point being validated (disjoint + complete shards, per-clip
results identical to a single-process run).
"""

import os
import sys


def make_cfg(out_dir):
    from ivf_tpu.config import Config

    cfg = Config.from_dict(
        {
            "model_name": "mh_masks",
            "output_dir": str(out_dir),
            "data_folder": "",
            "conv_model": "clstm",
            "num_classes": 2,
            "batch_size": 2,
            "clip_size": 4,
            "input_spatial_size": 16,
            "clstm_hidden": 4,
            "clstm_layers": 1,
            "conv_stride": 1,
            "dropout": 0.0,
            "num_workers": 1,
        }
    )
    cfg.model.effective_steps = (1, 3)
    cfg.mask.opt_iter = 3
    return cfg


def make_dataset():
    from ivf_tpu.data.synthetic import SyntheticClips

    # 5 clips: odd on purpose — the even=False shards split 3/2 and both
    # processes exercise a padded final flush
    return SyntheticClips(5, t=4, hw=16, num_classes=2, seed=7, lazy=False)


def build_variables(cfg):
    """Deterministic variables, identical across all runs (same seed,
    same backend) — find_masks takes them as an argument."""
    import jax
    import jax.numpy as jnp

    from ivf_tpu.api import build_model

    model = build_model(cfg, softmax_override=True)
    return jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16, 3))
    )


def main():
    pid, nproc, out_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ivf_tpu.api import find_masks
    from ivf_tpu.parallel.multihost import ShardedDataset

    cfg = make_cfg(os.path.join(out_dir, f"proc{pid}"))
    ds = ShardedDataset(
        make_dataset(), process_index=pid, process_count=nproc, even=False
    )
    tm, gc = find_masks(
        cfg, build_variables(cfg), dataset=ds, save_viz=False
    )
    assert len(tm) == len(ds) and len(gc) == len(ds)
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
