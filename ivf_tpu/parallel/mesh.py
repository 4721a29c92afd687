"""Device mesh + sharding layer — the framework's distributed backbone.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
host-side scatter/gather (train_i3d_smth.py:58; SURVEY.md §2.3). The
TPU-native replacement: a ``jax.sharding.Mesh`` over the slice's chips with
a ``'data'`` axis; batches are placed with a NamedSharding so every jitted
step runs SPMD with XLA-inserted collectives (gradient psums ride the ICI).

Clip-level workloads (training batches, the vmapped mask search, Grad-CAM
sweeps) all shard along the leading clip axis; params/masks stay replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over (up to) all visible devices."""
    devices = jax.devices()
    if n_devices is not None:
        # loud, not silent: a downsized mesh breaks the caller's per-device
        # batch math (get_2d_mesh/get_multislice_mesh assert the same way)
        assert len(devices) >= n_devices, (
            f"requested {n_devices}-device mesh but only {len(devices)} "
            f"devices are visible"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def get_2d_mesh(
    data: int, model: int, axis_names: Sequence[str] = ("data", "model")
) -> Mesh:
    """2-D (data x model) mesh. The 'model' axis spatially shards the conv
    H dimension (GSPMD inserts the halo exchanges) — the optional
    model-parallel mode for clips too large for one chip's HBM.

    Constraint: pick ``model`` <= the smallest H the network reaches (I3D
    reduces H 32x, so model <= input_H/32). Sharding a dimension smaller
    than the axis hits degenerate GSPMD partitioning (observed wrong values
    at H=2 over 4 devices on the CPU backend)."""
    devices = jax.devices()
    assert len(devices) >= data * model, (len(devices), data, model)
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, tuple(axis_names))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard clips (B, T, H, W, C): batch over 'data', H over 'model'."""
    return NamedSharding(mesh, P("data", None, "model"))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (clip/batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place (clips, labels, ...) pytree with leading-axis sharding."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def get_multislice_mesh(
    n_slices: int,
    chips_per_slice: int,
    axis_names: Sequence[str] = ("slice", "data"),
) -> Mesh:
    """2-level (slice x chip) mesh for multi-slice pods: the outer axis
    crosses DCN, the inner axis rides a slice's ICI. Batches shard over
    BOTH axes (``multislice_sharding``); XLA's gradient psum then reduces
    within each slice over ICI first and across slices over DCN once —
    the hierarchical all-reduce falls out of the mesh axis ordering, no
    manual comms. Device order must be slice-major (``jax.devices()``
    already is on multi-slice deployments)."""
    devices = jax.devices()
    n = n_slices * chips_per_slice
    assert len(devices) >= n, (len(devices), n_slices, chips_per_slice)
    grid = np.asarray(devices[:n]).reshape(n_slices, chips_per_slice)
    return Mesh(grid, tuple(axis_names))


def multislice_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading clip/batch axis jointly over (slice, data)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def tensor_parallel_variables(
    variables, mesh: Mesh, axis_name: str = "model"
):
    """Megatron-style tensor parallelism, declared to GSPMD: shard every
    conv/dense kernel's OUTPUT-channel (last) dim over ``axis_name`` when
    divisible, with the matching bias/BN vectors sharded the same way;
    everything else replicates. XLA then partitions each conv's output
    channels across the axis and inserts the collectives (all-gathers where
    a consumer needs the full channel dim, e.g. pools and the next conv's
    contraction) over ICI — no manual collective code, per the
    scaling-book recipe (mesh + annotations -> compiler collectives).

    Use when the per-chip batch is too small to feed data parallelism
    (e.g. latency-bound single-clip inference) — composes with the 'data'
    axis of a 2-D mesh from ``get_2d_mesh``.
    """
    size = mesh.shape[axis_name]

    def place(path, x):
        if x.ndim >= 2 and x.shape[-1] % size == 0:
            spec = P(*([None] * (x.ndim - 1) + [axis_name]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        # 1-D channel vectors (bias / BN scale/bias/stats) follow the kernel
        if x.ndim == 1 and x.shape[0] % size == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, variables)
