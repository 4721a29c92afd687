"""Multi-host (multi-process) execution layer.

The reference is strictly single-process — one torch process / one
``tf.Session``, no ``torch.distributed`` anywhere (SURVEY.md §2.3). Real
TPU pods, however, run one Python process per host, each seeing only its
local chips. This module is the thin layer that turns the single-host
framework into a multi-host SPMD program the JAX way:

  * ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator
    handshake; after it, ``jax.devices()`` is the GLOBAL device list and
    the existing mesh builders in ``parallel/mesh.py`` work unchanged);
  * every process loads a DISJOINT shard of the dataset
    (``process_shard`` / ``ShardedDataset``) — input-pipeline sharding,
    the multi-host analogue of the loader's in-process thread fan-out;
  * per-process numpy batches become ONE global ``jax.Array`` via
    ``global_device_batch`` (``jax.make_array_from_process_local_data``),
    so the same jitted SPMD train/eval step runs bit-unchanged on 1 or N
    hosts — XLA's gradient psums ride ICI within a slice and DCN across
    slices exactly as laid out by the mesh (``get_multislice_mesh``).

Single-process behavior is the identity everywhere (process_count == 1),
which is what the tests pin; the multi-host path reuses the same code with
``jax.process_count() > 1``.

Workload guidance: training/inference shard the batch globally (above).
The mask search (``api.find_masks``) is embarrassingly clip-parallel with
NO cross-clip collectives, so on multi-host the efficient layout is one
INDEPENDENT driver per process — wrap the dataset in ``ShardedDataset``,
pass a local-devices mesh (``Mesh(jax.local_devices(), ('data',))``), and
each host writes its own result shard; there is nothing to gain from a
global mesh there, and the host-side staging/viz loops stay process-local.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Join the multi-process runtime. Arguments fall back to the standard
    env vars (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on Cloud TPU pods ``jax.distributed.initialize``
    auto-detects everything, so a bare ``initialize()`` works there too
    (set ``IVF_MULTIHOST=1`` to request auto-detection explicitly).

    Returns True when a multi-process runtime was (or already is) active,
    False for the plain single-process case. Safe to call unconditionally
    at program start — single-process is a no-op. MUST run before any
    other JAX use: ``jax.distributed.initialize`` refuses to join once the
    backends are up, which is also why this function checks
    ``jax.distributed.is_initialized()`` (backend-free) and never calls
    ``jax.process_count()`` (which would initialize the backends and brick
    the handshake) on the not-yet-initialized path.
    """
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    auto = os.environ.get("IVF_MULTIHOST") == "1"
    if coordinator_address is None and not auto:
        return False  # single process; backends untouched
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def process_shard(
    n_items: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    even: bool = False,
) -> range:
    """This process's contiguous share of ``n_items`` dataset items.
    Contiguous (not strided) so a record shard's pages stay hot within one
    process.

    ``even=False``: balanced cover — the first ``n_items % count``
    processes take one extra item; shards are disjoint and cover
    everything. Right for independent per-process work (the mask-search
    layout) where nothing synchronizes.

    ``even=True``: every shard is exactly ``n_items // count`` items (the
    tail remainder is dropped). REQUIRED for SPMD training/eval: a +1
    shard can cross a batch boundary and give one process an extra step
    whose collectives the others never join — a silent deadlock."""
    i = jax.process_index() if process_index is None else process_index
    c = jax.process_count() if process_count is None else process_count
    if not 0 <= i < c:
        raise ValueError(f"process_index {i} out of range for count {c}")
    base, rem = divmod(n_items, c)
    if even:
        return range(i * base, (i + 1) * base)
    start = i * base + min(i, rem)
    return range(start, start + base + (1 if i < rem else 0))


class ShardedDataset:
    """View of any indexable dataset restricted to this process's shard.

    Works with every dataset in ``data/loaders.py`` (forwards
    ``get_payloads`` for the native-decode path). Per-process loaders then
    draw only local items; ``ClipLoader`` assembles their batches into
    global arrays when ``jax.process_count() > 1``.

    Note the batch contract: ``ClipLoader.batch_size`` stays the
    PER-PROCESS batch; the global batch an SPMD step sees is
    ``batch_size * process_count``. The default ``even=True`` trims every
    shard to exactly ``len(dataset) // process_count`` items so all
    processes run the SAME number of steps per epoch — a mismatched step
    count deadlocks collectives, exactly like any SPMD framework. Pass
    ``even=False`` only for independent per-process work (the mask-search
    layout) where full coverage matters and nothing synchronizes.
    """

    def __init__(
        self,
        dataset,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        even: bool = True,
    ):
        self.dataset = dataset
        self.indices = process_shard(
            len(dataset), process_index, process_count, even=even
        )
        # only expose the native-decode hook when the wrapped dataset has
        # it — ClipLoader feature-detects via hasattr (loaders.py)
        if hasattr(dataset, "get_payloads"):
            self.get_payloads = lambda index: dataset.get_payloads(
                self.indices[index]
            )

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, index: int):
        return self.dataset[self.indices[index]]

    def __getattr__(self, name):  # catalog metadata etc. pass through
        if name.startswith("__") or name in ("dataset", "indices"):
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "dataset"), name)


def global_device_batch(batch, mesh, axis_name: str = "data"):
    """Assemble per-process numpy arrays into ONE global jax.Array sharded
    over the mesh's data axis (``jax.make_array_from_process_local_data``).
    Each process contributes its local rows; the global leading dim is
    ``local_rows * process_count``. Non-array leaves (id lists) pass
    through untouched — they stay process-local host data.

    With ``process_count == 1`` this is exactly
    ``device_put(x, NamedSharding(mesh, P(axis_name)))`` (tested)."""
    from ivf_tpu.parallel.mesh import data_sharding

    sharding = data_sharding(mesh, axis_name)

    def place(x):
        if isinstance(x, np.ndarray):
            return jax.make_array_from_process_local_data(sharding, x)
        return x

    return tuple(place(x) for x in batch)
