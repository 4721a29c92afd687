"""Compilation helpers for the hot paths.

``hot_jit`` is ``jax.jit`` plus TPU compiler options that measured faster
on the mask-search workload (scripts note in PERF.md): doubling the
scoped-VMEM fusion budget to the chip's full 128 MB gives XLA room for
larger fusions — 450.5 -> 458.8 mask-steps/s at the production bench
config (+1.8%, repeatable). The options are scheduling knobs only (no
numerics impact) and are applied only when the backend is a TPU; CPU
compiles get a plain jit.
"""

from __future__ import annotations

import os

import jax

TPU_HOT_COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "131072"}


def on_axon_tunnel() -> bool:
    """True when the device is reached through the axon TPU tunnel.

    The tunnel kills any single program execution running longer than
    ~1 min, so long searches must run as chained segments there
    (``MaskConfig.chunk_steps``). The axon plugin registers its PJRT
    platform as plain ``"tpu"`` — ``jax.default_backend()`` can NOT tell
    the tunnel from real hardware — so detect via the platform list the
    plugin/sitecustomize configures (``jax_platforms`` contains "axon").
    """
    platforms = jax.config.jax_platforms or os.environ.get(
        "JAX_PLATFORMS", ""
    )
    return "axon" in str(platforms).lower()


def hot_jit(fn=None, vmem_opt=True, **jit_kwargs):
    """``jax.jit`` with the measured-faster TPU compiler options (no-op
    options-wise off-TPU). Usable as ``hot_jit(fn)`` or a decorator.

    ``vmem_opt=False`` skips the scoped-VMEM option: it measured +1.8% on
    the reduce_window mask-search program but **-1.2%** on the argmax-pool
    program (490 -> 484 steps/s head-to-head, PERF.md round 3), so callers
    that engage ``pool_impl='argmax'`` pass False.

    ``IVF_HOT_JIT=0`` disables the extra options (plain jit everywhere) —
    the escape hatch for environments where options-bearing programs
    bypass compile caches or misbehave."""
    opts = hot_compiler_options(vmem_opt)
    if opts:
        jit_kwargs.setdefault("compiler_options", opts)
    if fn is None:
        return lambda f: jax.jit(f, **jit_kwargs)
    return jax.jit(fn, **jit_kwargs)


def hot_compiler_options(vmem_opt: bool = True) -> dict:
    """The extra compiler options ``hot_jit`` would attach right now
    (empty off-TPU, under ``IVF_HOT_JIT=0``, or with ``vmem_opt=False``)."""
    if vmem_opt and os.environ.get("IVF_HOT_JIT", "1") != "0":
        if jax.default_backend() in ("tpu", "axon"):
            return dict(TPU_HOT_COMPILER_OPTS)
    return {}
