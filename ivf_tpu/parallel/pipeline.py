"""GPipe-style pipeline parallelism over a ``'stage'`` mesh axis.

The reference has no pipeline parallelism (its only parallelism is
host-side ``torch.nn.DataParallel`` scatter/gather — SURVEY.md §2.3); this
module extends the framework's parallel stack (data / spatial / tensor /
multi-slice in ``parallel/mesh.py``) with the remaining classic axis:
*inter-layer* sharding, for trunks too deep/wide for one chip's HBM.

TPU-native design (not a port of anything):
  * the schedule is a single ``lax.scan`` over ``n_micro + n_stages - 1``
    ticks inside ``shard_map`` — fully compiler-visible, no host loop;
  * each device runs ONLY its stage per tick via ``lax.switch`` on
    ``lax.axis_index('stage')`` (one branch executes at runtime);
  * inter-stage activations move by ``lax.ppermute`` ring shifts riding
    the ICI — heterogeneous stage shapes (I3D downsamples 32x through the
    trunk) travel through one flat f32 buffer sized to the LARGEST
    inter-stage activation, encoded/decoded per stage with static shapes;
  * the pipeline bubble is the standard GPipe ``(S-1)/(M+S-1)`` — pick
    ``n_micro >= 4*n_stages`` for >75% steady-state occupancy;
  * the whole schedule is differentiable (jax autodiff through
    scan/switch/ppermute), so it trains as well as it infers —
    ``test_pipeline_apply_is_differentiable`` pins input AND parameter
    grads against the sequential composition.

Scope note (honest costs): parameters and the input microbatches are
replicated across the stage axis — each device TRACES all stages but
EXECUTES one. For the reference's models (I3D is 12M params) pipeline
parallelism is never the right tool — use the data/spatial axes — but the
harness is model-agnostic: any list of shape-compatible stage functions
pipelines, which is what matters for trunks at scales where inter-layer
sharding becomes real.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ivf_tpu.models.i3d import TRUNK_ENDPOINTS


def i3d_stage_fns(
    model, variables, n_stages: int, boundaries: Optional[Sequence[str]] = None
):
    """Split an I3D into ``n_stages`` sequential stage functions.

    Stages cut the trunk at endpoint boundaries (default: trunk endpoints
    split into contiguous groups of near-equal endpoint count, a reasonable
    proxy for this trunk's per-block cost); the last stage additionally
    runs the Logits head (``head_from``). Returns a list of pure
    ``act -> act`` functions (params closed over) suitable for
    ``pipeline_apply``.
    """
    assert 2 <= n_stages <= len(TRUNK_ENDPOINTS), n_stages
    if boundaries is None:
        # n_stages-1 cut points at even fractions of the trunk
        cuts = [
            TRUNK_ENDPOINTS[
                math.ceil(len(TRUNK_ENDPOINTS) * (i + 1) / n_stages) - 1
            ]
            for i in range(n_stages - 1)
        ]
    else:
        cuts = list(boundaries)
        assert len(cuts) == n_stages - 1, (cuts, n_stages)
        assert all(c in TRUNK_ENDPOINTS for c in cuts), cuts

    def trunk_segment(m, x, start_after, stop_at):
        return m._walk_trunk(x, train=False, start_after=start_after, stop_at=stop_at)

    fns = []
    for s in range(n_stages):
        start = None if s == 0 else cuts[s - 1]
        if s < n_stages - 1:
            fn = partial(
                lambda x, a, b: model.apply(
                    variables, x, method=trunk_segment, start_after=a, stop_at=b
                ),
                a=start,
                b=cuts[s],
            )
        else:
            # final stage: remaining trunk + Logits head (+softmax if set)
            fn = partial(
                lambda x, a: model.apply(
                    variables, x, method=model.head_from, endpoint=a
                ),
                a=start,
            )
        fns.append(fn)
    return fns


def stage_io_shapes(stage_fns, x_shape, dtype=jnp.float32):
    """Chain ``jax.eval_shape`` through the stages: per-stage input
    ShapeDtypeStructs (index 0 = the pipeline input microbatch)."""
    shapes = [jax.ShapeDtypeStruct(tuple(x_shape), dtype)]
    for fn in stage_fns:
        shapes.append(jax.eval_shape(fn, shapes[-1]))
    return shapes


def pipeline_apply(
    stage_fns: Sequence[Callable],
    x: jax.Array,
    mesh: Mesh,
    n_micro: Optional[int] = None,
    axis: str = "stage",
):
    """Run ``x`` through ``stage_fns[0] ∘ ... ∘ stage_fns[-1]`` pipelined
    over ``mesh``'s ``axis`` (one stage per device along that axis).

    x: (B, ...) — split into ``n_micro`` microbatches along the leading
    axis (default: one microbatch per stage; more microbatches shrink the
    bubble). Returns the stacked final-stage outputs, (B, ...) — identical
    (up to float reassociation) to applying the stages sequentially.
    """
    n_stages = mesh.shape[axis]
    assert len(stage_fns) == n_stages, (len(stage_fns), n_stages)
    n_micro = n_micro or n_stages
    b = x.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    xm = x.reshape(n_micro, mb, *x.shape[1:])

    shapes = stage_io_shapes(stage_fns, (mb, *x.shape[1:]), x.dtype)
    sizes = [int(np.prod(s.shape)) for s in shapes]
    buf_elems = max(sizes)
    out_struct = shapes[-1]

    def enc(act):
        flat = jnp.ravel(act).astype(jnp.float32)
        return jnp.pad(flat, (0, buf_elems - flat.size))

    def dec(buf, s):
        st = shapes[s]
        return buf[: sizes[s]].reshape(st.shape).astype(st.dtype)

    n_ticks = n_micro + n_stages - 1

    def spmd(xm):
        stage = jax.lax.axis_index(axis)

        def branch(s, buf, t):
            if s == 0:
                # stage 0 reads its microbatch directly from the input
                m = jnp.clip(t, 0, n_micro - 1)
                act = jax.lax.dynamic_index_in_dim(xm, m, keepdims=False)
            else:
                act = dec(buf, s)
            return enc(stage_fns[s](act))

        branches = [partial(branch, s) for s in range(len(stage_fns))]
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            in_buf, outputs = carry
            out_buf = jax.lax.switch(stage, branches, in_buf, t)
            next_in = jax.lax.ppermute(out_buf, axis, perm)
            # the LAST stage finishes microbatch m = t-(S-1) this tick
            m_out = t - (n_stages - 1)
            result = dec(out_buf, n_stages)
            is_mine = (stage == n_stages - 1) & (m_out >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, result, jnp.clip(m_out, 0, n_micro - 1), 0
            )
            outputs = jnp.where(is_mine, upd, outputs)
            return (next_in, outputs), None

        outputs0 = jnp.zeros((n_micro, *out_struct.shape), out_struct.dtype)
        (_, outputs), _ = jax.lax.scan(
            tick,
            (jnp.zeros((buf_elems,), jnp.float32), outputs0),
            jnp.arange(n_ticks),
        )
        # only the last stage holds real outputs -> replicate via psum
        mask = (stage == n_stages - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * mask, axis)

    out = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=P(),  # input replicated over the stage axis
        out_specs=P(),  # psum above makes the output replicated
        check_vma=False,
    )(xm)
    return out.reshape(b, *out_struct.shape[1:])
