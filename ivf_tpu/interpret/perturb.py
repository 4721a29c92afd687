"""Temporal perturbations + regularizers for mask search.

TPU-native restatement of the reference's mask math
(``video_features_pytorch/mask.py`` and ``video_features_tf/mask/mask.py``):

* ``freeze_perturb`` — the sequential blend
  ``out[u] = (1-m[u])*seq[u] + m[u]*out[u-1]`` as a ``jax.lax.scan`` (the
  reference's in-graph form is the ``tf.scan`` recurrence at
  ``video_features_tf/mask/find_mask_smth.py:258-272``).
* ``reverse_perturb`` — fully vectorized: the reference finds contiguous
  "on" runs in Python and swaps the u-th and u-th-last frames inside each
  run (``mask.py:24-57``); here run membership, run position/length, swap
  partner and blend coefficient are computed with cumsum/gather, so the op
  is jit- and vmap-able with no data-dependent control flow.
* ``tv_norm`` — the paper's TV norm with the reference's exact
  double-counted interior differences (``mask.py:88-100``).

All functions operate on a single clip ``seq: (T, H, W, C)`` with
``mask: (T,)`` — batch by ``jax.vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

MASK_THRESHOLD = 0.1


def snap_mask(mask: jax.Array) -> jax.Array:
    """Round mask to {0,1} at 0.5 (mask.py:5-10)."""
    return (mask > 0.5).astype(mask.dtype)


def freeze_transition_matrix(
    mask: jax.Array, closed_form: bool = False
) -> jax.Array:
    """Lower-triangular (T, T) matrix W with ``out = W @ seq`` equal to the
    freeze recurrence ``out[u] = (1-m[u])*seq[u] + m[u]*out[u-1]``.

    The recurrence is linear in the frames, so its unrolled form is a
    per-frame weighting ``W[u, k] = (1-m[k]) * prod(m[k+1..u])`` (with the
    k=0 column absorbing the un-perturbed first frame), which turns the
    per-frame sequential blend into ONE dense contraction (see
    ``freeze_perturb``).

    ``closed_form=True`` builds W without the T-step scan: with
    ``L[u] = sum_{j<=u} log m[j]`` the tail product is
    ``prod(m[k+1..u]) = exp(L[u] - L[k])``, so W is a few fused
    elementwise HLOs instead of 2(T-1) sequential scan-iteration ops per
    optimization step (fwd + transpose) — measurable on backends with
    per-op dispatch overhead. Stable in log space (mask entries are
    sigmoids, never exactly 0; direct cumprod would underflow f32 around
    T=16 small masks). The scan path remains for bit-exact comparison.
    """
    t = mask.shape[0]
    m = mask
    if not closed_form:
        eye = jnp.eye(t, dtype=mask.dtype)

        def step(prev_row, u):
            # row_u = m[u] * row_{u-1} + (1 - m[u]) * e_u
            row = m[u] * prev_row + (1.0 - m[u]) * eye[u]
            return row, row

        _, rows = lax.scan(step, eye[0], jnp.arange(1, t))
        return jnp.concatenate([eye[:1], rows], axis=0)

    logm = jnp.log(jnp.maximum(m, jnp.finfo(mask.dtype).tiny))
    # L[u] = sum_{j in 1..u} log m[j]  (index 0 excluded by the recurrence)
    cum = jnp.cumsum(logm.at[0].set(0.0))
    # valid (k <= u) exponents are sums of log-sigmoids, always <= 0; the
    # min(., 0) only clips the upper triangle, which would otherwise exp to
    # inf and poison the where() gradient despite being masked below
    tail = jnp.exp(jnp.minimum(cum[:, None] - cum[None, :], 0.0))
    coef = jnp.where(jnp.arange(t) == 0, 1.0, 1.0 - m)  # (1-m[k]); k=0 -> 1
    u = jnp.arange(t)
    w = jnp.where(u[:, None] >= u[None, :], coef[None, :] * tail, 0.0)
    # diagonal: W[u,u] = (1-m[u]) exactly (tail exp(0)=1); row 0 = e_0
    return w.astype(mask.dtype)


def freeze_perturb(
    seq: jax.Array,
    mask: jax.Array,
    use_matrix: bool = True,
    closed_form: bool = False,
) -> jax.Array:
    """Freeze perturbation: masked frames repeat the previous (possibly
    already-frozen) frame. seq (T, ...), mask (T,) in [0,1].

    Default path: transition-matrix contraction — one fused
    ``einsum('ut,t...->u...')`` instead of T sequential frame-sized blend
    kernels (the reference's per-frame loop / tf.scan). ~10x cheaper on TPU;
    ``use_matrix=False`` keeps the literal lax.scan recurrence.
    ``closed_form=True`` additionally builds the transition matrix without
    its T-step scan (see ``freeze_transition_matrix``) — bit-parity drifts
    ~1e-4 relative worst-case from log/exp reassociation. This function
    defaults to the exact scan; the mask-search hot loop defaults to the
    closed form, switchable via ``MaskConfig.closed_form`` for exact-parity
    comparison runs (mask_opt.py).
    """
    m = mask.astype(seq.dtype)
    if use_matrix:
        w = freeze_transition_matrix(m, closed_form=closed_form)
        flat = seq.reshape(seq.shape[0], -1)
        out = jnp.einsum(
            "ut,tf->uf", w, flat, preferred_element_type=seq.dtype
        )
        return out.reshape(seq.shape)

    def step(prev, inp):
        frame, mu = inp
        out = (1.0 - mu) * frame + mu * prev
        return out, out

    _, rest = lax.scan(step, seq[0], (seq[1:], m[1:]))
    return jnp.concatenate([seq[:1], rest], axis=0)


def _run_geometry(on: jax.Array):
    """For each position of boolean ``on`` (T,): (in_run, pos, length,
    run_start) of its maximal contiguous True run."""
    t = on.shape[0]
    off_csum = jnp.cumsum(~on)  # equal values <=> no gaps in between
    idx = jnp.arange(t)
    # same_run[i, j]: i and j in the same contiguous on-run
    same = on[:, None] & on[None, :] & (off_csum[:, None] == off_csum[None, :])
    big = t + 1
    run_start = jnp.min(jnp.where(same, idx[None, :], big), axis=1)
    run_len = jnp.sum(same, axis=1)
    pos = idx - run_start
    return on, pos, run_len, run_start


def reverse_perturb(
    seq: jax.Array, mask: jax.Array, thresh: float = MASK_THRESHOLD
) -> jax.Array:
    """Reverse perturbation (mask.py:24-57): inside every contiguous run of
    mask>thresh, frame at run-position p swaps with run-position L-1-p,
    blended with coefficient ``mask[run_start + min(p, L-1-p)]`` (the
    reference uses the *earlier* frame's mask value for both sides of the
    swap). Run middles (odd L) and non-run frames stay original."""
    m = mask.astype(seq.dtype)
    on = m > thresh
    on, pos, run_len, run_start = _run_geometry(on)

    partner = run_start + run_len - 1 - pos
    partner = jnp.clip(partner, 0, seq.shape[0] - 1)
    coeff_idx = run_start + jnp.minimum(pos, run_len - 1 - pos)
    coeff_idx = jnp.clip(coeff_idx, 0, seq.shape[0] - 1)
    coeff = m[coeff_idx]

    swapped = jnp.take(seq, partner, axis=0)
    is_middle = pos == (run_len - 1 - pos)
    do_swap = on & ~is_middle
    bshape = (seq.shape[0],) + (1,) * (seq.ndim - 1)
    c = coeff.reshape(bshape)
    blend = (1.0 - c) * seq + c * swapped
    return jnp.where(do_swap.reshape(bshape), blend, seq)


def perturb_sequence(
    seq: jax.Array,
    mask: jax.Array,
    perturbation_type: str = "freeze",
    snap_values: bool = False,
    closed_form: bool = False,
) -> jax.Array:
    """Dispatcher mirroring ``mask.perturb_sequence`` (mask.py:4-57)."""
    if snap_values:
        mask = snap_mask(mask)
    if perturbation_type == "freeze":
        return freeze_perturb(seq, mask, closed_form=closed_form)
    if perturbation_type == "reverse":
        return reverse_perturb(seq, mask)
    raise ValueError(f"unknown perturbation_type {perturbation_type}")


def tv_norm(mask: jax.Array, p: float = 3.0, q: float = 3.0) -> jax.Array:
    """Total-variation norm, reference formula (mask.py:88-100):
    sum over u in [1, T-2] of |m[u-1]-m[u]|^p + |m[u+1]-m[u]|^p, then
    ^(1/p) then ^q. Interior differences are intentionally double-counted
    to match the reference."""
    left = jnp.abs(mask[:-1] - mask[1:]) ** p  # |m[u-1] - m[u]| for u=1..T-1
    # u ranges 1..T-2: left-diff terms are diffs[0..T-3], right-diff terms
    # are diffs[1..T-2]
    val = jnp.sum(left[:-1]) + jnp.sum(left[1:])
    return (val ** (1.0 / p)) ** q


def find_submasks_from_mask(mask, thresh: float = MASK_THRESHOLD):
    """Host-side helper returning the list of contiguous on-runs
    (mask.py:60-85). For analysis/viz only — not jittable."""
    import numpy as np

    mask = np.asarray(mask)
    submasks, current, in_run = [], [], False
    for j, v in enumerate(mask):
        if v > thresh and not in_run:
            current, in_run = [j], True
        elif v > thresh and in_run:
            current.append(j)
        elif v <= thresh and in_run:
            submasks.append(current)
            in_run = False
        if j == len(mask) - 1 and in_run:
            submasks.append(current)
            in_run = False
    return submasks
