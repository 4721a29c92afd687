"""Temporal-mask optimization — the framework's headline workload.

The reference optimizes one clip at a time: ~300 Adam steps, each a full
I3D forward+backward (``FindMasksComparison_I3D_smth.py:188-214``), clips
strictly sequential. Here the whole optimization is a pure function of one
clip, so ``jax.vmap`` runs *hundreds of clips in parallel* on one chip and
``shard_map`` spreads them over a mesh — the TPU-native redesign promised in
SURVEY.md §3.3.

Semantics notes (all verified against the reference):
  * loss = lam1*sum|sigmoid(m)| + lam2*TV(sigmoid(m), p=3, q=3)
          + score(perturb(seq, sigmoid(m)))[target]     (lines 198-207)
    where score is the post-softmax class probability (model built with
    softMax=1, line 58).
  * Adam lr=0.2, torch defaults b1=0.9 b2=0.999 eps=1e-8 (line 191).
  * The reference's early-stop ``abs(oldLoss - loss) < eta`` is DEAD CODE
    in EVERY driver: ``oldLoss`` is initialized to 999999 and never updated
    (torch: FindMasksComparison_I3D_smth.py:193-214; TF:
    find_mask_smth.py:385-407 and :430-451), so all N steps always run —
    the fixed-N vmapped schedule here is exact reference semantics, not an
    approximation. We default to exact-parity behavior
    (``early_stop=False``) and offer the *intended* semantics
    (``early_stop=True``: per-clip convergence freezing under vmap).
  * central init (mask.py:103-154): candidate masks ones-with-i-edge-zeros
    for i in 1..T//2-1, first whose score-drop ratio < threshold (else the
    last); all candidate probes run in ONE batched forward here instead of
    the reference's sequential probe loop. {0,1} -> {-5,+5} logits.
  * random init (mask.py:156-165): ``uniform() > 0.7`` — i.e. ~30% of
    frames on (the reference docstring says 70%; the code says 30% — we
    follow the code), {0,1} -> {-2.5,+2.5}; the all-equal nudge at index 8.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ivf_tpu.interpret.perturb import perturb_sequence, tv_norm

ScoreFn = Callable[[jax.Array], jax.Array]
# ScoreFn: clip (T, H, W, C) -> class-probability vector (num_classes,)


class MaskSearchResult(NamedTuple):
    mask: jax.Array  # sigmoid(mask_logits), (T,)
    loss: jax.Array  # final total loss
    l1_loss: jax.Array
    tv_loss: jax.Array
    freeze_score: jax.Array  # class score under the optimized perturbation
    reverse_score: jax.Array  # class score under reverse perturbation
    orig_score: jax.Array  # unperturbed class score
    n_steps_run: jax.Array  # steps actually applied (== N unless early_stop)


@partial(jax.jit, static_argnames=("score_fn", "threshold", "mask_type"))
def init_mask_central(
    score_fn: ScoreFn,
    seq: jax.Array,
    target: jax.Array,
    threshold: float = 0.9,
    mask_type: str = "freeze",
) -> jax.Array:
    """Central init, exact reference selection rule (mask.py:121-154):
    shrink the centered mask and return the FIRST candidate whose score-drop
    ratio falls BELOW ``threshold`` — i.e. the first mask that no longer
    drops the score enough (the reference breaks at ``score_ratio <
    threshold`` and keeps that new_mask). All probes in one batched forward.

    Returns pre-sigmoid logits (T,) in {-5, +5}.
    """
    t = seq.shape[0]
    target = jnp.asarray(target)

    fully_frozen = jnp.broadcast_to(seq[0], seq.shape)
    probe = lambda clip: score_fn(clip)[target]
    orig_score = probe(seq)
    frozen_score = probe(fully_frozen)

    if t // 2 - 1 < 1:
        # degenerate tiny clips: the reference would crash (new_mask unbound);
        # we return the all-on mask
        return jnp.full((t,), 5.0, jnp.float32)
    n_cand = t // 2 - 1
    ii = jnp.arange(1, n_cand + 1)  # i = 1 .. T//2-1
    pos = jnp.arange(t)
    # ones with the first i and last i entries zeroed
    cand_masks = ((pos[None, :] >= ii[:, None]) & (pos[None, :] < t - ii[:, None])).astype(
        seq.dtype
    )

    # lax.map (not vmap): the candidates run sequentially so that, under an
    # outer per-clip vmap at production batch, in-flight memory is ONE
    # batch-wide forward rather than n_cand+2 of them (batch 128 x 9 probes
    # = 24.6G > HBM). The init is ~9 forwards vs the search's 300 fwd+bwd,
    # so serializing candidates costs nothing end to end. The perturbed
    # clip is built inside the body so all candidates never coexist.
    cand_scores = jax.lax.map(
        lambda m: probe(perturb_sequence(seq, m, perturbation_type=mask_type)),
        cand_masks,
    )
    ratios = (orig_score - cand_scores) / (orig_score - frozen_score)
    below = ratios < threshold
    first_below = jnp.argmax(below)  # 0 if none True
    chosen = jnp.where(jnp.any(below), first_below, n_cand - 1)
    mask01 = cand_masks[chosen]
    # logits are always f32 (Adam state precision), whatever the clip dtype
    return jnp.where(mask01 == 0, -5.0, 5.0).astype(jnp.float32)


def init_mask_random(key: jax.Array, t: int, dtype=jnp.float32) -> jax.Array:
    """Random init (mask.py:156-165). Returns pre-sigmoid logits (T,)."""
    u = jax.random.uniform(key, (t,), dtype)
    mask = (u > 0.7).astype(dtype)
    mask = (mask - 0.5) * 5.0
    # nudge to avoid a NaN TV norm when the mask is constant
    all_same = jnp.abs(mask.sum()) == 2.5 * t
    return mask.at[min(8, t - 1)].add(jnp.where(all_same, 0.1, 0.0))


def _search_pieces(
    score_fn, seq, target, lam1, lam2, lr, perturbation_type,
    early_stop, eta, closed_form, eta_patience=1,
):
    """Shared loss/step construction for the monolithic and the chunked
    search paths — one definition so they are the same math by construction."""
    target = jnp.asarray(target)
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    def loss_fn(logits):
        m = jax.nn.sigmoid(logits)
        l1 = lam1 * jnp.sum(jnp.abs(m))
        tv = lam2 * tv_norm(m, 3.0, 3.0)
        # closed_form (default True): the freeze transition matrix as a few
        # fused HLOs instead of a 2(T-1)-op scan per step (fwd + transpose)
        # — identical math up to ~1e-4 float reassociation; set
        # closed_form=False (MaskConfig.closed_form) for the bit-exact scan
        # path in exact-parity comparison runs
        perturbed = perturb_sequence(
            seq, m, perturbation_type, closed_form=closed_form
        )
        # upcast: a bf16 score_fn must not change the loss/carry dtype (the
        # make_search_carry aux placeholders are f32, and lax.scan rejects
        # carry dtype drift)
        class_score = score_fn(perturbed)[target].astype(jnp.float32)
        total = l1 + tv + class_score
        return total, (l1, tv, class_score)

    def step(carry, _):
        logits, opt_state, old_loss, active, n_run, _, streak = carry
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(logits)
        if early_stop:
            # patience window (eta_patience): freeze only after M CONSECUTIVE
            # sub-eta steps. M=1 is exactly the reference's intended one-shot
            # criterion (FindMasksComparison_I3D_smth.py:209); M>1 tames its
            # measured brittleness — spurious fires on the flat first step at
            # loose etas, and single-step plateaus mid-descent (PERF.md r4/r5)
            sub_eta = jnp.abs(old_loss - loss) < eta
            streak = jnp.where(sub_eta, streak + 1, 0)
            active = active & (streak < eta_patience)
        updates, new_opt_state = opt.update(grads, opt_state, logits)
        new_logits = optax.apply_updates(logits, updates)
        logits = jnp.where(active, new_logits, logits)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(active, new, old),
            new_opt_state,
            opt_state,
        )
        n_run = n_run + active.astype(jnp.int32)
        return (logits, opt_state, loss, active, n_run, aux, streak), None

    return opt, loss_fn, step


def make_search_carry(mask_init_logits: jax.Array, lr: float = 0.2):
    """Initial carry for the (chunkable) mask search. The carry is a plain
    pytree of arrays, so it can cross jit-program boundaries — the basis of
    the segmented execution in ``api.find_masks`` (some environments cap
    single-program execution time well under a 300-step search)."""
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    # loss/aux are always f32 (score_fn output is upcast; the mask logits
    # stay f32 for Adam) regardless of the clip dtype — bf16 clip storage
    # must not change the optimization arithmetic
    zero = jnp.zeros((), jnp.float32)
    return (
        mask_init_logits,
        opt.init(mask_init_logits),
        jnp.asarray(999999.0, jnp.float32),
        jnp.asarray(True),
        jnp.asarray(0, jnp.int32),
        (zero, zero, zero),  # aux placeholder (overwritten on step 1)
        jnp.asarray(0, jnp.int32),  # consecutive sub-eta streak (patience)
    )


@partial(
    jax.jit,
    static_argnames=(
        "score_fn",
        "n_steps",
        "perturbation_type",
        "early_stop",
        "lr",
        "closed_form",
        "eta_patience",
    ),
)
def search_segment(
    score_fn: ScoreFn,
    seq: jax.Array,
    target: jax.Array,
    carry,
    n_steps: int = 100,
    lam1: float = 0.01,
    lam2: float = 0.02,
    lr: float = 0.2,
    perturbation_type: str = "freeze",
    early_stop: bool = False,
    eta: float = 1e-5,
    closed_form: bool = True,
    eta_patience: int = 1,
):
    """``n_steps`` of the mask search from ``carry`` -> new carry. Chaining
    segments is bit-identical to one long scan (the carry holds the exact
    loop state: logits, Adam state, last loss, early-stop flag, counters)."""
    _, _, step = _search_pieces(
        score_fn, seq, target, lam1, lam2, lr, perturbation_type,
        early_stop, eta, closed_form, eta_patience,
    )
    carry, _ = jax.lax.scan(step, carry, None, length=n_steps)
    return carry


@partial(jax.jit, static_argnames=("score_fn",))
def finalize_search(
    score_fn: ScoreFn,
    seq: jax.Array,
    target: jax.Array,
    carry,
) -> MaskSearchResult:
    """Carry -> MaskSearchResult (mask + the reverse/orig score forwards)."""
    target = jnp.asarray(target)
    logits, _, final_loss, _, n_run, (l1, tv, freeze_score), _ = carry
    # Reported losses are the LAST IN-LOOP values — computed at the logits
    # before the final Adam step — exactly what the reference writes out
    # (FindMasksComparison_I3D_smth.py:198-239: class_loss.item() is recorded
    # after the loop without recomputation, while time_mask gets the final
    # step applied). The mask and reverse score use the post-step logits.
    mask = jax.nn.sigmoid(logits)
    reverse_score = score_fn(perturb_sequence(seq, mask, "reverse"))[target]
    orig_score = score_fn(seq)[target]
    return MaskSearchResult(
        mask=mask,
        loss=final_loss,
        l1_loss=l1,
        tv_loss=tv,
        freeze_score=freeze_score,
        reverse_score=reverse_score,
        orig_score=orig_score,
        n_steps_run=n_run,
    )


@partial(
    jax.jit,
    static_argnames=(
        "score_fn",
        "n_steps",
        "perturbation_type",
        "early_stop",
        "lr",
        "closed_form",
        "eta_patience",
    ),
)
def find_mask_from_carry(
    score_fn: ScoreFn,
    seq: jax.Array,
    target: jax.Array,
    carry,
    n_steps: int = 300,
    lam1: float = 0.01,
    lam2: float = 0.02,
    lr: float = 0.2,
    perturbation_type: str = "freeze",
    early_stop: bool = False,
    eta: float = 1e-5,
    closed_form: bool = True,
    eta_patience: int = 1,
) -> MaskSearchResult:
    """Full search + finalize starting from an EXISTING carry (a
    ``make_search_carry`` result, possibly already advanced by segments).
    ``api.find_masks``'s monolithic path feeds its prologue's carry here, so
    the monolithic and the chunked path consume the SAME carry construction
    by wiring, not by coincidence."""
    target = jnp.asarray(target)
    _, loss_fn, step = _search_pieces(
        score_fn, seq, target, lam1, lam2, lr, perturbation_type,
        early_stop, eta, closed_form, eta_patience,
    )
    carry, _ = jax.lax.scan(step, carry, None, length=n_steps)
    if n_steps == 0:  # degenerate: report metrics at the (unstepped) logits
        logits, opt_state, _, active, n_run, _, streak = carry
        final_loss, aux = loss_fn(carry[0])
        carry = (logits, opt_state, final_loss, active, n_run, aux, streak)
    return finalize_search(score_fn, seq, target, carry)


@partial(
    jax.jit,
    static_argnames=(
        "score_fn",
        "n_steps",
        "perturbation_type",
        "early_stop",
        "lr",
        "closed_form",
        "eta_patience",
    ),
)
def find_mask(
    score_fn: ScoreFn,
    seq: jax.Array,
    target: jax.Array,
    mask_init_logits: jax.Array,
    n_steps: int = 300,
    lam1: float = 0.01,
    lam2: float = 0.02,
    lr: float = 0.2,
    perturbation_type: str = "freeze",
    early_stop: bool = False,
    eta: float = 1e-5,
    closed_form: bool = True,
    eta_patience: int = 1,
) -> MaskSearchResult:
    """Optimize a temporal mask for one clip (vmap over clips for batches).

    score_fn must return post-softmax class probabilities; only the mask
    logits receive gradients (model params are closed over / stopped).
    """
    init = make_search_carry(mask_init_logits, lr)
    return find_mask_from_carry(
        score_fn,
        seq,
        target,
        init,
        n_steps=n_steps,
        lam1=lam1,
        lam2=lam2,
        lr=lr,
        perturbation_type=perturbation_type,
        early_stop=early_stop,
        eta=eta,
        closed_form=closed_form,
        eta_patience=eta_patience,
    )


def find_mask_batched(
    score_fn: ScoreFn,
    seqs: jax.Array,
    targets: jax.Array,
    mask_init_logits: jax.Array,
    **kwargs,
) -> MaskSearchResult:
    """vmap of find_mask over a leading clip axis — the TPU headline win:
    every clip's 300-step Adam search runs in parallel."""
    fn = partial(find_mask, score_fn, **kwargs)
    return jax.vmap(fn)(seqs, targets, mask_init_logits)
