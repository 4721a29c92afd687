"""Parity tests for the interpretability engine vs the reference mask math."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ivf_tpu.interpret import (
    find_mask,
    find_submasks_from_mask,
    freeze_perturb,
    init_mask_central,
    init_mask_random,
    perturb_sequence,
    reverse_perturb,
    snap_mask,
    tv_norm,
)
from ivf_tpu.interpret.gradcam import cam_from_activation, grad_cam
from ivf_tpu.interpret.mask_opt import find_mask_batched


@pytest.fixture(scope="module")
def ref_mask(reference_pt_path):
    import importlib

    return importlib.import_module("mask")


def _rand_seq(t=16, h=4, w=4, c=2, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(t, h, w, c).astype(np.float32)


def _to_torch(seq):
    # (T,H,W,C) -> torch (B=1, C, T, H, W)
    return torch.from_numpy(seq.transpose(3, 0, 1, 2)[None])


MASK_CASES = [
    np.zeros(16, np.float32),
    np.ones(16, np.float32),
    np.linspace(0, 1, 16).astype(np.float32),
    np.array([0, 0, 1, 1, 1, 0, 0, 0.5, 0.6, 0, 0.05, 1, 1, 1, 1, 1], np.float32),
    np.array([1, 0.3, 0, 0, 0.2, 0.2, 0.2, 0, 0, 0, 0, 0, 0, 0, 0, 1], np.float32),
]


@pytest.mark.parametrize("mask", MASK_CASES, ids=range(len(MASK_CASES)))
def test_freeze_perturb_parity(ref_mask, mask):
    seq = _rand_seq()
    ref = ref_mask.perturb_sequence(
        _to_torch(seq), torch.from_numpy(mask), perturbation_type="freeze"
    ).numpy()[0].transpose(1, 2, 3, 0)
    ours = np.asarray(freeze_perturb(jnp.asarray(seq), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mask", MASK_CASES, ids=range(len(MASK_CASES)))
def test_reverse_perturb_parity(ref_mask, mask):
    seq = _rand_seq(seed=1)
    ref = ref_mask.perturb_sequence(
        _to_torch(seq), torch.from_numpy(mask), perturbation_type="reverse"
    ).numpy()[0].transpose(1, 2, 3, 0)
    ours = np.asarray(reverse_perturb(jnp.asarray(seq), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_reverse_perturb_random_masks(ref_mask):
    rng = np.random.RandomState(7)
    for trial in range(10):
        t = rng.choice([8, 15, 16, 17])
        mask = (rng.rand(t) * 1.2 - 0.1).clip(0, 1).astype(np.float32)
        seq = _rand_seq(t=t, seed=100 + trial)
        ref = ref_mask.perturb_sequence(
            _to_torch(seq), torch.from_numpy(mask), perturbation_type="reverse"
        ).numpy()[0].transpose(1, 2, 3, 0)
        ours = np.asarray(reverse_perturb(jnp.asarray(seq), jnp.asarray(mask)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6, err_msg=f"trial {trial}")


def test_find_submasks_parity(ref_mask):
    for mask in MASK_CASES:
        ref = ref_mask.find_submasks_from_mask(torch.from_numpy(mask), 0.1)
        ours = find_submasks_from_mask(mask, 0.1)
        assert ref == ours


@pytest.mark.parametrize("mask", MASK_CASES[1:], ids=range(len(MASK_CASES) - 1))
def test_tv_norm_parity(ref_mask, mask):
    ref = float(ref_mask.calc_tv_norm(torch.from_numpy(mask), p=3, q=3))
    ours = float(tv_norm(jnp.asarray(mask), 3.0, 3.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_snap_mask():
    m = jnp.asarray([0.2, 0.5, 0.51, 0.9])
    np.testing.assert_array_equal(np.asarray(snap_mask(m)), [0, 0, 1, 1])


# ---------------------------------------------------------------------------
# A tiny temporally-sensitive score model implemented identically in torch
# and jax so the full optimization trajectory can be compared.
# ---------------------------------------------------------------------------


def _make_score_pair(t=16, num_classes=5, seed=3):
    rng = np.random.RandomState(seed)
    w = rng.randn(num_classes, t).astype(np.float32) * 0.5

    def score_jax(clip):  # (T, H, W, C) -> (num_classes,) softmax probs
        frame_means = jnp.mean(clip, axis=(1, 2, 3))  # (T,)
        logits = jnp.asarray(w) @ frame_means
        return jax.nn.softmax(logits)

    def score_torch(clip_t):  # torch (1, C, T, H, W) -> (1, num_classes)
        frame_means = clip_t[0].mean(dim=(0, 2, 3))  # (T,)
        logits = torch.from_numpy(w) @ frame_means
        return torch.softmax(logits, dim=0)[None]

    return score_jax, score_torch


@pytest.mark.parametrize("perturbation_type", ["freeze", "reverse"])
@pytest.mark.slow
def test_find_mask_full_trajectory_parity(ref_mask, perturbation_type):
    """FULL 300-step Adam mask optimization (the reference's production
    budget, FindMasksComparison_I3D_smth.py:115-119): ours vs a torch
    replica of the reference loop (lines 188-214) using the reference's own
    perturb/TV functions, on a cheap temporally-sensitive stub score model.
    The same gate on the real synced-weight I3D runs in
    test_mask_loss_parity_real_i3d / scripts/mask_parity_check.py."""
    t, n_steps, lam1, lam2 = 16, 300, 0.01, 0.02
    seq = _rand_seq(t=t, seed=5)
    score_jax, score_torch = _make_score_pair(t=t)
    target = 2
    init_logits = np.where(
        (np.arange(t) >= 3) & (np.arange(t) < t - 3), 5.0, -5.0
    ).astype(np.float32)

    # --- torch replica of the reference loop ---
    seq_t = _to_torch(seq)
    time_mask = torch.tensor(init_logits, requires_grad=True)
    optimizer = torch.optim.Adam([time_mask], lr=0.2)
    for _ in range(n_steps):
        mask_clip = torch.sigmoid(time_mask)
        l1 = lam1 * torch.sum(torch.abs(mask_clip))
        tv = lam2 * ref_mask.calc_tv_norm(mask_clip, p=3, q=3)
        class_score = score_torch(
            ref_mask.perturb_sequence(
                seq_t, mask_clip, perturbation_type=perturbation_type
            )
        )[0, target]
        loss = l1 + tv + class_score
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
    ref_final_mask = torch.sigmoid(time_mask).detach().numpy()
    ref_final_loss = float(loss)

    # --- ours (closed_form=False: the bit-exact scan path for parity) ---
    res = find_mask(
        score_jax,
        jnp.asarray(seq),
        target,
        jnp.asarray(init_logits),
        n_steps=n_steps,
        lam1=lam1,
        lam2=lam2,
        perturbation_type=perturbation_type,
        closed_form=False,
    )
    np.testing.assert_allclose(np.asarray(res.mask), ref_final_mask, rtol=1e-3, atol=1e-4)
    # the production fast path (closed_form=True) must satisfy the 1%
    # mask-loss gate (BASELINE.md:31) over the full 300-step trajectory
    res_cf = find_mask(
        score_jax,
        jnp.asarray(seq),
        target,
        jnp.asarray(init_logits),
        n_steps=n_steps,
        lam1=lam1,
        lam2=lam2,
        perturbation_type=perturbation_type,
        closed_form=True,
    )
    np.testing.assert_allclose(float(res_cf.loss), ref_final_loss, rtol=1e-2)
    # reported loss/freeze_score are the LAST IN-LOOP values (computed at
    # the pre-final-step logits), exactly what the reference records — the
    # torch replica's `loss`/`class_score` from the final iteration
    np.testing.assert_allclose(float(res.loss), ref_final_loss, rtol=1e-4)
    if perturbation_type == "freeze":
        np.testing.assert_allclose(
            float(res.freeze_score), float(class_score), rtol=1e-4
        )
    with torch.no_grad():
        m = torch.sigmoid(time_mask)
    assert int(res.n_steps_run) == n_steps
    # the reference's "reverse score" of the found mask
    with torch.no_grad():
        rev_ref = float(
            score_torch(ref_mask.perturb_sequence(seq_t, m, perturbation_type="reverse"))[
                0, target
            ]
        )
    np.testing.assert_allclose(float(res.reverse_score), rev_ref, rtol=1e-4)


def _mask_parity_real_i3d(n_steps: int, n_clips: int):
    """Shared body of the BASELINE.md:31 parity gate: importer-synced I3D
    (KTH head — the smallest shape the reference's hardcoded (t,4,5) logits
    pool accepts), central init, full reference loop semantics, ≤1% final
    mask-loss deviation per clip."""
    import importlib

    import torch as _torch

    from ivf_tpu.models import i3d_kth
    from ivf_tpu.utils.import_torch import i3d_state_dict_to_variables

    t_len, lam1, lam2 = 16, 0.02, 0.04

    ref_mask_mod = importlib.import_module("mask")
    ref_mod = importlib.import_module("models.I3D_doubled_kth")
    _torch.manual_seed(0)
    ref = ref_mod.Model(
        num_classes=6,
        finalTimeLength=2,
        dropout_keep_prob=0.0,
        stride_mod_layers="",
        softMax=True,
    )
    ref.eval()
    variables = i3d_state_dict_to_variables(ref.state_dict())
    model = i3d_kth(
        num_classes=6, final_time_length=2, dropout_rate=0.0, softmax=True
    )
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[0]

    rng = np.random.RandomState(1)
    clips = rng.randn(n_clips, t_len, 120, 160, 3).astype(np.float32)
    targets = [2, 5][:n_clips]
    inits = np.stack(
        [
            np.asarray(
                init_mask_central(
                    score_fn, jnp.asarray(clips[i]), targets[i]
                )
            )
            for i in range(n_clips)
        ]
    )

    for i in range(n_clips):
        seq_t = torch.from_numpy(
            np.ascontiguousarray(clips[i].transpose(3, 0, 1, 2))[None]
        )
        time_mask = torch.tensor(inits[i], requires_grad=True)
        optimizer = torch.optim.Adam([time_mask], lr=0.2)
        for _ in range(n_steps):
            mask_clip = torch.sigmoid(time_mask)
            l1 = lam1 * torch.sum(torch.abs(mask_clip))
            tv = lam2 * ref_mask_mod.calc_tv_norm(mask_clip, p=3, q=3)
            class_loss = ref(
                ref_mask_mod.perturb_sequence(
                    seq_t, mask_clip, perturbation_type="freeze"
                )
            )[0, targets[i]]
            loss = l1 + tv + class_loss
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
        ref_loss = float(loss.detach())

        res = find_mask(
            score_fn,
            jnp.asarray(clips[i]),
            targets[i],
            jnp.asarray(inits[i]),
            n_steps=n_steps,
            lam1=lam1,
            lam2=lam2,
            closed_form=True,  # the production fast path IS the gated path
        )
        rel = abs(float(res.loss) - ref_loss) / max(abs(ref_loss), 1e-9)
        assert rel <= 1e-2, f"clip {i}: rel loss dev {rel:.3e} > 1%"


@pytest.mark.slow
def test_mask_loss_parity_real_i3d(reference_pt_path):
    """Reduced step budget by default (regression guard); set
    IVF_FULL_PARITY=1 for the full 300-step gate on 2 clips (the full
    measurement with 4 clips + the bf16 production path lives in
    scripts/mask_parity_check.py, results in PERF.md / PARITY_r03.json)."""
    import os as _os

    n_steps = 300 if _os.environ.get("IVF_FULL_PARITY") else 40
    _mask_parity_real_i3d(n_steps, 2)


@pytest.mark.slow
def test_mask_loss_parity_real_i3d_full300(reference_pt_path):
    """The BASELINE.md:31 gate at the FULL 300-step budget runs in CI
    (slow tier), not only in the archived PARITY_r03.json — one clip keeps
    it ~10 min on the 1-core host while still re-verifying the whole-budget
    accumulation behavior across refactors (VERDICT r3 #9)."""
    _mask_parity_real_i3d(300, 1)


def test_find_mask_early_stop_freezes_updates():
    t = 8
    seq = _rand_seq(t=t, seed=9)
    score_jax, _ = _make_score_pair(t=t)
    # non-constant init: a constant mask NaNs the TV-norm gradient, exactly
    # as in the reference (mask.py:163-165 nudges random inits for this)
    init = jnp.asarray(np.where(np.arange(t) % 2 == 0, 1.0, -1.0), jnp.float32)
    res = find_mask(
        score_jax, jnp.asarray(seq), 0, init, n_steps=50, early_stop=True, eta=1e-2
    )
    assert int(res.n_steps_run) < 50


def test_eta_patience_constant_loss_runs_exactly_m_steps():
    """eta_patience=M freezes only after M CONSECUTIVE sub-eta steps. With a
    constant score_fn and lam1=lam2=0 the loss delta is exactly 0 from step 2
    onward (step 1's delta vs the 999999 init sentinel is huge), so the
    streak reaches M at step M+1 and n_steps_run == M exactly. M=1 is the
    reference's intended one-shot criterion
    (FindMasksComparison_I3D_smth.py:209)."""
    t = 8
    seq = jnp.asarray(_rand_seq(t=t, seed=3))
    score = lambda clip: jnp.full((3,), 1.0 / 3.0, jnp.float32)
    init = jnp.asarray(
        np.where(np.arange(t) % 2 == 0, 1.0, -1.0), jnp.float32
    )
    for m in (1, 3, 5):
        res = find_mask(
            score, seq, 0, init, n_steps=20, lam1=0.0, lam2=0.0,
            early_stop=True, eta=1e-6, eta_patience=m,
        )
        assert int(res.n_steps_run) == m, (m, int(res.n_steps_run))
    # patience longer than the budget: the clip never freezes
    res = find_mask(
        score, seq, 0, init, n_steps=4, lam1=0.0, lam2=0.0,
        early_stop=True, eta=1e-6, eta_patience=10,
    )
    assert int(res.n_steps_run) == 4


def test_eta_patience_chunked_bit_identical_and_monotone():
    """The patience streak lives in the search carry, so segmented execution
    (the chunked api.find_masks path) is bit-identical to the monolithic
    search at any eta_patience; and a larger patience can only stop later."""
    from ivf_tpu.interpret.mask_opt import (
        finalize_search,
        make_search_carry,
        search_segment,
    )

    t = 8
    seq = jnp.asarray(_rand_seq(t=t, seed=9))
    score_jax, _ = _make_score_pair(t=t)
    init = jnp.asarray(
        np.where(np.arange(t) % 2 == 0, 1.0, -1.0), jnp.float32
    )
    kw = dict(early_stop=True, eta=1e-2, eta_patience=3)
    mono = find_mask(score_jax, seq, 0, init, n_steps=50, **kw)
    assert int(mono.n_steps_run) < 50  # it actually froze

    carry = make_search_carry(init)
    for n in (20, 20, 10):
        carry = search_segment(score_jax, seq, 0, carry, n_steps=n, **kw)
    seg = finalize_search(score_jax, seq, 0, carry)
    for a, b in zip(mono, seg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    one_shot = find_mask(
        score_jax, seq, 0, init, n_steps=50,
        early_stop=True, eta=1e-2, eta_patience=1,
    )
    assert int(one_shot.n_steps_run) <= int(mono.n_steps_run)


@pytest.mark.slow
def test_find_mask_batched_vmap():
    t, b = 8, 4
    score_jax, _ = _make_score_pair(t=t)
    seqs = jnp.asarray(np.stack([_rand_seq(t=t, seed=i) for i in range(b)]))
    targets = jnp.asarray([0, 1, 2, 3])
    inits = jnp.zeros((b, t))
    res = find_mask_batched(score_jax, seqs, targets, inits, n_steps=10)
    assert res.mask.shape == (b, t)
    # batched result equals per-clip result
    single = find_mask(score_jax, seqs[1], 1, inits[1], n_steps=10)
    np.testing.assert_allclose(
        np.asarray(res.mask[1]), np.asarray(single.mask), rtol=1e-4, atol=1e-5
    )


def test_init_mask_central_semantics():
    """Mirror of the reference central init (mask.py:121-154) on a stub
    score function where the expected choice is computable by hand."""
    t = 16
    seq = _rand_seq(t=t, seed=11)

    # score = 1 - fraction-of-frames-frozen-ish: make score drop grow with
    # mask size so a specific candidate crosses the 0.9 ratio
    def score_fn(clip):
        # sensitive to how much the clip deviates from the original
        diff = jnp.mean(jnp.abs(clip - jnp.asarray(seq)))
        s = 1.0 - diff  # decreasing in perturbation strength
        return jnp.stack([s, 1.0 - s])

    logits = init_mask_central(score_fn, jnp.asarray(seq), 0, threshold=0.9)
    assert logits.shape == (t,)
    assert set(np.unique(np.asarray(logits))).issubset({-5.0, 5.0})
    # centered structure: symmetric zeros at the edges
    m01 = (np.asarray(logits) > 0).astype(int)
    left_zeros = np.argmax(m01) if m01.any() else t
    right_zeros = np.argmax(m01[::-1]) if m01.any() else t
    assert left_zeros == right_zeros >= 1

    # reference replica on the same stub
    def probe(mask01):
        pert = perturb_sequence(jnp.asarray(seq), jnp.asarray(mask01), "freeze")
        return float(score_fn(pert)[0])

    orig = float(score_fn(jnp.asarray(seq))[0])
    frozen = float(score_fn(jnp.broadcast_to(seq[0], seq.shape))[0])
    chosen = None
    for i in range(1, t // 2):
        new_mask = np.ones(t, np.float32)
        new_mask[:i] = 0
        new_mask[-i:] = 0
        ratio = (orig - probe(new_mask)) / (orig - frozen)
        chosen = new_mask
        if ratio < 0.9:
            break
    expected = np.where(chosen == 0, -5.0, 5.0)
    np.testing.assert_array_equal(np.asarray(logits), expected)


def test_init_mask_random_statistics():
    key = jax.random.PRNGKey(0)
    logits = init_mask_random(key, 16)
    vals = np.asarray(logits)
    assert set(np.round(np.abs(vals), 1)).issubset({2.5, 2.4, 2.6})
    # ~30% on (the reference's code behavior, not its docstring)
    many = np.mean(
        [np.mean(np.asarray(init_mask_random(jax.random.PRNGKey(i), 16)) > 0) for i in range(50)]
    )
    assert 0.2 < many < 0.4


def test_cam_from_activation_matches_reference_math():
    """Numpy mirror of grad_cam_videos.py:98-135 (global weights, sequence
    normalization)."""
    rng = np.random.RandomState(0)
    act = rng.randn(2, 4, 5, 3).astype(np.float32)  # (T',H',W',C)
    grads = rng.randn(2, 4, 5, 3).astype(np.float32)
    clip_len, hw = 8, (4, 5)  # same spatial size => resize is identity

    weights = grads.mean(axis=(0, 1, 2))
    cam_ref = np.maximum((act * weights).sum(-1), 0)  # (T',H,W)
    cam_ref = np.repeat(cam_ref, clip_len // 2, axis=0)
    cam_ref = cam_ref - cam_ref.min()
    cam_ref = cam_ref / cam_ref.max()

    ours = np.asarray(
        cam_from_activation(jnp.asarray(act), jnp.asarray(grads), clip_len, hw)
    )
    np.testing.assert_allclose(ours, cam_ref, rtol=1e-4, atol=1e-5)


def test_grad_cam_end_to_end_finite_difference():
    """grad_cam's gradient wrt the activation matches full finite
    differences of the head (every activation entry), the CAM equals
    cam_from_activation on those FD grads, and target_index=None picks the
    argmax class. (Previously this test asserted only shape + min==0 /
    max==1 — properties the normalization guarantees for ANY gradients.)"""
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(6, 3).astype(np.float32))

    def features_fn(clip):  # (T=4,H=4,W=4,C=3) -> (T'=2,H'=2,W'=2,C=3)
        pooled = clip.reshape(2, 2, 2, 2, 2, 2, 3).mean(axis=(1, 3, 5))
        return pooled

    def head_fn(act):
        return jax.nn.softmax(w @ jnp.mean(act, axis=(0, 1, 2)))

    clip = jnp.asarray(rng.randn(4, 4, 4, 3).astype(np.float32))
    target = 2
    cam, scores = grad_cam(features_fn, head_fn, clip, target_index=target)
    assert cam.shape == (4, 4, 4) and scores.shape == (6,)

    # full finite-difference gradient of head_fn(act)[target] wrt act
    act = np.asarray(features_fn(clip), np.float64)
    eps = 1e-4
    fd = np.zeros_like(act)
    f = lambda a: float(head_fn(jnp.asarray(a, jnp.float32))[target])
    for idx in np.ndindex(act.shape):
        ap, am = act.copy(), act.copy()
        ap[idx] += eps
        am[idx] -= eps
        fd[idx] = (f(ap) - f(am)) / (2 * eps)
    cam_fd = np.asarray(
        cam_from_activation(
            jnp.asarray(act, jnp.float32), jnp.asarray(fd, jnp.float32), 4, (4, 4)
        )
    )
    # tolerance: f32 head evals at eps=1e-4 give ~4e-4 FD noise; a wiring
    # bug (wrong class, activations instead of grads) changes values by O(1)
    np.testing.assert_allclose(np.asarray(cam), cam_fd, rtol=1e-2, atol=1e-3)

    # target_index=None explains the predicted argmax class
    cam_auto, scores_auto = grad_cam(features_fn, head_fn, clip)
    cam_argmax, _ = grad_cam(
        features_fn, head_fn, clip, target_index=int(jnp.argmax(scores_auto))
    )
    np.testing.assert_allclose(np.asarray(cam_auto), np.asarray(cam_argmax))


@pytest.mark.slow
def test_freeze_matrix_equals_scan():
    """Transition-matrix freeze == literal scan recurrence (all mask cases)."""
    for k, mask in enumerate(MASK_CASES):
        seq = _rand_seq(seed=40 + k)
        a = np.asarray(freeze_perturb(jnp.asarray(seq), jnp.asarray(mask), use_matrix=True))
        b = np.asarray(freeze_perturb(jnp.asarray(seq), jnp.asarray(mask), use_matrix=False))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=f"case {k}")
    # gradients agree too
    mask = jnp.asarray(MASK_CASES[2])
    seq = jnp.asarray(_rand_seq(seed=50))
    g1 = jax.grad(lambda m: jnp.sum(freeze_perturb(seq, m, use_matrix=True) ** 2))(mask)
    g2 = jax.grad(lambda m: jnp.sum(freeze_perturb(seq, m, use_matrix=False) ** 2))(mask)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


# ---- generic 2D grad-cam / guided backprop (vendored-lib parity) ----


def _tiny_torch_cnn(seed=7):
    """features: conv-relu-conv-relu; classifier: linear on the flattened
    activation — the model shape GradCam (grad-cam.py:96-145) assumes."""
    torch.manual_seed(seed)
    feat = torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3, padding=1),
        torch.nn.ReLU(),
        torch.nn.Conv2d(4, 5, 3, padding=1),
        torch.nn.ReLU(),
    )
    head = torch.nn.Linear(5 * 6 * 6, 6)
    return feat, head


def _jax_fns_from_torch(feat, head):
    """features_fn/head_fn over channels-last jax arrays mirroring the
    torch modules exactly (weights copied)."""
    from ivf_tpu.ops.conv import conv2d_same_torch

    k1 = jnp.asarray(feat[0].weight.detach().numpy().transpose(2, 3, 1, 0))
    b1 = jnp.asarray(feat[0].bias.detach().numpy())
    k2 = jnp.asarray(feat[2].weight.detach().numpy().transpose(2, 3, 1, 0))
    b2 = jnp.asarray(feat[2].bias.detach().numpy())
    wl = jnp.asarray(head.weight.detach().numpy())
    bl = jnp.asarray(head.bias.detach().numpy())

    def features_fn(img):  # (H, W, 3) -> (H, W, 5)
        x = conv2d_same_torch(img[None], k1, bias=b1)
        x = jnp.maximum(x, 0.0)
        x = conv2d_same_torch(x, k2, bias=b2)
        return jnp.maximum(x, 0.0)[0]

    def head_fn(act):  # flatten in torch's CHW order before the linear
        flat = jnp.transpose(act, (2, 0, 1)).reshape(-1)
        return wl @ flat + bl

    return features_fn, head_fn


def test_grad_cam_image_matches_torch_gradcam():
    """Full GradCam.__call__ parity (grad-cam.py:109-145) on a tiny CNN:
    torch hooks + numpy CAM vs grad_cam_image (identity-resize size)."""
    from ivf_tpu.interpret import grad_cam_image

    feat, head = _tiny_torch_cnn()
    rng = np.random.RandomState(3)
    img = rng.randn(6, 6, 3).astype(np.float32)

    # torch reference pass (hook-equivalent via retain_grad)
    x = torch.from_numpy(img.transpose(2, 0, 1)[None])
    act = feat(x)
    act.retain_grad()
    out = head(act.view(1, -1))
    index = int(out.detach().numpy().argmax())
    one_hot = torch.zeros_like(out)
    one_hot[0, index] = 1.0
    (one_hot * out).sum().backward()
    grads = act.grad.numpy()[0]  # (C', H', W')
    target = act.detach().numpy()[0]
    weights = grads.mean(axis=(1, 2))  # grad-cam.py:135
    cam_ref = np.maximum((weights[:, None, None] * target).sum(0), 0)
    cam_ref = cam_ref - cam_ref.min()
    cam_ref = cam_ref / cam_ref.max()

    features_fn, head_fn = _jax_fns_from_torch(feat, head)
    cam, scores = grad_cam_image(
        features_fn, head_fn, jnp.asarray(img), output_size=(6, 6)
    )
    assert int(jnp.argmax(scores)) == index
    np.testing.assert_allclose(
        np.asarray(out.detach().numpy()[0]), np.asarray(scores), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(cam), cam_ref, rtol=1e-3, atol=1e-5)


def test_guided_backprop_image_matches_torch_replica():
    """guided_relu VJP == GuidedBackpropReLU.backward (grad-cam.py:147-163):
    gradient flows only where input > 0 AND upstream gradient > 0."""
    from ivf_tpu.interpret import guided_backprop_image, guided_relu

    class GBReLU(torch.autograd.Function):  # modern port of lines 147-163
        @staticmethod
        def forward(ctx, inp):
            ctx.save_for_backward(inp)
            return inp.clamp(min=0)

        @staticmethod
        def backward(ctx, grad_output):
            (inp,) = ctx.saved_tensors
            return grad_output * (inp > 0).type_as(inp) * (
                grad_output > 0
            ).type_as(inp)

    feat, head = _tiny_torch_cnn(seed=11)
    rng = np.random.RandomState(4)
    img = rng.randn(6, 6, 3).astype(np.float32)
    index = 2

    x = torch.from_numpy(img.transpose(2, 0, 1)[None]).requires_grad_(True)
    h = GBReLU.apply(feat[0](x))
    h = GBReLU.apply(feat[2](h))
    out = head(h.view(1, -1))
    out[0, index].backward()
    gb_ref = x.grad.numpy()[0].transpose(1, 2, 0)  # -> (H, W, C)

    from ivf_tpu.ops.conv import conv2d_same_torch

    k1 = jnp.asarray(feat[0].weight.detach().numpy().transpose(2, 3, 1, 0))
    b1 = jnp.asarray(feat[0].bias.detach().numpy())
    k2 = jnp.asarray(feat[2].weight.detach().numpy().transpose(2, 3, 1, 0))
    b2 = jnp.asarray(feat[2].bias.detach().numpy())
    wl = jnp.asarray(head.weight.detach().numpy())
    bl = jnp.asarray(head.bias.detach().numpy())

    def score_fn(img):
        x = guided_relu(conv2d_same_torch(img[None], k1, bias=b1))
        x = guided_relu(conv2d_same_torch(x, k2, bias=b2))
        flat = jnp.transpose(x[0], (2, 0, 1)).reshape(-1)
        return wl @ flat + bl

    gb = guided_backprop_image(score_fn, jnp.asarray(img), index)
    np.testing.assert_allclose(np.asarray(gb), gb_ref, rtol=1e-4, atol=1e-5)


def test_combine_and_show_cam(tmp_path):
    """cam*gb combination (grad-cam.py:254-258) + show_cam_on_image blend
    formula (grad-cam.py:89-94) writes a valid image."""
    from ivf_tpu.interpret import combine_cam_gb
    from ivf_tpu.interpret.gradcam2d import preprocess_image, show_cam_on_image

    rng = np.random.RandomState(5)
    cam = rng.rand(6, 6).astype(np.float32)
    gb = rng.randn(6, 6, 3).astype(np.float32)
    out = np.asarray(combine_cam_gb(jnp.asarray(cam), jnp.asarray(gb)))
    np.testing.assert_allclose(out, cam[:, :, None] * gb, rtol=1e-6)

    img = rng.rand(6, 6, 3).astype(np.float32)
    path = str(tmp_path / "cam.jpg")
    blended = show_cam_on_image(img, cam, path)
    assert blended.shape == (6, 6, 3) and blended.dtype == np.uint8
    assert (tmp_path / "cam.jpg").exists()

    # preprocess_image: BGR flip + ImageNet normalization (grad-cam.py:74-87)
    pre = np.asarray(preprocess_image(img))
    means = np.array([0.485, 0.456, 0.406], np.float32)
    stds = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(
        pre, (img[:, :, ::-1] - means) / stds, rtol=1e-5, atol=1e-6
    )


def test_freeze_matrix_closed_form_equals_scan():
    """Closed-form (cumsum-log) transition matrix == the scan recurrence,
    values and gradients, including extreme logits where naive cumprod
    would underflow f32 or the masked exp would overflow."""
    from ivf_tpu.interpret.perturb import freeze_transition_matrix

    rng = np.random.RandomState(9)
    for t in (2, 3, 16, 31):
        m = jnp.asarray(rng.rand(t).astype(np.float32))
        a = freeze_transition_matrix(m, closed_form=True)
        b = freeze_transition_matrix(m, closed_form=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)

    seq = jnp.asarray(rng.randn(16, 3, 3, 2).astype(np.float32))
    for logits_np in (rng.randn(16) * 3, np.full(16, -40.0), np.full(16, 12.0)):
        logits = jnp.asarray(logits_np.astype(np.float32))

        def loss(lg, cf):
            w = freeze_transition_matrix(jax.nn.sigmoid(lg), closed_form=cf)
            return jnp.sum((w @ seq.reshape(16, -1)) ** 2)

        g1 = jax.grad(lambda lg: loss(lg, True))(logits)
        g2 = jax.grad(lambda lg: loss(lg, False))(logits)
        assert np.all(np.isfinite(np.asarray(g1)))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-5)


def test_find_mask_bf16_clip_storage():
    """find_mask accepts bf16 clips (the large-batch memory mode): logits,
    losses and scores stay f32 and the trajectory tracks the f32 one."""
    rng = np.random.RandomState(11)
    seq32 = jnp.asarray(rng.randn(8, 4, 4, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(6, 2).astype(np.float32) * 0.3)

    def make_score(seq_dtype):
        def score_fn(clip):
            # compute in seq_dtype (the model's compute path), report f32
            pooled = jnp.mean(clip.astype(seq_dtype), axis=(0, 1, 2))
            return jax.nn.softmax(
                (w.astype(seq_dtype) @ pooled).astype(jnp.float32)
            )
        return score_fn

    init = jnp.asarray(rng.randn(8).astype(np.float32))
    r32 = find_mask(make_score(jnp.float32), seq32, 2, init, n_steps=25)
    r16 = find_mask(
        make_score(jnp.bfloat16), seq32.astype(jnp.bfloat16), 2, init, n_steps=25
    )
    # contract: mask logits/losses stay f32 whatever the clip/compute dtype
    assert r16.mask.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(r16.loss)))
    np.testing.assert_allclose(
        np.asarray(r16.mask, np.float32), np.asarray(r32.mask), atol=0.05
    )


def test_find_mask_bf16_score_fn_output():
    """find_mask must accept a score_fn that RETURNS bf16 (a bf16 model's
    raw apply) — the loss upcasts internally so the lax.scan carry stays f32
    (code-review regression: carry-dtype mismatch TypeError)."""
    rng = np.random.RandomState(12)
    seq = jnp.asarray(rng.randn(8, 4, 4, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(6, 2).astype(np.float32) * 0.3)

    def score_fn(clip):
        pooled = jnp.mean(clip, axis=(0, 1, 2))
        return jax.nn.softmax(w @ pooled).astype(jnp.bfloat16)

    init = jnp.asarray(rng.randn(8).astype(np.float32))
    res = find_mask(score_fn, seq, 2, init, n_steps=10)
    assert res.loss.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(res.loss)))


def test_chunked_search_bit_identical_to_monolithic():
    """Segmented execution (make_search_carry -> search_segment chain ->
    finalize_search — the api.find_masks path on execution-time-capped
    backends, MaskConfig.chunk_steps) is BIT-identical to one find_mask
    call: the carry holds the exact loop state incl. Adam moments."""
    from ivf_tpu.interpret.mask_opt import (
        find_mask,
        finalize_search,
        make_search_carry,
        search_segment,
    )

    score_jax, _ = _make_score_pair()
    seq = _rand_seq(seed=11)
    target = jnp.asarray(2)
    init = jnp.where(jnp.arange(16) % 2 == 0, 5.0, -5.0).astype(jnp.float32)

    mono = find_mask(score_jax, seq, target, init, n_steps=50)

    carry = make_search_carry(init)
    for n in (20, 20, 10):  # 50 = 20+20+10, uneven tail like 300=100x3
        carry = search_segment(score_jax, seq, target, carry, n_steps=n)
    seg = finalize_search(score_jax, seq, target, carry)

    for a, b in zip(mono, seg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_find_masks_chunked_matches_monolithic_e2e(tmp_path):
    """api.find_masks with chunk_steps set produces identical masks/scores
    to the monolithic default (CPU backend auto = monolithic), with AND
    without the fused prologue+segment-1 program (MaskConfig.fuse_prologue
    — same ops traced into one program, so equality must be exact)."""
    from ivf_tpu.api import find_masks
    from ivf_tpu.config import Config
    import ivf_tpu.api as api_mod
    from ivf_tpu.models import ConvLSTMClassifier

    from ivf_tpu.data.synthetic import SyntheticClips

    def _DS(n=4, t=8, hw=16):
        return SyntheticClips(n, t=t, hw=hw, num_classes=3, lazy=False)

    model = ConvLSTMClassifier(
        num_classes=3, nb_lstm_units=4, lstm_layers=1, conv_kernel_size=3,
        effective_steps=(3, 7), dropout_rate=0.0, add_softmax=True,
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 3))
    )
    results = {}
    all_stats = {}
    orig_bm = api_mod.build_model
    api_mod.build_model = lambda c, softmax_override=None: model
    try:
        for name, chunk, fuse in [
            ("mono", None, True),
            ("chunked", 3, True),
            ("chunked_nofuse", 3, False),
        ]:
            cfg = Config.from_dict(
                {
                    "model_name": f"fmchunk_{name}",
                    "output_dir": str(tmp_path / name),
                    "conv_model": "clstm",
                    "num_classes": 3,
                    "batch_size": 4,
                    "clip_size": 8,
                    "input_spatial_size": 16,
                    "num_workers": 1,
                }
            )
            cfg.model.effective_steps = (3, 7)
            cfg.mask.opt_iter = 8
            cfg.mask.chunk_steps = chunk
            cfg.mask.fuse_prologue = fuse
            stats = {}
            tm, _ = find_masks(
                cfg, variables, dataset=_DS(), save_viz=False,
                do_gradcam=False, stats=stats,
            )
            results[name] = tm
            all_stats[name] = stats
    finally:
        api_mod.build_model = orig_bm

    assert len(results["mono"]) == len(results["chunked"]) == 4
    assert len(results["chunked_nofuse"]) == 4
    for ref in ("chunked", "chunked_nofuse"):
        for a, b in zip(results["mono"], results[ref]):
            np.testing.assert_array_equal(a["time_mask"], b["time_mask"])
            assert a["freeze_score"] == b["freeze_score"]
            assert a["reverse_score"] == b["reverse_score"]

    # launch accounting: opt_iter=8, chunk=3 -> seg1 + seg2 + rem(2) = 3
    # segment programs either way; the fused path folds segment 1 into the
    # prologue program (1 proseg1 launch + 2 loop launches) while the
    # unfused path launches a separate prologue then all 3 segments
    assert all_stats["chunked"]["segments_launched"] == 3
    assert all_stats["chunked_nofuse"]["segments_launched"] == 3
    assert len(all_stats["chunked"]["proseg1_seconds"]) == 1
    assert len(all_stats["chunked"]["segment_seconds"]) == 1
    assert all_stats["chunked_nofuse"]["proseg1_seconds"] == []
    assert len(all_stats["chunked_nofuse"]["segment_seconds"]) == 2


def test_find_masks_early_stop_converges_inside_fused_segment1(tmp_path):
    """Early-stop + fuse_prologue: when every clip converges INSIDE the
    fused prologue+segment-1 program (the measured production behavior —
    stop p50 ~90 < chunk 100, PERF.md round 4), the driver must launch NO
    further segments (the skip_rest branch) and still produce results
    identical to the unfused chunked and monolithic early-stop paths.
    eta=1e6 makes the one-shot criterion fire deterministically at step 1
    for every row."""
    import warnings

    from ivf_tpu.api import find_masks
    from ivf_tpu.config import Config
    import ivf_tpu.api as api_mod
    from ivf_tpu.models import ConvLSTMClassifier

    from ivf_tpu.data.synthetic import SyntheticClips

    model = ConvLSTMClassifier(
        num_classes=3, nb_lstm_units=4, lstm_layers=1, conv_kernel_size=3,
        effective_steps=(3, 7), dropout_rate=0.0, add_softmax=True,
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 3))
    )
    results = {}
    all_stats = {}
    orig_bm = api_mod.build_model
    api_mod.build_model = lambda c, softmax_override=None: model
    try:
        for name, chunk, fuse in [
            ("mono", None, True),
            ("fused", 3, True),
            ("nofuse", 3, False),
        ]:
            cfg = Config.from_dict(
                {
                    "model_name": f"fmes_{name}",
                    "output_dir": str(tmp_path / name),
                    "conv_model": "clstm",
                    "num_classes": 3,
                    "batch_size": 4,
                    "clip_size": 8,
                    "input_spatial_size": 16,
                    "num_workers": 1,
                }
            )
            cfg.model.effective_steps = (3, 7)
            cfg.mask.opt_iter = 8
            cfg.mask.chunk_steps = chunk
            cfg.mask.fuse_prologue = fuse
            cfg.mask.early_stop = True
            cfg.mask.eta = 1e6  # converge-at-step-1, deterministically
            stats = {}
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", UserWarning)  # loose-eta warn
                tm, _ = find_masks(
                    cfg,
                    variables,
                    dataset=SyntheticClips(4, t=8, hw=16, num_classes=3, lazy=False),
                    save_viz=False,
                    do_gradcam=False,
                    stats=stats,
                )
            results[name] = tm
            all_stats[name] = stats
    finally:
        api_mod.build_model = orig_bm

    # all rows frozen after the fused segment 1 -> skip_rest: the fused
    # program is the ONLY search launch; the unfused path launches its
    # separate prologue then stops after segment 1; neither runs the
    # remainder segment (frozen rows make it a mathematical no-op, and
    # early-stop's contract is to skip it)
    assert all_stats["fused"]["segments_launched"] == 1
    assert all_stats["fused"]["segment_seconds"] == []
    assert len(all_stats["fused"]["proseg1_seconds"]) == 1
    assert all_stats["nofuse"]["segments_launched"] == 1
    # eta=1e6 fires on the very first convergence check, before any update
    # applies — every row reports 0 steps run, on every path
    assert all(s["n_steps_run"] == [0] * 4 for s in all_stats.values())

    for ref in ("fused", "nofuse"):
        for a, b in zip(results["mono"], results[ref]):
            np.testing.assert_array_equal(a["time_mask"], b["time_mask"])
            assert a["freeze_score"] == b["freeze_score"]
            assert a["reverse_score"] == b["reverse_score"]
