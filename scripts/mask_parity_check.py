"""Quantify the BASELINE.md:31 mask-loss parity gate.

Runs the FULL production mask search — real importer-synced I3D (KTH head,
16x120x160: the smallest shape the reference's hardcoded (t,4,5) logits pool
accepts), central init, 300 Adam(0.2) steps — through BOTH stacks:

  * a torch replica of the reference loop
    (FindMasksComparison_I3D_smth.py:188-214 — sigmoid -> L1 + TV(3,3) +
    class prob -> backward -> step; the early stop is dead code, so all N
    steps run), with the reference's own ``mask.perturb_sequence`` /
    ``calc_tv_norm`` and a CPU replica of ``mask.init_mask`` central mode
    (mask.py:121-154 hardcodes torch.cuda.FloatTensor, so it cannot run
    as-is on this host);
  * our ``find_mask`` (closed_form False = bit-exact scan, and True = the
    production fast path), vmapped, from the same inits.

Reports max per-clip |Δ final loss| / |loss| and |Δ freeze score|, f32, and
optionally with bf16 score-path variables (--bf16) — the bench dtype.

Usage:  python scripts/mask_parity_check.py [--clips 4] [--steps 300]
        [--bf16] [--out parity.json]
~1.7 s/step/clip for the torch side on this 1-core host: 4 clips x 300
steps ≈ 35 min torch + ~10 min jax. Results recorded in PERF.md.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference/video_features_pytorch")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--out", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--backend",
        default="cpu",
        choices=("cpu", "tpu"),
        help="where OUR search runs; torch always runs on host CPU. 'tpu' "
        "is ~100x faster for the 300-step budget and is the production "
        "configuration the gate is about.",
    )
    args = ap.parse_args()

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import importlib

    import jax.numpy as jnp
    import torch

    import mask as ref_mask  # the reference's own mask math
    from ivf_tpu.interpret.mask_opt import find_mask, init_mask_central
    from ivf_tpu.models import i3d_kth
    from ivf_tpu.utils.import_torch import i3d_state_dict_to_variables

    torch.manual_seed(args.seed)
    ref_mod = importlib.import_module("models.I3D_doubled_kth")
    ref = ref_mod.Model(
        num_classes=6,
        finalTimeLength=2,
        dropout_keep_prob=0.0,
        stride_mod_layers="",
        softMax=True,  # mask drivers build the softmax head (main:55-58)
    )
    ref.eval()
    variables = i3d_state_dict_to_variables(ref.state_dict())
    model = i3d_kth(
        num_classes=6, final_time_length=2, dropout_rate=0.0, softmax=True
    )

    t_len, lam1, lam2, lr = 16, 0.02, 0.04, 0.2  # KTH driver lams (104-118)
    rng = np.random.RandomState(args.seed + 1)
    clips = rng.randn(args.clips, t_len, 120, 160, 3).astype(np.float32)
    targets = rng.randint(0, 6, args.clips)

    # ---- torch side -----------------------------------------------------
    def torch_score(clip_t):  # (T,H,W,C) np -> model probs (6,)
        x = torch.from_numpy(
            np.ascontiguousarray(clip_t.transpose(3, 0, 1, 2))[None]
        )
        with torch.no_grad():
            return ref(x)[0].numpy()

    def torch_central_init(clip, target):
        """CPU replica of mask.init_mask central mode (mask.py:121-154)."""
        orig = torch_score(clip)[target]
        frozen = torch_score(np.broadcast_to(clip[:1], clip.shape).copy())[
            target
        ]
        chosen = None
        for i in range(1, t_len // 2):
            m = np.ones(t_len, np.float32)
            m[:i] = 0.0
            m[-i:] = 0.0
            pert = (
                ref_mask.perturb_sequence(
                    torch.from_numpy(
                        np.ascontiguousarray(clip.transpose(3, 0, 1, 2))[None]
                    ),
                    torch.from_numpy(m),
                    perturbation_type="freeze",
                )
                .numpy()[0]
                .transpose(1, 2, 3, 0)
            )
            drop = (orig - torch_score(pert)[target]) / (orig - frozen)
            chosen = m
            if drop < 0.9:
                break
        return np.where(chosen == 0, -5.0, 5.0).astype(np.float32)

    def torch_search(clip, target, init_logits):
        seq_t = torch.from_numpy(
            np.ascontiguousarray(clip.transpose(3, 0, 1, 2))[None]
        )
        time_mask = torch.tensor(init_logits, requires_grad=True)
        optimizer = torch.optim.Adam([time_mask], lr=lr)
        loss = l1 = tv = class_loss = None
        for _ in range(args.steps):
            mask_clip = torch.sigmoid(time_mask)
            l1 = lam1 * torch.sum(torch.abs(mask_clip))
            tv = lam2 * ref_mask.calc_tv_norm(mask_clip, p=3, q=3)
            class_loss = ref(
                ref_mask.perturb_sequence(
                    seq_t, mask_clip, perturbation_type="freeze"
                )
            )[0, target]
            loss = l1 + tv + class_loss
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
        final_mask = torch.sigmoid(time_mask).detach()
        with torch.no_grad():
            rev = ref(
                ref_mask.perturb_sequence(
                    seq_t, final_mask, perturbation_type="reverse"
                )
            )[0, target]
        return {
            "loss": float(loss),
            "l1": float(l1),
            "tv": float(tv),
            "freeze_score": float(class_loss),
            "reverse_score": float(rev),
            "mask": final_mask.numpy(),
        }

    # ---- our side -------------------------------------------------------
    def our_side(vars_, tag):
        score_fn = lambda clip: model.apply(vars_, clip[None], train=False)[
            0
        ].astype(jnp.float32)
        out = {}
        for closed_form in (False, True):
            res = jax.vmap(
                lambda c, t, i: find_mask(
                    score_fn,
                    c,
                    t,
                    i,
                    n_steps=args.steps,
                    lam1=lam1,
                    lam2=lam2,
                    lr=lr,
                    closed_form=closed_form,
                )
            )(
                jnp.asarray(clips, vars_dtype(vars_)),
                jnp.asarray(targets),
                jnp.asarray(inits),
            )
            out[f"{tag}_cf{int(closed_form)}"] = {
                "loss": np.asarray(res.loss, np.float64),
                "freeze_score": np.asarray(res.freeze_score, np.float64),
                "reverse_score": np.asarray(res.reverse_score, np.float64),
                "mask": np.asarray(res.mask, np.float32),
            }
        return out

    def vars_dtype(vars_):
        leaf = jax.tree_util.tree_leaves(vars_["params"])[0]
        return leaf.dtype

    # identical inits on both sides; ALSO check our central init picks the
    # same candidate (part of the parity surface)
    print("computing central inits (torch replica + ours)...", flush=True)
    inits = np.stack(
        [torch_central_init(clips[i], targets[i]) for i in range(args.clips)]
    )
    score_fn32 = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)
    ours_init = np.asarray(
        jax.vmap(lambda c, t: init_mask_central(score_fn32, c, t))(
            jnp.asarray(clips), jnp.asarray(targets)
        )
    )
    init_match = bool((ours_init == inits).all())
    print(f"central-init candidate match: {init_match}", flush=True)

    print(f"torch replica: {args.clips} clips x {args.steps} steps", flush=True)
    t0 = time.time()
    ref_res = [
        torch_search(clips[i], targets[i], inits[i])
        for i in range(args.clips)
    ]
    print(f"torch done in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    ours = our_side(variables, "f32")
    if args.bf16:
        bf_vars = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            variables,
        )
        ours.update(our_side(bf_vars, "bf16"))
    print(f"jax done in {time.time()-t0:.0f}s", flush=True)

    ref_loss = np.array([r["loss"] for r in ref_res])
    ref_fs = np.array([r["freeze_score"] for r in ref_res])
    report = {
        "clips": args.clips,
        "steps": args.steps,
        "init_candidate_match": init_match,
        "ref_loss": ref_loss.tolist(),
        "ref_freeze_score": ref_fs.tolist(),
    }
    for tag, o in ours.items():
        rel_loss = np.abs(o["loss"] - ref_loss) / np.maximum(
            np.abs(ref_loss), 1e-9
        )
        d_fs = np.abs(o["freeze_score"] - ref_fs)
        report[tag] = {
            "loss": o["loss"].tolist(),
            "max_rel_loss_dev": float(rel_loss.max()),
            "mean_rel_loss_dev": float(rel_loss.mean()),
            "max_abs_freeze_dev": float(d_fs.max()),
            "max_mask_dev": float(
                np.abs(
                    o["mask"] - np.stack([r["mask"] for r in ref_res])
                ).max()
            ),
        }
        print(
            f"{tag}: max |dloss|/|loss| = {rel_loss.max():.2e}  "
            f"(gate: <= 1e-2)  max |dfreeze| = {d_fs.max():.2e}",
            flush=True,
        )
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
