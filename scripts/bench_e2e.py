"""End-to-end mask-search throughput through the PRODUCTION driver.

Unlike bench.py (which times the inner search program alone), this runs
``api.find_masks`` itself — loader, class filtering, compacted staging,
central init probes, batched 300-step search, Grad-CAM, reverse/orig
scores, result assembly — and reports **masks/minute/chip**, the unit of
BASELINE.md's north star (full 24,777-clip smth val + Grad-CAM < 10 min on
v5e-8), for two workloads:

  * unfiltered: every clip searched (the bench.py-comparable case);
  * classOI-filtered: labels uniform over 174 classes, class_oi=0 — the
    reference's real workload (FindMasksComparison_I3D_smth.py:168-174
    keeps ~1/174 of clips). With cross-batch compaction the per-mask cost
    should match the unfiltered case (occupancy ~100%); before round 3 the
    per-loader-batch padding made it up to batch_size x worse.

Synthetic in-memory uint8 clips: keeps the number about the driver + chip,
not this bench host's 1-core JPEG decode (host pipeline measured
separately in PERF.md).

Usage: python scripts/bench_e2e.py [--clips 256] [--batch 128]
       [--steps 300] [--filtered-mult 4] [--no-gradcam]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

# like bench.py: keep every program plain-jit cacheable — hot_jit's
# compiler options bypass the axon compile server's cache and add 8-15 min
# of compile variance per run (PERF.md)
os.environ.setdefault("IVF_HOT_JIT", "0")

import numpy as np

import jax
import jax.numpy as jnp


from ivf_tpu.data.synthetic import SyntheticClips  # noqa: E402


def run_case(cfg, variables, dataset, label, do_gradcam, save_viz=False):
    from ivf_tpu.api import find_masks

    stats = {}
    t0 = time.time()
    tm, gc = find_masks(
        cfg,
        variables,
        dataset=dataset,
        save_viz=save_viz,
        do_gradcam=do_gradcam,
        stats=stats,
    )
    dt = time.time() - t0
    n = len(tm)
    occ = (
        stats["searched_rows"]
        / max(stats["search_launches"] * cfg.data.batch_size, 1)
    )
    mpm = n / (dt / 60)
    out = {
        "masks": n,
        "minutes": round(dt / 60, 2),
        "masks_per_minute_per_chip": round(mpm, 1),
        "search_occupancy": round(occ, 3),
        # BASELINE.md north star: full 24,777-clip smth val on a v5e-8
        # (the search is embarrassingly clip-parallel; 8 chips scale
        # linearly — dryrun_multichip validates the sharded path)
        "extrapolated_v5e8_full_smth_val_minutes": round(
            24777 / (mpm * 8), 1
        ),
        **{
            k: v
            for k, v in stats.items()
            if k not in ("n_steps_run", "segment_seconds", "proseg1_seconds")
        },
    }
    segs = stats.get("segment_seconds") or []
    pro = stats.get("proseg1_seconds") or []
    launches = stats.get("search_launches", 0)
    if launches and (len(segs) > 1 or len(pro) > 1):
        # steady-state vs single-run (VERDICT r3 weak #3): single-run
        # numbers on the tunnel carry ~±15% first-encounter transfer noise
        # (each DISTINCT program re-keys its GB-scale operand on first
        # execution); the steady-state figure uses the launch medians,
        # which exclude that one-time cost
        per_launch = 0.0
        if segs:
            med = float(np.median(segs))
            out["segment_seconds_median"] = round(med, 2)
            per_launch += med * (len(segs) / launches)
        if pro:
            # fused prologue+segment-1 program: one per flush — the
            # steady-state figure below therefore INCLUDES the prologue
            # (unlike the round-3 search-only anatomy); only the epilogue
            # (~0.2 s) and CAM remain outside it
            pro_med = float(np.median(pro))
            out["proseg1_seconds_median"] = round(pro_med, 2)
            per_launch += pro_med
        out["steady_state_search_masks_per_min"] = round(
            cfg.data.batch_size * 60 / per_launch, 1
        )
    sr = stats.get("n_steps_run") or []
    if cfg.mask.early_stop and sr:
        out["early_stop_steps_run_p50"] = int(np.percentile(sr, 50))
        out["early_stop_steps_run_max"] = int(max(sr))
    print(f"{label}: {out}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--no-gradcam", action="store_true")
    ap.add_argument(
        "--viz",
        choices=("off", "async", "inline"),
        default="off",
        help="render the per-clip viz artifacts (triptychs/GIFs/score txt) "
        "in the measured cases: 'async' = background writer overlapping "
        "the next batch's search (MaskConfig.async_viz, the default), "
        "'inline' = reference-style serialized writes — the pair measures "
        "the host/device overlap win",
    )
    ap.add_argument(
        "--early-stop",
        action="store_true",
        help="the reference's INTENDED per-clip convergence semantics "
        "(its own early stop is dead code): eta=1e-5 freezes every clip "
        "by ~step 100 at the production config — measured 3x fewer search "
        "segments with mask deviation <=0.014 and freeze-score deviation "
        "<3e-7 vs fixed-300 (PERF.md round 4, scripts/bench_early_stop.py)",
    )
    ap.add_argument(
        "--skip-filtered",
        action="store_true",
        help="skip the classOI case (its wall clock is dominated by this "
        "1-core host generating 22k synthetic clips; the device path is "
        "identical to the unfiltered case at 100%% occupancy)",
    )
    args = ap.parse_args()

    from ivf_tpu.config import Config
    from ivf_tpu.models import i3d_smth
    import ivf_tpu.api as api_mod

    cfg = Config.from_dict(
        {
            "model_name": "bench_e2e",
            "output_dir": tempfile.mkdtemp(),
            "conv_model": "i3d_smth",
            "num_classes": 174,
            "batch_size": args.batch,
            "clip_size": 16,
            "input_spatial_size": 224,
            "dropout": 0.0,
            "num_workers": 4,
        }
    )
    cfg.mask.opt_iter = args.steps
    cfg.mask.early_stop = args.early_stop
    cfg.model.compute_dtype = "bfloat16"

    model = i3d_smth(
        num_classes=174, dropout_rate=0.0, softmax=True,
        stem_s2d=True, fold_bn=True, fuse_1x1=True,
        # what api.find_masks' bf16 auto-upgrade would engage (the
        # monkeypatched build_model below bypasses the upgrade)
        pool_impl="argmax",
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3))
    )
    orig_bm = api_mod.build_model
    api_mod.build_model = lambda c, softmax_override=None: model
    results = {
        "batch": args.batch,
        "steps": args.steps,
        "early_stop": args.early_stop,
    }
    try:
        save_viz = args.viz != "off"
        cfg.mask.async_viz = args.viz == "async"
        results["viz"] = args.viz
        # warm pass compiles every program (score/init/search/cam + the viz
        # perturbations when viz is on) on a tiny clip count so the
        # measured runs are compile-free
        warm_ds = SyntheticClips(args.batch, num_classes=174)
        t0 = time.time()
        run_case(
            cfg, variables, warm_ds, "warm(compile)",
            not args.no_gradcam, save_viz=save_viz,
        )
        results["compile_warm_s"] = round(time.time() - t0, 1)
        results["unfiltered"] = run_case(
            cfg,
            variables,
            SyntheticClips(args.clips, num_classes=174),
            f"unfiltered (viz={args.viz})",
            not args.no_gradcam,
            save_viz=save_viz,
        )

        # the reference's real workload: 1/174 of clips kept — size the raw
        # set so kept == one full batch (the compaction turns what used to
        # be ~batch_size padded launches into ONE full launch; filtered
        # clips never touch the device, so the host label scan is the only
        # extra cost)
        if not args.skip_filtered:
            n_raw = args.batch * 174
            cfg.mask.class_oi = 0
            results["classOI"] = run_case(
                cfg,
                variables,
                SyntheticClips(n_raw, num_classes=174),
                f"classOI (1/174 of {n_raw} clips)",
                not args.no_gradcam,
            )
    finally:
        api_mod.build_model = orig_bm
    print(json.dumps({"e2e_find_masks": results}))


if __name__ == "__main__":
    main()
