"""Benchmark — temporal-mask optimization throughput on real TPU hardware.

Headline metric (BASELINE.md): mask-optimization steps/second, where one
step = one Adam update of a 16-frame 224x224 clip's temporal mask = one
full I3D forward + backward + the freeze-perturbation scan. The reference
(FindMasksComparison_I3D_smth.py) runs these strictly one clip at a time;
this framework vmaps the whole search across clips.

``vs_baseline`` is the measured speedup of the vmapped batch search over
the reference's sequential one-clip-at-a-time schedule on the *same chip*
(the repo publishes no numbers — SURVEY.md §6 — so same-hardware
sequential-vs-vmapped is the honest apples-to-apples ratio).

Timing notes for this environment: the axon tunnel memoizes identical
executions and per-call latency is ~50ms, so all measurement loops run
*inside* one jit (lax.scan varying the input per iteration) and results are
fetched as scalars.
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def build(
    batch_size: int,
    n_steps: int,
    t: int = 16,
    hw: int = 224,
    dtype="float32",
    optimized: bool = True,
):
    from ivf_tpu.interpret.mask_opt import find_mask
    from ivf_tpu.models import i3d_smth

    # optimized=False turns off the TPU-native rewrites (s2d stem, BN
    # folding, 1x1-branch fusion) — a faithful proxy of a naive port of the
    # reference, used as the baseline schedule
    model = i3d_smth(
        num_classes=174,
        dropout_rate=0.0,
        softmax=True,
        stem_s2d=optimized,
        fold_bn=optimized,
        fuse_1x1=optimized,
        # argmax-index pool VJP (+9% measured, ops/conv.py): engages on the
        # bf16 activations of the optimized path; no-op under f32 (the
        # sequential baseline), which falls through to the native pool
        pool_impl="argmax" if optimized else "reduce_window",
    )
    key = jax.random.PRNGKey(0)
    clips = jax.random.normal(key, (batch_size, t, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init)(key, clips[:1])
    if dtype == "bfloat16":
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
    score_fn = lambda clip: model.apply(variables, clip[None], train=False)[
        0
    ].astype(jnp.float32)

    targets = jnp.arange(batch_size, dtype=jnp.int32) % 174
    inits = jnp.tile(
        jnp.where(jnp.arange(t) % 2 == 0, 1.0, -1.0)[None], (batch_size, 1)
    )

    searcher = jax.vmap(partial(find_mask, score_fn, n_steps=n_steps))

    def run(clips, targets, inits, salt):
        # salt varies the input so remote execution memoization can't fire
        res = searcher(clips + salt * 1e-6, targets, inits)
        return jnp.sum(res.mask) + jnp.sum(res.loss)

    # NOTE: the 128MB scoped-VMEM fusion budget (utils/compile.py hot_jit)
    # measures +1.8% (450.5 -> 458.8 steps/s) but compiler-options-bearing
    # programs bypass the axon server's compile cache, pushing every bench
    # run past the contract timeout — so the BENCH keeps a plain jit and
    # the production find_masks path keeps hot_jit (per-process compile).
    run = jax.jit(run)

    return run, (clips, targets, inits)


def timed(run, args, salt0: float) -> float:
    t0 = time.time()
    out = float(run(*args, jnp.float32(salt0)))
    assert np.isfinite(out)
    return time.time() - t0


def timed3(run, args, first_salt: float = 1.0):
    """3 timed repeats (distinct salts defeat the tunnel's memoization);
    returns (min, median, samples) — VERDICT r2 weak #6: single/min-of-2
    samples were too thin for numbers cited as results."""
    dts = [timed(run, args, first_salt + k) for k in range(3)]
    return min(dts), sorted(dts)[1], dts


def _probe_backend(timeout_s: int = 300):
    """Fail FAST if the TPU attachment is down. When the axon tunnel is
    fully unhealthy, the first device call blocks forever inside a C retry
    loop (nanosleep — Python signal handlers never fire), so the probe must
    be a bounded SUBPROCESS. On timeout, print a parseable primary-metric
    line with an error note and exit nonzero instead of hanging the
    driver's whole bench window."""
    import os
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            env=os.environ.copy(),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(
            json.dumps(
                {
                    "metric": "temporal_mask_opt_steps_per_sec_per_chip",
                    "value": 0,
                    "unit": "mask-steps/s",
                    "vs_baseline": 0,
                    "error": (
                        f"TPU backend init failed ({type(e).__name__}) — "
                        "tunnel down; see CLAUDE.md 'tunnel fully down'. "
                        "Last good measurement: PERF.md round-3 headline."
                    ),
                    # machine-readable last-good (PERF.md round-3, same
                    # program/config, reproducible whenever the attachment
                    # is healthy): value / vs_baseline as of 2026-08-17
                    "last_good_value": 491.8,
                    "last_good_vs_baseline": 22.97,
                }
            ),
            flush=True,
        )
        sys.exit(1)


def main():
    t_start = time.time()
    _probe_backend()
    # 120 steps per jit call: close to the production 300-step schedule's
    # tail amortization (the per-clip reverse/orig score forwards), still a
    # bounded bench runtime
    batch, n_steps = 128, 120
    run_b, args_b = build(batch, n_steps, dtype="bfloat16")
    timed(run_b, args_b, 0.0)  # compile + warm
    dt_b, dt_b_med, dts_b = timed3(run_b, args_b)
    batched_sps = batch * n_steps / dt_b

    # reference-style schedule for the baseline: one clip per call, f32,
    # no TPU-native rewrites. Same 120-step horizon as the batched side so
    # per-call fixed costs (the reverse/orig score forwards + dispatch)
    # amortize identically — anything shorter underestimates the baseline
    # and inflates vs_baseline
    run_s, args_s = build(1, n_steps, optimized=False)
    timed(run_s, args_s, 0.0)
    dt_s, dt_s_med, dts_s = timed3(run_s, args_s)
    sequential_sps = n_steps / dt_s

    result = {
        "metric": "temporal_mask_opt_steps_per_sec_per_chip",
        "value": round(batched_sps, 2),
        "unit": "mask-steps/s (1 step = I3D fwd+bwd on 16x224x224, batch 128 vmapped, bf16)",
        "vs_baseline": round(batched_sps / sequential_sps, 2),
    }
    # flush immediately: the primary metric must reach the driver even if
    # a later (secondary) stage is killed by a timeout
    print(json.dumps(result), flush=True)
    # BASELINE.md north star: full smth-smth val (24,777 clips x 300 steps
    # + Grad-CAM) on a v5e-8; the mask search is embarrassingly
    # clip-parallel so 8 chips scale linearly (dryrun_multichip validates
    # the sharded path)
    full_val_steps = 24777 * 300
    details = {
        "sequential_steps_per_sec": round(sequential_sps, 2),
        "batched_seconds_per_clip_300steps": round(
            300.0 / (batched_sps / batch), 2
        ),
        "extrapolated_v5e8_full_smth_val_minutes": round(
            full_val_steps / (8 * batched_sps) / 60, 1
        ),
        # variance evidence: min is the headline (least-noise estimate of
        # the program's cost on a tunnel with ~2x latency jitter), median
        # shows the spread
        "headline_steps_per_sec_median": round(batch * n_steps / dt_b_med, 2),
        "headline_time_samples_s": [round(x, 3) for x in dts_b],
        "sequential_steps_per_sec_median": round(n_steps / dt_s_med, 2),
        "sequential_time_samples_s": [round(x, 3) for x in dts_s],
    }
    # Secondary metrics must ALWAYS land in the round artifact (VERDICT r3
    # #2): measure live when the remaining budget allows, else fall back to
    # the last-good persisted measurements (bench_secondaries.json, written
    # after every successful live run) with an explicit provenance marker.
    import os

    cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_secondaries.json"
    )
    sec = None
    if time.time() - t_start < 700:
        try:  # secondary metrics must never fail the bench
            sec = inference_throughput()
            sec["secondaries_measured_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            )
            with open(cache_path, "w") as f:
                json.dump(sec, f, indent=1)
        except Exception as e:  # noqa: BLE001
            details["inference_detail_error"] = f"{type(e).__name__}: {e}"[:200]
    else:
        # remote-compile latency varies ~2x run to run; don't risk the
        # whole bench timing out on the two extra model compiles
        details["inference_detail_note"] = (
            "time budget exceeded — secondaries from last-good cache"
        )
    if sec is None:
        try:
            with open(cache_path) as f:
                sec = json.load(f)
            sec["secondaries_cached"] = True
        except OSError:
            sec = {"inference_detail_skipped": "no live run and no cache"}
    details.update(sec)
    details.update(driver_masks_metrics(t_start))
    print(json.dumps(details), file=sys.stderr, flush=True)


def driver_masks_metrics(t_start: float) -> dict:
    """PRODUCTION-DRIVER throughput (VERDICT r4 #2): masks/min/chip through
    ``api.find_masks`` itself (compaction + fused prologue + early-stop +
    refill + Grad-CAM), so the artifact carries the number the north-star
    target is written in, next to the raw-step extrapolation above (which
    ignores the driver's anatomy — prologue, finalize, launch overheads,
    early-stop savings).

    The driver leg needs its own compiles plus a warm flush (~15+ min
    through the axon tunnel), far past the bench window — so by default the
    number comes from the persisted measurement that
    ``scripts/bench_early_stop.py e2e`` writes (driver_masks_cache.json,
    provenance-marked, measured on this same chip by the production
    driver). Set IVF_BENCH_DRIVER_LEG=1 to force a live leg (sized for
    untunneled TPU where compiles are local)."""
    import os
    import tempfile

    cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "driver_masks_cache.json"
    )
    out: dict = {}
    if os.environ.get("IVF_BENCH_DRIVER_LEG") == "1":
        try:
            import ivf_tpu.api as api_mod
            from ivf_tpu.config import Config
            from ivf_tpu.data.synthetic import SyntheticClips

            cfg = Config.from_dict(
                {
                    "model_name": "bench_driver",
                    "output_dir": tempfile.mkdtemp(),
                    "conv_model": "i3d_smth",
                    "num_classes": 174,
                    "batch_size": 128,
                    "clip_size": 16,
                    "input_spatial_size": 224,
                    "dropout": 0.0,
                }
            )
            cfg.model.compute_dtype = "bfloat16"
            cfg.model.pool_impl = "argmax"
            cfg.mask.opt_iter = 300
            cfg.mask.early_stop = True
            cfg.mask.eta = 1e-5
            model = api_mod.build_model(cfg, softmax_override=True)
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 224, 224, 3))
            )  # f32 init — find_masks re-casts per cfg.model.compute_dtype
            # warm leg compiles every program; measured leg is steady state
            for tag, n in (("warm", 128), ("measured", 256)):
                ds = SyntheticClips(
                    n, t=16, hw=224, num_classes=174, lazy=False,
                    seed=0 if tag == "warm" else 1,
                )
                st: dict = {}
                t0 = time.time()
                tm, _ = api_mod.find_masks(
                    cfg, variables, dataset=ds, save_viz=False,
                    do_gradcam=True, stats=st,
                )
                dt = time.time() - t0
            mpm = len(tm) / (dt / 60)
            out = {
                "driver_masks_per_min_chip": round(mpm, 1),
                "driver_provenance": "live bench leg (IVF_BENCH_DRIVER_LEG)",
                "driver_stats": {
                    k: st[k]
                    for k in (
                        "segments_launched", "refill_flushes",
                        "refill_requeued_rows",
                    )
                },
            }
        except Exception as e:  # noqa: BLE001 — secondaries never fail bench
            out = {"driver_leg_error": f"{type(e).__name__}: {e}"[:200]}
    if "driver_masks_per_min_chip" not in out:
        try:
            with open(cache_path) as f:
                out = json.load(f)
            out["driver_cached"] = True
        except OSError:
            return {
                "driver_masks_note": (
                    "no live driver leg and no driver_masks_cache.json — run "
                    "scripts/bench_early_stop.py e2e to produce one"
                )
            }
    mpm = out.get("driver_masks_per_min_chip")
    if mpm:
        # BASELINE.md north star restated in driver units: 24,777 val clips
        # over 8 clip-parallel chips at the measured per-chip driver rate
        out["extrapolated_v5e8_full_smth_val_minutes_driver"] = round(
            24777 / (8 * mpm), 1
        )
    return out


def inference_throughput():
    """Secondary metrics: I3D + ConvLSTM inference clips/sec/chip (bf16)."""
    import jax.lax as lax

    from ivf_tpu.models import ConvLSTMClassifier, i3d_smth

    out = {}
    key = jax.random.PRNGKey(0)
    n_iters = 10

    def measure(model, clips, variables):
        @jax.jit
        def run(clips, salt):  # clips as an arg: don't bake 300MB constants
            def body(c, i):
                logits = model.apply(variables, clips + (i + salt) * 1e-6)
                return c + jnp.sum(logits.astype(jnp.float32)), None
            acc, _ = lax.scan(body, 0.0, jnp.arange(n_iters, dtype=jnp.float32))
            return acc

        float(run(clips, jnp.float32(0)))  # compile + warm
        dts = []
        for salt in (1, 2, 3):  # min + median of 3 (variance evidence)
            t0 = time.time()
            float(run(clips, jnp.float32(salt)))
            dts.append(time.time() - t0)
        n = clips.shape[0] * n_iters
        return n / min(dts), n / sorted(dts)[1]

    i3d = i3d_smth(num_classes=174, dropout_rate=0.0)
    clips = jax.random.normal(key, (64, 16, 224, 224, 3), jnp.float32)
    v = jax.jit(i3d.init)(key, clips[:1])
    v = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v
    )
    mn, med = measure(i3d, clips, v)
    out["i3d_inference_clips_per_sec"] = round(mn, 1)
    out["i3d_inference_clips_per_sec_median"] = round(med, 1)

    clstm = ConvLSTMClassifier(
        num_classes=6,
        nb_lstm_units=32,
        lstm_layers=2,
        conv_stride=2,
        effective_steps=(7, 15, 23, 31),
    )
    kclips = jax.random.normal(key, (64, 32, 120, 160, 3), jnp.float32)  # (H,W)=(120,160)
    v2 = jax.jit(clstm.init)(key, kclips[:1])
    v2 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v2
    )
    mn, med = measure(clstm, kclips, v2)
    out["convlstm_inference_clips_per_sec"] = round(mn, 1)
    out["convlstm_inference_clips_per_sec_median"] = round(med, 1)
    return out


if __name__ == "__main__":
    main()
