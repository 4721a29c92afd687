"""Command-line interface — ``python -m ivf_tpu.cli <command>``.

Entry points mirroring the reference's script surface (SURVEY.md §7):
  train          <- python train_*.py -c config
  infer          <- python inference_*.py
  find-masks     <- python FindMasksComparison_*.py / mask/find_mask_*.py
  grad-cam       <- grad-cam-only pass
  make-records   <- tfrecords/script_generate_tfrecords_*.py
  extract-frames <- create_folders_and_extract_frames.py
"""

from __future__ import annotations

import argparse

from ivf_tpu.config import Config, add_cli_overrides, apply_cli_overrides


def _load_cfg(args) -> Config:
    cfg = Config.load(args.config) if args.config else Config()
    cfg = apply_cli_overrides(cfg, args)
    if getattr(args, "test_run", False):
        cfg.test_run = True
    return cfg


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ivf_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--config", "-c", help="config .py (exposing `config`) or .json")
        p.add_argument("--test_run", action="store_true", help="5-step smoke mode")
        p.add_argument("--checkpoint", "-chp", help="checkpoint path")
        p.add_argument(
            "--data-parallel", "-dp", type=int, default=None, metavar="N",
            help="shard batches over an N-chip data mesh (0 = all visible "
            "devices; omit for single-device — batch_size must divide "
            "evenly across N)",
        )
        p.add_argument(
            "--profile", metavar="DIR", default=None,
            help="write a jax.profiler trace (TensorBoard-loadable) of the "
            "whole run to DIR",
        )
        p.add_argument(
            "--detect-anomaly", action="store_true",
            help="NaN sanitizer: re-run the offending op un-jitted and "
            "raise at the source (torch.autograd.detect_anomaly analogue; "
            "the reference mask drivers run under it)",
        )
        p.add_argument(
            "--multihost", action="store_true",
            help="join the multi-process runtime before any JAX use "
            "(jax.distributed handshake via JAX_COORDINATOR_ADDRESS / "
            "JAX_NUM_PROCESSES / JAX_PROCESS_ID, or pod auto-detection); "
            "combine with -dp 0 for a global data mesh — each process "
            "then loads its dataset shard (parallel/multihost.py)",
        )
        add_cli_overrides(p)
        return p

    common(sub.add_parser("train")).add_argument(
        "--eval_only", "-e", action="store_true"
    )
    sub.choices["train"].add_argument("--resume", "-r", action="store_true")
    common(sub.add_parser("infer"))
    p = common(sub.add_parser("find-masks"))
    p.add_argument("--no-gradcam", action="store_true")
    p.add_argument("--no-temp-mask", action="store_true")
    p.add_argument(
        "--train", "-tr", action="store_true",
        help="run on the train split instead of validation (utils.py:43)",
    )
    p.add_argument(
        "--resume", "-r", action="store_true",
        help="resume an interrupted run from results/emission_journal.p: "
        "journaled clips restore instead of re-running (same config/"
        "weights/data assumed)",
    )
    common(sub.add_parser("grad-cam")).add_argument(
        "--train", "-tr", action="store_true",
        help="run on the train split instead of validation",
    )

    p = sub.add_parser("make-records")
    p.add_argument("--frames-root", required=True, help="root of frame dirs")
    p.add_argument("--out", required=True, help="output .ivfrecords path")
    p.add_argument("--nb-frames", type=int, default=16)
    p.add_argument(
        "--mode",
        choices=["all", "sample", "sample_cohesive_crop"],
        default="sample",
    )

    p = sub.add_parser("inspect-records")
    p.add_argument("path", help=".ivfrecords file to inspect")
    p.add_argument("--index", type=int, default=0)

    p = sub.add_parser("make-kth-records")
    p.add_argument("--labels-csv", required=True)
    p.add_argument("--frames-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--mode",
        choices=["all", "sample", "sample_cohesive_crop"],
        default="sample",
    )
    p.add_argument("--nb-frames", type=int, default=32)

    p = common(sub.add_parser("export-model"))
    p.add_argument("--out", required=True, help="output .ivfaot artifact path")
    p.add_argument(
        "--platforms", nargs="*", default=None, metavar="PLAT",
        help="target platforms baked into the artifact (e.g. tpu cpu); "
        "default: the exporting machine's platform",
    )
    p.add_argument(
        "--static-batch", type=int, default=None, metavar="B",
        help="export a fixed batch size instead of the default "
        "batch-polymorphic artifact",
    )

    p = common(sub.add_parser("export-checkpoint"))
    p.add_argument(
        "--out", required=True,
        help="output reference-layout .pth.tar (loads into the reference "
        "torch modules with strict=True)",
    )

    p = common(sub.add_parser("serve"))
    p.add_argument("--artifact", help=".ivfaot artifact (skips model build)")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max-batch", type=int, default=128)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument(
        "--warmup", action="store_true",
        help="pre-compile every batch bucket before accepting requests",
    )
    p.add_argument(
        "--smoke", action="store_true",
        help="POST one synthetic clip to the running server, print the "
        "response, and exit (e2e self-test)",
    )

    p = sub.add_parser("extract-frames")
    p.add_argument("--json-input", required=True)
    p.add_argument("--json-labels", required=True)
    p.add_argument("--video-root", required=True)
    p.add_argument("--out-root", required=True)
    p.add_argument("--nb-frames", type=int, default=16)
    p.add_argument("--width", type=int, default=256)

    args = parser.parse_args(argv)

    if getattr(args, "multihost", False):
        # MUST precede any backend use (profiling ctx, mesh construction):
        # jax.distributed refuses to join once the backends are up
        import os

        from ivf_tpu.parallel.multihost import initialize as _mh_init

        os.environ.setdefault("IVF_MULTIHOST", "1")  # allow pod auto-detect
        _mh_init()

    import contextlib

    aux_ctx = contextlib.ExitStack()
    if getattr(args, "profile", None):
        from ivf_tpu.utils.profiling import trace

        aux_ctx.enter_context(trace(args.profile))
    if getattr(args, "detect_anomaly", False):
        from ivf_tpu.utils.profiling import detect_anomaly

        aux_ctx.enter_context(detect_anomaly(True))

    def _mesh():
        # Meshes are strictly opt-in: without -dp the run is single-device
        # (a silent auto-mesh would crash whenever batch_size doesn't divide
        # the visible device count).
        n = getattr(args, "data_parallel", None)
        if n is None:
            return None
        import jax

        from ivf_tpu.parallel import get_mesh

        n = n or len(jax.devices())
        return get_mesh(n) if n > 1 else None

    def _cfg_with_ckpt():
        return _eval_cfg(args)

    try:
        if args.command == "train":
            from ivf_tpu.api import train

            train(
                _cfg_with_ckpt(),
                eval_only=args.eval_only,
                resume=args.resume,
                mesh=_mesh(),
            )
        elif args.command == "infer":
            from ivf_tpu.api import infer

            res = infer(_cfg_with_ckpt(), mesh=_mesh())
            print(
                f"val loss {res['loss']:.4f} top1 {res['top1']:.2f} "
                f"top5 {res['top5']:.2f} (predictions saved)"
            )
        elif args.command in ("find-masks", "grad-cam"):
            # grad-cam IS find_masks without the mask search: same clip
            # filters (class_oi / subset_file / kth whitelist / min_score),
            # same jitted batched-CAM path, same pickle artifact.
            from ivf_tpu.api import find_masks, init_eval_state

            cfg = _cfg_with_ckpt()
            _, state = init_eval_state(cfg, softmax_override=True)
            cam_only = args.command == "grad-cam"
            _, gc_results = find_masks(
                cfg,
                state.variables(),
                do_gradcam=cam_only or not args.no_gradcam,
                run_temp_mask=not cam_only and not args.no_temp_mask,
                save_viz=not cam_only,
                max_batches=1 if cfg.test_run else None,
                mesh=_mesh(),
                split="train" if args.train else "validation",
                resume=getattr(args, "resume", False),
            )
            if cam_only:
                print(f"grad-cam: {len(gc_results)} clips (results pickled)")
        elif args.command == "export-model":
            _export_model(args)
        elif args.command == "export-checkpoint":
            _export_checkpoint(args)
        elif args.command == "serve":
            _serve(args)
        elif args.command == "make-records":
            _make_records(args)
        elif args.command == "inspect-records":
            # manual data-verification utility (tfrecords/inspect_tfrecords.py);
            # same extension dispatch as RecordDataset — reference-produced
            # .tfrecords shards inspect directly too
            if args.path.endswith((".tfrecord", ".tfrecords")):
                from ivf_tpu.data.tfrecords import TFRecordReader as _Reader
            else:
                from ivf_tpu.data.records import RecordReader as _Reader

            r = _Reader(args.path)
            meta, frames = r.read(args.index)
            print(f"{len(r)} records in {args.path}")
            print(f"record[{args.index}] meta: {meta}")
            print(
                f"frames: {frames.shape} dtype {frames.dtype} "
                f"min {frames.min()} max {frames.max()}"
            )
        elif args.command == "make-kth-records":
            from ivf_tpu.data.kth import write_kth_subject_records

            paths = write_kth_subject_records(
                args.labels_csv,
                args.frames_root,
                args.out,
                mode=args.mode,
                nb_frames=args.nb_frames,
            )
            print(f"wrote {len(paths)} subject shards to {args.out}")
        elif args.command == "extract-frames":
            from ivf_tpu.data.catalogs import SmthSmthCatalog
            from ivf_tpu.data.frames import extract_dataset

            cat = SmthSmthCatalog(
                args.json_input, args.json_labels, args.video_root, ".webm"
            )
            extract_dataset(cat.items, args.out_root, args.nb_frames, args.width)
    finally:
        aux_ctx.close()


def _eval_cfg(args):
    cfg = _load_cfg(args)
    if args.checkpoint:
        cfg.model.pretrained_model_path = args.checkpoint
    return cfg


def _clip_shape(cfg):
    from ivf_tpu.api import _clip_hw

    return (cfg.data.clip_size, *_clip_hw(cfg), 3)


def _export_checkpoint(args):
    """Export the run's (or --checkpoint's) weights back to a
    reference-layout torch ``.pth.tar`` — the CLI face of
    ``utils/export_torch.py`` (two-way migration: the reference stack loads
    the file with strict=True)."""
    from ivf_tpu.api import _clip_hw, init_eval_state
    from ivf_tpu.utils.export_torch import (
        convlstm_variables_to_state_dict,
        i3d_variables_to_state_dict,
        save_checkpoint_file,
    )

    cfg = _eval_cfg(args)
    _, state = init_eval_state(cfg)
    variables = state.variables()
    if "i3d" in cfg.model.conv_model.lower():
        sd = i3d_variables_to_state_dict(variables)
    else:
        sd = convlstm_variables_to_state_dict(
            variables,
            image_size=_clip_hw(cfg),
            conv_stride=cfg.model.conv_stride,
            pool_kernel=tuple(cfg.model.pool_kernel),
            lstm_layers=cfg.model.clstm_layers,
            nb_lstm_units=cfg.model.clstm_hidden,
        )
    save_checkpoint_file(args.out, sd, arch=cfg.model.conv_model)
    print(f"exported {len(sd)} tensors -> {args.out} (reference layout)")


def _export_model(args):
    import os

    from ivf_tpu.api import init_eval_state
    from ivf_tpu.serve import export_forward, save_artifact

    cfg = _eval_cfg(args)
    model, state = init_eval_state(cfg, softmax_override=True)
    shape = _clip_shape(cfg)
    exported = export_forward(
        model,
        state.variables(),
        shape,
        batch_polymorphic=args.static_batch is None,
        static_batch=args.static_batch or 1,
        platforms=args.platforms,
    )
    save_artifact(
        exported,
        args.out,
        meta={
            "family": cfg.model.conv_model,
            "num_classes": cfg.model.num_classes,
            "clip_shape": list(shape),
        },
    )
    print(
        f"exported {cfg.model.conv_model} forward -> {args.out} "
        f"({os.path.getsize(args.out) / 1e6:.1f} MB, "
        f"platforms {list(exported.platforms)}, clip {shape})"
    )


def _serve(args):
    import time

    import numpy as np

    from ivf_tpu.serve import DynamicBatcher, load_artifact, serve_http

    if args.artifact:
        infer_fn, meta = load_artifact(args.artifact)
        shape = tuple(meta["clip_shape"])
    else:
        import jax

        from ivf_tpu.api import init_eval_state

        cfg = _eval_cfg(args)
        model, state = init_eval_state(cfg, softmax_override=True)
        variables = state.variables()
        infer_fn = jax.jit(lambda x: model.apply(variables, x, train=False))
        shape = _clip_shape(cfg)

    with DynamicBatcher(
        infer_fn, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    ) as batcher:
        if args.warmup:
            print(f"warming {len(batcher.buckets)} bucket programs ...")
            batcher.warmup(shape)
        server = serve_http(batcher, port=args.port, host=args.host)
        host, port = server.server_address
        print(f"serving on http://{host}:{port} (clip shape {shape})")
        try:
            if args.smoke:
                import io
                import urllib.request

                buf = io.BytesIO()
                np.save(buf, np.zeros(shape, np.float32))
                req = urllib.request.Request(
                    f"http://{host}:{port}/predict", data=buf.getvalue()
                )
                body = urllib.request.urlopen(req, timeout=300).read().decode()
                print(f"smoke response: {body}")
                print(f"stats: {batcher.stats.summary()}")
                return
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()


def _make_records(args):
    import os

    import numpy as np

    from ivf_tpu.data import (
        FrameDirCatalog,
        RecordWriter,
        sample_all,
        sample_cohesive_crop,
        sample_fixed_count,
    )
    from ivf_tpu.data.loaders import _load_frame

    catalog = FrameDirCatalog(args.frames_root)
    skipped = 0
    # ONE shared rng across clips — a fresh RandomState(0) per call would
    # give every same-length clip the identical "random" crop window
    # (kth.write_kth_subject_records shares its rng the same way)
    rng = np.random.RandomState(0)
    with RecordWriter(args.out) as w:
        for item in catalog.items:
            # index the actual (sorted) frame filenames — gaps must not
            # shift indices and stray .jpg files (posters etc.) are excluded
            import re

            frame_files = sorted(
                f
                for f in os.listdir(item.path)
                if re.fullmatch(r"frame\d+\.jpg", f)
            )
            n = len(frame_files)
            if n == 0:
                print(f"  skipping empty clip dir {item.path}")
                skipped += 1
                continue
            if args.mode == "all":
                idxs = sample_all(1, n)
            elif n == 1:
                # the samplers (faithful to the reference) assert on
                # single-frame clips; repeat the frame instead
                idxs = [1] * args.nb_frames
            elif args.mode == "sample":
                idxs = sample_fixed_count(1, n, args.nb_frames)
            else:
                idxs = sample_cohesive_crop(1, n, args.nb_frames, rng)
            frames = np.stack(
                [
                    _load_frame(os.path.join(item.path, frame_files[i - 1]))
                    for i in idxs
                ]
            )
            w.write(frames, label=int(item.label), video_id=item.id)
    print(f"wrote {args.out}" + (f" ({skipped} empty clips skipped)" if skipped else ""))


if __name__ == "__main__":
    main()
