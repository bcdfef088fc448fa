"""Unified command-line interface.

Single ``camradepth`` entry point replacing the reference's 11 script
entrypoints + runner + visualization (SURVEY.md §7 item 9):

  python -m camradepth_tpu.cli prep  --data-root ... --out ...
  python -m camradepth_tpu.cli train --preset base --split ...
  python -m camradepth_tpu.cli test  --preset base --split ... --checkpoint ...
  python -m camradepth_tpu.cli viz   --preset base --split ... --checkpoint ...
  python -m camradepth_tpu.cli bench

The flag surface mirrors the reference argparse options (args.py:11-66)
where they still make sense on TPU.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path


def _add_common_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default="base",
                   choices=["base", "base_rgb", "supervised_seg",
                            "unsupervised_seg", "sup_unsup_seg",
                            "sup_unsup_seg_rgb"],
                   help="published experiment preset (args.py:72-122)")
    p.add_argument("--split", default=None, help="(N,7) split .npy path")
    p.add_argument("--mini-dataset", action="store_true")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--desired-batch-size", type=int, default=None,
                   help="effective batch via gradient accumulation "
                        "(args.py:31); defaults to --batch-size when that "
                        "is overridden")
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--output-dir", default="Output")
    p.add_argument("--run-name", default="current")
    p.add_argument("--save-model", action="store_true")
    p.add_argument("--tpu-tuned", action="store_true",
                   help="TPU-tuned flagship training shape: one "
                        "microbatch of 6 padded to 8 dummy-masked "
                        "samples (exact gradients; avoids XLA's "
                        "<8-batch space-to-batch conv rewrite) + "
                        "encoder/decoder rematerialization. 640 -> 373 "
                        "ms per effective-batch-6 step on v5e")
    p.add_argument("--pad-microbatch", type=int, default=None,
                   help="pad each training microbatch to this size "
                        "with dummy-masked samples (see --tpu-tuned)")
    p.add_argument("--wire", default=None, choices=["auto", "on", "off"],
                   help="compact train-loader wire format (uint8 image "
                        "+ sparse radar/GT, decoded on device; "
                        "data/wire.py): ~4x fewer H2D bytes/step "
                        "through the ~44 MB/s axon tunnel. --tpu-tuned "
                        "implies auto; decoded batches are bit-exact "
                        "vs the dense path")
    p.add_argument("--compute-dtype", default=None,
                   choices=["bfloat16", "float32"])
    p.add_argument("--tpu-decoder", action="store_true",
                   help="use the documented TPU architecture variant: "
                        "half/full-res decoder stages run at their input "
                        "resolution with 128-wide MXU lane-filling convs "
                        "and subpixel (depth-to-space) upsampling. NOT "
                        "weight-compatible with reference checkpoints "
                        "(encoder + low-res decoder transfer by shape "
                        "matching); ~2x faster inference on v5e")
    p.add_argument("--max-distances", default=None,
                   help="comma list of metric caps in meters (reference "
                        "default 100,50; caps are configurable per "
                        "BASELINE.md)")
    p.add_argument("--train-val-split", default=None, metavar="N_TRAIN,N_VAL",
                   help="first N_TRAIN split rows train, next N_VAL "
                        "validate, the rest test (reference hard-codes "
                        "17902,2237, args.py:137; this flag makes small "
                        "custom splits usable from the CLI)")
    p.add_argument("--set", action="append", dest="set_overrides",
                   default=None, metavar="SECTION.FIELD=VALUE",
                   help="override any config field by dotted path, e.g. "
                        "--set train.early_stopping_thresh=10 "
                        "--set data.num_workers=4 "
                        "--set model.groupnorm_divisor=8; repeatable, "
                        "applied after all other flags (sections: model, "
                        "data, train, mesh; full reference-flag mapping "
                        "in docs/MIGRATION.md)")


class UserError(ValueError):
    """A CLI user error (bad flag/value/config combination): printed as
    one line + exit 2. Internal failures deliberately do NOT inherit
    this — they must surface with a full traceback, not be masked as
    user errors."""


def _enable_compile_cache_on_accelerator() -> None:
    """Persistent XLA compile cache for ACCELERATOR backends only.

    The flagship train step takes ~8 min to compile through the axon
    tunnel, so train/test/distill/serve want the cache as much as
    bench does. Gate on the backend jax REALLY selected — never env
    vars (the sitecustomize wins backend selection) — because XLA:CPU
    cache entries are AOT executables whose target-machine features can
    mismatch the host and SIGILL on load (see CLAUDE.md)."""
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/camradepth_jax_cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0
        )


def _build_config(args):
    from camradepth_tpu import config as C

    try:
        return _build_config_inner(args, C)
    except ValueError as e:  # bad --set path/value, preset invariants
        raise UserError(str(e)) from e


def _build_config_inner(args, C):
    cfg = C.preset(args.preset)
    data_kw = {}
    if args.split:
        data_kw["split_path"] = args.split
    if args.mini_dataset:
        data_kw["mini_dataset"] = True
    if getattr(args, "max_distances", None):
        data_kw["max_distances"] = tuple(
            float(v) for v in args.max_distances.split(",")
        )
    if getattr(args, "train_val_split", None):
        n_tr, n_va = (int(v) for v in args.train_val_split.split(","))
        data_kw["train_val_split"] = (n_tr, n_va)
    if getattr(args, "wire", None) is not None:
        data_kw["wire_format"] = args.wire
    elif getattr(args, "tpu_tuned", False):
        data_kw["wire_format"] = "auto"
    if data_kw:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **data_kw))
    train_kw = {}
    if args.batch_size is not None and getattr(
        args, "desired_batch_size", None
    ) is None:
        # keep the accumulation invariant when only batch_size is given
        train_kw["desired_batch_size"] = args.batch_size
    for flag, field in (("batch_size", "batch_size"),
                        ("desired_batch_size", "desired_batch_size"),
                        ("learning_rate", "learning_rate"),
                        ("num_steps", "num_steps"),
                        ("num_epochs", "num_epochs"),
                        ("checkpoint", "checkpoint"),
                        ("output_dir", "output_dir"),
                        ("run_name", "run_name")):
        v = getattr(args, flag)
        if v is not None:
            train_kw[field] = v
    if getattr(args, "tpu_tuned", False):
        train_kw.setdefault("batch_size", 6)
        train_kw.setdefault("desired_batch_size", 6)
        train_kw.setdefault("pad_microbatch_to", 8)
    if getattr(args, "pad_microbatch", None) is not None:
        train_kw["pad_microbatch_to"] = args.pad_microbatch
    if args.save_model:
        train_kw["save_model"] = True
    if getattr(args, "async_checkpoint", False):
        train_kw["async_checkpoint"] = True
    if args.checkpoint:
        train_kw["load_ckpt"] = True
    if args.num_epochs is not None:
        train_kw["num_steps"] = None
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
    model_kw = {}
    if args.compute_dtype:
        model_kw["compute_dtype"] = args.compute_dtype
    if getattr(args, "tpu_tuned", False):
        model_kw["remat_encoder"] = True
        model_kw["remat_decoder"] = True
    if getattr(args, "tpu_decoder", False):
        model_kw["tpu_decoder"] = True
    if model_kw:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, **model_kw)
        )
    if getattr(args, "set_overrides", None):
        cfg = C.apply_overrides(cfg, args.set_overrides)
    return cfg


def _load_params(cfg, checkpoint: str, strict: bool = False):
    """Load params from an Orbax checkpoint or a reference .pth. With
    strict=True any missing/mismatched key aborts (used by export so a
    config/checkpoint mismatch can't silently ship random weights)."""
    import jax
    import jax.numpy as jnp

    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.utils import checkpoint as ck

    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    dummy = jnp.zeros((1, h, w, cfg.model.input_channels))
    init = jax.jit(
        lambda k: model.init({"params": k}, dummy, deterministic=True)[
            "params"
        ]
    )(jax.random.PRNGKey(0))
    if checkpoint.endswith(".pth"):
        from camradepth_tpu.interop.torch_convert import (
            convert_state_dict,
            load_reference_checkpoint,
        )

        sd = load_reference_checkpoint(checkpoint)
        converted = convert_state_dict(sd)
        params, mismatches = ck.partial_restore_params(converted, init)
    else:
        from pathlib import Path as _P

        p = _P(checkpoint)
        if p.is_dir() and not p.name.startswith(
            ("ckpt_epoch_", "ckpt_preempt_epoch_")
        ):
            # a RUN dir: pick the best (lowest-val-loss) checkpoint,
            # matching the reference's best-ckpt selection
            # (runner.py:366-373 keeps the improving epochs). A run that
            # was preempted before its first best-val save still has a
            # loadable TrainState — fall back to the newest preempt save.
            best = ck.best_checkpoint(p) or ck.latest_checkpoint(p)
            if best is None:
                raise UserError(
                    f"{checkpoint} holds no ckpt_epoch_* / "
                    "ckpt_preempt_epoch_* checkpoints"
                )
            print(f"using best checkpoint {best.name}")
            checkpoint = str(best)
        state = ck.restore_checkpoint(checkpoint, None)
        saved = state["params"] if isinstance(state, dict) and "params" in (
            state
        ) else state[0] if isinstance(state, (list, tuple)) else state
        params, mismatches = ck.partial_restore_params(saved, init)
    if strict and mismatches:
        raise UserError(
            f"checkpoint does not match the '{cfg.name}' config: "
            f"{len(mismatches)} keys kept their fresh init, e.g. "
            f"{mismatches[0]}. Pass the matching --preset."
        )
    return model, params


def cmd_prep(args) -> int:
    # The remap must match the estimator's label space: jax-panoptic
    # emits cityscapes trainIds, torchscript emits mseg-universal ids.
    # Running trainIds through the mseg LUTs would write wrong-but-
    # valid-looking *_mseg.npy artifacts with no error. Validated
    # before any import so the flag error is reachable without the
    # devkit.
    _SEG_LABEL_SPACES = {
        "jax-panoptic": ("cityscapes", "vehicle_cityscapes"),
        "torchscript": ("merged", "vehicle"),
        "panoptic-deeplab": ("merged", "vehicle"),
    }
    allowed = _SEG_LABEL_SPACES.get(args.seg)
    if allowed is not None and args.seg_remap not in allowed:
        raise UserError(
            f"--seg {args.seg} produces "
            f"{'cityscapes trainIds' if args.seg == 'jax-panoptic' else 'mseg-universal ids'};"
            f" --seg-remap must be one of {allowed} (got "
            f"'{args.seg_remap}')"
        )

    from camradepth_tpu.dataprep.pipeline import ALL_STAGES, run_pipeline

    try:
        from nuscenes.nuscenes import NuScenes
    except ImportError:
        print(
            "error: the 'prep' command needs the nuscenes-devkit "
            "(not installed in this environment). Precomputed artifacts in "
            "the reference format are consumed directly by 'train'/'test'.",
            file=sys.stderr,
        )
        return 2
    nusc = NuScenes(args.version, dataroot=args.data_root, verbose=False)
    stages = tuple(args.stages.split(",")) if args.stages else ALL_STAGES
    from camradepth_tpu.dataprep.adapters import (
        make_flow_estimator,
        make_seg_estimator,
    )

    if args.flow == "lk":
        from camradepth_tpu.ops.optical_flow import lk_flow

        flow_estimator = lk_flow
    else:
        flow_estimator = make_flow_estimator(
            args.flow, ckpt=args.flow_ckpt
        )
    seg_estimator = make_seg_estimator(args.seg, ckpt=args.seg_ckpt)
    run_pipeline(nusc, args.out, stage_names=stages, mini=args.mini,
                 flow_estimator=flow_estimator,
                 seg_estimator=seg_estimator,
                 seg_remap=args.seg_remap)
    return 0


def cmd_train(args) -> int:
    if getattr(args, "multihost", False) or getattr(
        args, "coordinator", None
    ):
        # must run before ANY backend touch (Trainer/jax imports below)
        from camradepth_tpu.parallel import multihost

        if args.coordinator and (
            args.num_processes is None or args.process_id is None
        ):
            raise UserError(
                "--coordinator requires --num-processes and --process-id"
            )
        multihost.initialize(
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from camradepth_tpu.train.trainer import Trainer

    _enable_compile_cache_on_accelerator()

    cfg = _build_config(args)
    mesh_kw = {}
    if getattr(args, "data_parallel", None) is not None:
        mesh_kw["data_parallel"] = args.data_parallel
    if getattr(args, "fsdp", None) is not None:
        mesh_kw["fsdp_parallel"] = args.fsdp
    if getattr(args, "spatial_parallel", None) is not None:
        mesh_kw["spatial_parallel"] = args.spatial_parallel
    if mesh_kw:
        cfg = cfg.replace(mesh=dataclasses.replace(cfg.mesh, **mesh_kw))
    trainer = Trainer(cfg, run_dir=getattr(args, "run_dir", None))
    best = trainer.train()
    print(f"best val loss: {best:.6f}")
    return 0


def cmd_distill(args) -> int:
    """Distill a parity-architecture teacher into the (typically
    --tpu-decoder) student: dense per-pixel supervision from the
    teacher's predictions, optionally mixed with the sparse lidar GT
    loss. Closes the TPU variant's reference-weight-compatibility gap
    (see train/distill.py docstring; no reference equivalent)."""
    from camradepth_tpu.train.distill import DistillTrainer

    _enable_compile_cache_on_accelerator()
    cfg = _build_config(args)
    teacher_model_cfg = dataclasses.replace(
        cfg.model,
        tpu_decoder=bool(getattr(args, "teacher_tpu_decoder", False)),
        # remat only changes the backward; the teacher never trains
        remat_encoder=False,
        remat_decoder=False,
    )
    teacher_cfg = cfg.replace(model=teacher_model_cfg)
    # strict by default: a partially-loaded teacher (random heads) would
    # silently poison the dense distillation targets
    _, teacher_params = _load_params(
        teacher_cfg, args.teacher_checkpoint,
        strict=not args.no_strict_teacher,
    )
    mesh_kw = {}
    if getattr(args, "data_parallel", None) is not None:
        mesh_kw["data_parallel"] = args.data_parallel
    if getattr(args, "fsdp", None) is not None:
        mesh_kw["fsdp_parallel"] = args.fsdp
    if getattr(args, "spatial_parallel", None) is not None:
        mesh_kw["spatial_parallel"] = args.spatial_parallel
    if mesh_kw:
        cfg = cfg.replace(mesh=dataclasses.replace(cfg.mesh, **mesh_kw))
    trainer = DistillTrainer(
        cfg, teacher_cfg, teacher_params,
        alpha=args.alpha,
        temperature=args.temperature,
        # a student --checkpoint (resume/continue) must not be clobbered
        # by the teacher warm start
        init_from_teacher=(
            not args.no_teacher_init and not args.checkpoint
        ),
        run_dir=getattr(args, "run_dir", None),
    )
    best = trainer.train()
    print(f"best val loss: {best:.6f}")
    return 0


def cmd_test(args) -> int:
    from camradepth_tpu.data.pipeline import make_loaders
    from camradepth_tpu.evaluation.harness import evaluate, format_report

    _enable_compile_cache_on_accelerator()

    cfg = _build_config(args)
    if not args.checkpoint:
        print("error: --checkpoint required for test", file=sys.stderr)
        return 2
    from camradepth_tpu.interop.hlo_export import is_artifact

    if is_artifact(args.checkpoint):
        # pre-ship validation: evaluate the EXACT compiled bits that
        # will serve (params + lowering baked in), not a re-jitted model
        import jax

        from camradepth_tpu.evaluation.harness import (
            make_artifact_test_step,
        )
        from camradepth_tpu.interop.hlo_export import (
            load_serving_artifact,
        )

        call, header = load_serving_artifact(args.checkpoint)
        if tuple(header["img_size"]) != tuple(cfg.model.img_size):
            raise UserError(
                f"artifact geometry {header['img_size']} does not match "
                f"the '{cfg.name}' config's {list(cfg.model.img_size)} — "
                "pass the preset it was exported from"
            )
        bs = header["batch_size"] or args.test_batch
        if args.test_batch != bs:
            print(f"note: artifact batch size is {bs}; "
                  f"overriding --test-batch {args.test_batch}")
        loaders = make_loaders(cfg.data, batch_size=bs)
        report = evaluate(
            cfg, None, None, loaders["test"],
            test_step=jax.jit(make_artifact_test_step(cfg, call, header)),
        )
    else:
        model, params = _load_params(cfg, args.checkpoint)
        # wire_format auto/on: compact wire test loader (~8x fewer H2D
        # bytes/frame); the harness decodes on device, bit-exact. The
        # artifact branch above stays dense — artifacts bake a dense-
        # features signature at export time.
        loaders = make_loaders(
            cfg.data, batch_size=args.test_batch,
            wire_eval=cfg.data.wire_format != "off",
        )
        report = evaluate(cfg, model, params, loaders["test"])
    print(format_report(cfg, report))
    if args.report_json:
        import json

        Path(args.report_json).write_text(
            json.dumps({k: (float(v) if hasattr(v, "__float__") else v)
                        for k, v in report.items()}, indent=1)
        )
        print(f"wrote {args.report_json}")
    return 0


def cmd_viz(args) -> int:
    from camradepth_tpu.data.pipeline import make_loaders
    from camradepth_tpu.viz import run_visualization

    cfg = _build_config(args)
    if not args.checkpoint:
        print("error: --checkpoint required for viz", file=sys.stderr)
        return 2
    from camradepth_tpu.interop.hlo_export import is_artifact

    predict = None
    batch_size = args.test_batch
    if is_artifact(args.checkpoint):
        import numpy as np

        from camradepth_tpu.interop.hlo_export import (
            load_serving_artifact,
        )

        call, header = load_serving_artifact(args.checkpoint)
        if tuple(header["img_size"]) != tuple(cfg.model.img_size):
            raise UserError(
                f"artifact geometry {header['img_size']} does not match "
                f"the '{cfg.name}' config's {list(cfg.model.img_size)} — "
                "pass the preset it was exported from"
            )
        batch_size = header["batch_size"] or args.test_batch
        max_depth = float(header["max_depth"])
        decode = bool(header["decode_depth"])

        def predict(feats):
            out = call(np.asarray(feats))
            depth = np.asarray(out["depth"])
            if decode:  # collages want the [0,1] inverse encoding
                depth = 1.0 - depth / max_depth
            seg = out["seg"]
            return depth, None if seg is None else np.asarray(seg)

        model = params = None
    else:
        model, params = _load_params(cfg, args.checkpoint)
    loaders = make_loaders(cfg.data, batch_size=batch_size)
    n = run_visualization(cfg, model, params, loaders["test"] or
                          loaders["val"], args.out, args.num_vis,
                          predict=predict)
    print(f"wrote {n} collages to {args.out}")
    return 0


def cmd_export(args) -> int:
    """Export a trained checkpoint: reference .pth (interop reverse
    path) or a self-contained StableHLO serving artifact
    (interop/hlo_export.py — params baked in, runs without model code
    or config; the ONLY deployment format for the --tpu-decoder
    variant, which has no reference representation)."""
    cfg = _build_config(args)
    if not args.checkpoint:
        print("error: --checkpoint required for export", file=sys.stderr)
        return 2
    if args.format == "stablehlo":
        from camradepth_tpu.interop.hlo_export import (
            export_serving_artifact,
        )

        model, params = _load_params(cfg, args.checkpoint, strict=True)
        header = export_serving_artifact(
            cfg, model, params, args.out,
            batch_size=args.serve_batch,
            platforms=tuple(args.platforms.split(",")),
            artifact_dtype=args.artifact_dtype,
            dynamic_batch=args.dynamic_batch,
        )
        print(f"wrote StableHLO serving artifact to {args.out} "
              f"(batch {header['batch_size'] or 'dynamic'}, platforms "
              f"{','.join(header['platforms'])}, "
              f"{header['artifact_dtype']} weights)")
        return 0
    import torch

    from camradepth_tpu.interop.torch_convert import (
        flax_params_to_state_dict,
    )

    if cfg.model.tpu_decoder:
        print(
            "error: the TPU architecture variant (--tpu-decoder) has no "
            "reference-format representation — its subpixel decoder "
            "stages do not exist in the reference model. Use "
            "--format stablehlo (its deployment path) or export a "
            "parity-architecture checkpoint.",
            file=sys.stderr,
        )
        return 2
    _, params = _load_params(cfg, args.checkpoint, strict=True)
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in flax_params_to_state_dict(params).items()
    }
    torch.save({"state_dict": sd, "lr": cfg.train.learning_rate}, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")
    return 0


def cmd_search(args) -> int:
    """Random hyperparameter search (working equivalent of the reference's
    TODO-stub Trainer.hyperparameters_tuning, runner.py:521-565): sample
    from typed spaces, run short budgeted trials, rank by val loss."""
    import json

    from camradepth_tpu.train.search import (
        random_search,
        successive_halving_search,
    )

    cfg = _build_config(args)
    # Trial budget: short trainings (num-steps per trial).
    import dataclasses as dc

    cfg = cfg.replace(
        train=dc.replace(cfg.train, num_steps=args.trial_steps,
                         save_model=False)
    )
    if args.space:
        raw = json.loads(args.space)
        spaces = {k: (tuple(v[0]), v[1]) for k, v in raw.items()}
    else:
        # reference-style default: LR log-space around the published 6e-5
        spaces = {
            "learning_rate": ((1e-5, 1e-3), "log"),
            "weight_decay": ((1e-6, 1e-2), "log"),
        }
    if getattr(args, "vmap_trials", False):
        from camradepth_tpu.data.pipeline import make_loaders
        from camradepth_tpu.train.search import vmapped_trials

        mesh = None
        if getattr(args, "data_parallel", None):
            import jax

            from camradepth_tpu.config import MeshConfig
            from camradepth_tpu.parallel.mesh import create_mesh

            try:
                mesh = create_mesh(
                    MeshConfig(data_parallel=args.data_parallel),
                    jax.devices()[: args.data_parallel],
                )
            except ValueError as e:  # dp > available devices
                raise UserError(str(e)) from e
        # batches/val-batch extraction lives in ONE place —
        # search._resolve_batches — shared with the library callers (a
        # CLI-side copy of this logic already diverged once; see the
        # round-3 self-review's vmapped_trials loaders fix)
        loaders = make_loaders(cfg.data, cfg.train.batch_size)
        try:
            if args.halving:
                from camradepth_tpu.train.search import vmapped_halving

                best, best_loss, results = vmapped_halving(
                    cfg, spaces, num_trials=args.num_trials,
                    min_steps=args.min_steps, max_steps=args.trial_steps,
                    seed=args.seed, loaders=loaders, mesh=mesh,
                )
            else:
                best, best_loss, results = vmapped_trials(
                    cfg, spaces, num_trials=args.num_trials,
                    num_steps=args.trial_steps, seed=args.seed,
                    loaders=loaders, mesh=mesh,
                )
        except ValueError as e:
            if "train split too small" in str(e):
                print(f"error: {e}", file=sys.stderr)
                return 2
            raise
    elif args.halving:
        best, best_loss, results = successive_halving_search(
            cfg, spaces, num_trials=args.num_trials,
            min_steps=args.min_steps, max_steps=args.trial_steps,
            seed=args.seed,
        )
    else:
        best, best_loss, results = random_search(
            cfg, spaces, num_trials=args.num_trials, seed=args.seed
        )
    for r in results:
        print(json.dumps(r))
    print(f"best config: {json.dumps(best)} (val loss {best_loss:.6f})")
    return 0


def cmd_serve(args) -> int:
    """Stream depth inference over prepared feature stacks.

    The production counterpart of the reference's batch-1 test loop
    (runner.py:409-420): batched, pipelined, one jitted graph. Input
    frames come from a split table (the same artifact contract the
    trainer consumes); outputs are per-frame metric-depth .npy files
    plus a throughput report.
    """
    import json

    import numpy as np

    from camradepth_tpu.data.pipeline import make_loaders
    from camradepth_tpu.serving import load_engine, serving_mesh

    _enable_compile_cache_on_accelerator()
    cfg = _build_config(args)
    if not args.checkpoint:
        print("error: --checkpoint required for serve (Orbax dir or "
              "reference .pth)", file=sys.stderr)
        return 2
    dp = getattr(args, "data_parallel", None) or 1
    sp = getattr(args, "spatial_parallel", None) or 1
    if dp > 1 and args.serve_batch % dp:
        print(
            f"error: --serve-batch {args.serve_batch} is not divisible "
            f"by --data-parallel {dp}", file=sys.stderr,
        )
        return 2
    if sp > 1 and cfg.model.img_size[0] % sp:
        print(
            f"error: image height {cfg.model.img_size[0]} is not "
            f"divisible by --spatial-parallel {sp}", file=sys.stderr,
        )
        return 2
    try:
        mesh, batch_axis, sp_axis = serving_mesh(dp, sp)
    except ValueError as e:  # more devices requested than exist
        raise UserError(str(e)) from e
    from camradepth_tpu.interop.hlo_export import is_artifact

    if is_artifact(args.checkpoint) and mesh is not None:
        raise UserError(
            "StableHLO artifacts cannot be served with --data-parallel/"
            "--spatial-parallel — their partitioning is fixed at export "
            "time; serve the Orbax/.pth checkpoint instead"
        )
    # compact wire serving (data/wire.py): requests ship uint8 images
    # + COO radar, the engine decodes on device inside the jitted
    # forward — bit-identical outputs from ~8x fewer H2D (and network)
    # bytes/frame. Checkpoint sources only (artifacts bake a dense
    # signature), batch sharding only (the decode is frame-local).
    # Split streaming probes the dataset for point caps; the HTTP
    # endpoint has no dataset to probe, so it needs an explicit
    # --set data.wire_radar_cap=N (caps are published in /v1/info).
    wire_plan = None
    loaders = None
    http = getattr(args, "http_port", None) is not None
    wire_want = (
        cfg.data.wire_format != "off"
        and not is_artifact(args.checkpoint)
        and sp_axis is None
    )
    if cfg.data.wire_format == "on" and not wire_want:
        raise UserError(
            "data.wire_format=on is incompatible with artifact / "
            "spatially-sharded serving — use wire auto or off"
        )
    if wire_want and http:
        from camradepth_tpu.data.wire import WirePlan, wire_supported

        if not wire_supported(cfg.data):
            # im_uv / sparse_lidar configs carry dense non-radar feature
            # channels the COO request can't represent — a hand-built
            # plan here would scatter radar values into those slots
            if cfg.data.wire_format == "on":
                raise UserError(
                    "data.wire_format=on is unsupported for this channel "
                    "config (im_uv / sparse_lidar need the dense request "
                    "format) — use wire auto or off"
                )
        elif cfg.data.wire_radar_cap:
            from camradepth_tpu.data.wire import radar_channel_count

            n_radar_ch = radar_channel_count(cfg.data)
            # rgb-only presets (input_channels=3) have no radar slots —
            # a zero-channel wire engine would be degenerate; and an
            # inconsistent model/data pairing must not silently pick
            # the wrong channel count
            if cfg.model.input_channels <= 3:
                raise UserError(
                    "data.wire_radar_cap set but the model takes no "
                    f"radar channels (input_channels="
                    f"{cfg.model.input_channels}) — wire serving needs "
                    "a camera+radar preset"
                )
            if n_radar_ch != cfg.model.input_channels - 3:
                raise UserError(
                    f"model/data channel mismatch: the data config "
                    f"carries {n_radar_ch} radar channels but the model "
                    f"expects {cfg.model.input_channels - 3} "
                    f"(input_channels={cfg.model.input_channels}) — "
                    "fix the preset/--set pairing before wire serving"
                )
            wire_plan = WirePlan(
                radar_cap=cfg.data.wire_radar_cap, gt_cap=0,
                n_radar_ch=n_radar_ch,
            )
        elif cfg.data.wire_format == "on":
            raise UserError(
                "HTTP wire serving needs an explicit request shape: "
                "pass --set data.wire_radar_cap=N (no dataset to "
                "probe point caps from)"
            )
    elif wire_want:
        from camradepth_tpu.data.pipeline import make_loaders as _ml

        loaders = _ml(cfg.data, batch_size=args.serve_batch,
                      wire_eval=True)
        lo = loaders.get("test") or loaders.get("val")
        wire_plan = lo.frames.wire_plan if lo is not None else None
        if wire_plan is None:
            loaders = None  # plan probe fell back -> dense loaders
    try:
        engine = load_engine(cfg, args.checkpoint,
                             batch_size=args.serve_batch, mesh=mesh,
                             batch_axis=batch_axis, spatial_axis=sp_axis,
                             wire_plan=wire_plan)
    except ValueError as e:
        # artifact header validation (geometry/preset mismatch) — a
        # user error; internal failures inside model init/restore are
        # not ValueErrors on these paths
        if is_artifact(args.checkpoint):
            raise UserError(str(e)) from e
        raise
    if getattr(args, "http_port", None) is not None:
        # network mode: REST endpoint instead of split streaming
        from camradepth_tpu.serving_http import serve_forever

        serve_forever(engine, cfg, args.http_host, args.http_port,
                      batch_window_ms=args.http_batch_window_ms)
        return 0
    # the engine may have pinned a different batch size than
    # --serve-batch (a fixed-batch StableHLO artifact bakes its own);
    # batching the loader to the ENGINE's size keeps the no-copy
    # pass-through path (oversize items would be re-chunked row-wise)
    if loaders is None:
        loaders = make_loaders(cfg.data, batch_size=engine.batch_size)
    loader = loaders.get("test") or loaders.get("val")
    if loader is None:
        print("error: split has no test/val frames", file=sys.stderr)
        return 2
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    def frames():
        # pre-batched items pass through infer_stream without the
        # per-frame unpack/restack copy; the engine re-chunks ragged
        # tails itself. Eval loaders pad + mask the tail, so only the
        # valid rows are forwarded.
        from camradepth_tpu.data.wire import is_wire_micro
        from camradepth_tpu.serving import SERVE_WIRE_KEYS

        for batch in loader:
            if is_wire_micro(batch):
                item = {k: np.asarray(batch[k]) for k in SERVE_WIRE_KEYS}
                valid = np.asarray(
                    batch.get("valid",
                              np.ones(item["image_u8"].shape[0]))
                ).astype(bool)
                if not valid.all():
                    item = {k: v[valid] for k, v in item.items()}
                yield item
                continue
            feats = np.asarray(batch["features"])
            valid = np.asarray(
                batch.get("valid", np.ones(feats.shape[0]))
            ).astype(bool)
            feats = feats[..., : cfg.model.input_channels]
            yield feats if valid.all() else feats[valid]

    n = 0
    for i, res in enumerate(
        engine.infer_stream(frames(), inflight=args.inflight)
    ):
        np.save(out_dir / f"{i:05d}_depth.npy", res["depth"])
        if "seg" in res:
            np.save(out_dir / f"{i:05d}_seg.npy", res["seg"])
        n += 1
        if args.limit and n >= args.limit:
            break
    stats = engine.stats()
    # "frames" = frames WRITTEN (--limit truncates mid-batch); the
    # engine's device-side count stays available as frames_processed.
    stats["frames_processed"] = stats.pop("frames", 0.0)
    print(json.dumps({**stats, "frames": n}))
    return 0



def cmd_summary(args) -> int:
    """Model summary: per-module parameter table + analytic per-frame
    FLOPs and the MXU-attainable floor (utils/roofline.py). The
    reference prints a torchinfo summary in its __main__ smoke block
    (CamRaDepth.py:179-180); this is the product-path equivalent, and it
    runs shape-only — no weights are materialized, no device is claimed,
    so it is safe on the login host while the TPU is busy."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.utils import roofline as rl

    cfg = _build_config(args)
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    b = args.summary_batch
    x = jax.ShapeDtypeStruct((b, h, w, cfg.model.input_channels),
                             jnp.float32)
    variables = jax.eval_shape(
        lambda key, xx: model.init({"params": key}, xx,
                                   deterministic=True),
        jax.ShapeDtypeStruct((2,), jnp.uint32), x,
    )
    params = variables["params"]

    def count(tree):
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))

    total = count(params)
    print(f"CamRaDepth preset={cfg.name} img={h}x{w} "
          f"in_ch={cfg.model.input_channels} depths={cfg.model.depths}"
          + (" [tpu_decoder]" if cfg.model.tpu_decoder else ""))
    print(f"{'module':<40}{'params':>14}")
    for name in sorted(params):
        print(f"{name:<40}{count(params[name]):>14,}")
    print(f"{'TOTAL':<40}{total:>14,}  "
          f"({total * 4 / 1e6:.1f} MB fp32)")

    def fwd(p, xx):
        return model.apply({"params": p}, xx, deterministic=True)[
            "depth"
        ]["final_depth"]

    r = rl.analyze(fwd, params, x)
    gf = sum(op.flops for op in r.matmuls) / b / 1e9
    floor_ms = r.t_matmul_floor / b * 1e3
    print(f"matmul GFLOPs/frame: {gf:.1f}  "
          f"(MXU lane/sublane-padded attainable floor at batch {b}: "
          f"{floor_ms:.2f} ms/frame on v5e — compute term only; "
          f"bench.py adds the HBM bytes term)")

    if getattr(args, "project_scaling", None):
        from camradepth_tpu.utils import scaling

        step_ms = args.step_time_ms
        if step_ms is None:
            # last measured --tpu-tuned train step (CLAUDE.md perf
            # ledger); override with --step-time-ms from a fresh
            # tools/profile_train.py run
            step_ms = 372.6
        pts = scaling.project_dp_scaling(
            total, step_ms / 1e3,
            n_chips=[1, 2, 4, 8, 16, 32, 64],
            mode=args.project_scaling,
        )
        frames = cfg.train.desired_batch_size or cfg.train.batch_size
        print()
        print(scaling.format_projection(
            pts, args.project_scaling, total, frames_per_step=frames))
    return 0


def cmd_validate_data(args) -> int:
    """Artifact-contract checker for a prepared dataset. The reference
    builds split tables by zipping independently-globbed sorted lists
    (create_a_split_file.py:40-67), so one missing artifact silently
    shifts every later row's columns and the model trains on misaligned
    frames — this catches that (and shape/dtype/readability problems)
    before a training run burns chip time."""
    from camradepth_tpu.data.split import (
        build_split_from_dir,
        load_split,
        validate_split,
    )

    if bool(args.split) == bool(args.data_dir):
        print("error: give exactly one of --split / --data-dir",
              file=sys.stderr)
        return 2
    rows = (load_split(args.split) if args.split
            else build_split_from_dir(args.data_dir))
    hw = tuple(int(v) for v in args.image_dimension.split(","))
    r = validate_split(rows, image_dimension=hw, limit=args.limit,
                       decode_images=not args.no_decode)
    for i, msg in r["errors"]:
        print(f"row {i}: {msg}")
    n_err = len(r["errors"])
    extra = " (further errors suppressed)" if n_err >= 50 else ""
    status = "OK" if r["ok"] else f"{n_err} errors"
    print(f"checked {r['checked']} rows: {status}{extra}")
    return 0 if r["ok"] else 1


def cmd_inspect(args) -> int:
    """Bounded artifact inspector: identify + summarize any deployable
    file this framework produces or consumes — StableHLO serving
    artifact, reference .pth, Orbax run dir, (N,7) split table —
    WITHOUT initializing a device backend (safe to run while the
    tunneled TPU is unreachable; cf. doctor). One JSON object."""
    import json

    from pathlib import Path as _P

    path = _P(args.path)
    if not path.exists():
        print(f"error: {path} does not exist", file=sys.stderr)
        return 2
    info: dict = {"path": str(path)}
    from camradepth_tpu.interop.hlo_export import is_artifact, read_header

    if path.is_file() and is_artifact(str(path)):
        header, blob_bytes = read_header(str(path))
        info.update(type="stablehlo-artifact", header=header,
                    compiled_blob_bytes=blob_bytes)
    elif path.is_dir():
        # an Orbax run dir (ckpt_epoch_* children) or one checkpoint dir
        from camradepth_tpu.utils.checkpoint import latest_checkpoint

        ckpts = []
        import re as _re

        is_ckpt_dir = _re.match(r"ckpt_(?:preempt_)?epoch_", path.name)
        candidates = (
            [path] if is_ckpt_dir
            else sorted(path.glob("ckpt_epoch_*_loss_*"))
            + sorted(path.glob("ckpt_preempt_epoch_*_step_*"))
        )
        for p in candidates:
            m = _re.match(r"ckpt_epoch_(\d+)_loss_([\d.]+)", p.name)
            pm = (None if m else
                  _re.match(r"ckpt_preempt_epoch_(\d+)_step_(\d+)", p.name))
            if not m and not pm:
                continue
            size = sum(f.stat().st_size for f in p.rglob("*")
                       if f.is_file())
            entry = {"name": p.name, "bytes": size}
            if m:
                entry.update(epoch=int(m.group(1)),
                             eval_loss=float(m.group(2).rstrip(".")))
            else:
                # graceful-shutdown save: epoch = epochs COMPLETED, no
                # val loss (it holds a partial epoch)
                entry.update(epoch=int(pm.group(1)),
                             step=int(pm.group(2)), preempt=True)
            ckpts.append(entry)
        if not ckpts:
            print(f"error: {path} holds no ckpt_epoch_* / "
                  "ckpt_preempt_epoch_* checkpoints",
                  file=sys.stderr)
            return 2
        latest = latest_checkpoint(
            path if candidates != [path] else path.parent
        )
        info.update(type="orbax-run-dir", checkpoints=ckpts,
                    latest=str(latest) if latest else None)
    elif path.suffix == ".pth":
        import torch

        state = torch.load(str(path), map_location="cpu",
                           weights_only=False)
        sd = state.get("state_dict", state) if isinstance(state, dict) \
            else state
        try:
            n_params = int(sum(v.numel() for v in sd.values()))
        except AttributeError:
            n_params = None
        info.update(
            type="reference-pth", tensors=len(sd), params=n_params,
            extra_keys=sorted(k for k in state if k != "state_dict")
            if isinstance(state, dict) and "state_dict" in state else [],
        )
    elif path.suffix == ".npy":
        import numpy as np

        rows = np.load(str(path), allow_pickle=True)
        info.update(type="split-table", shape=list(rows.shape))
        if rows.ndim == 2 and rows.shape[1] == 7 and len(rows):
            info["first_row"] = [str(v) for v in rows[0]]
    else:
        print(f"error: unrecognized artifact {path} (expected a "
              "StableHLO artifact, .pth, Orbax dir, or split .npy)",
              file=sys.stderr)
        return 2
    print(json.dumps(info, indent=1))
    return 0


def cmd_doctor(args) -> int:
    """Environment health report. Backend init HANGS (not errors) when
    the tunneled TPU is unreachable, so every backend touch happens in a
    bounded-timeout subprocess — doctor never hangs and never leaves
    this process holding the chip."""
    import shutil
    import subprocess

    import os

    ok = True
    # The axon sitecustomize wins backend selection over the env var;
    # an explicitly CPU-targeted doctor must force the config update
    # before backend init (same landmine as __graft_entry__'s dryrun).
    force_cpu = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        if "cpu" in os.environ.get("JAX_PLATFORMS", "") else ""
    )
    code = force_cpu + (
        "import jax\n"
        "ds = jax.devices()\n"
        "print('backend:', jax.default_backend(),"
        " '| jax', jax.__version__)\n"
        "print('devices:', ', '.join(f'{d.id}:{d.device_kind}'"
        " for d in ds))\n"
        "try:\n"
        "    ms = ds[0].memory_stats() or {}\n"
        "    lim = ms.get('bytes_limit')\n"
        "    if lim: print(f'hbm: {lim/2**30:.2f} GiB/device')\n"
        "except Exception:\n"
        "    pass\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, timeout=args.timeout,
        )
        if proc.returncode == 0:
            print(proc.stdout, end="")
        else:
            ok = False
            print(f"backend: FAILED rc={proc.returncode}: "
                  f"{proc.stderr.strip()[-300:]}")
    except subprocess.TimeoutExpired:
        ok = False
        print(f"backend: UNREACHABLE (init hung > {args.timeout:.0f}s — "
              "tunnel down or another process holds the chip)")

    from camradepth_tpu import native

    print(f"native C++ kernels: "
          f"{'ok' if native.available() else 'MISSING (numpy fallback)'}")
    for mod, why in (("cv2", "jpg decode (loader, prep)"),
                     ("torch", "checkpoint import/export, adapters"),
                     ("nuscenes", "offline prep only")):
        try:
            __import__(mod)
            print(f"{mod}: ok ({why})")
        except ImportError:
            print(f"{mod}: missing ({why})")
    cache = Path("/tmp/camradepth_jax_cache")
    if cache.is_dir():
        n = sum(1 for _ in cache.iterdir())
        print(f"compile cache: {n} entries at {cache}")
    else:
        print("compile cache: empty (first TPU compiles will be slow)")
    free_gb = shutil.disk_usage("/tmp").free / 2 ** 30
    print(f"/tmp free: {free_gb:.1f} GiB")
    return 0 if ok else 1


def cmd_bench(args) -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parents[1] / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="camradepth", description="TPU-native CamRaDepth framework"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("prep", help="offline data preparation (11 stages)")
    p.add_argument("--data-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--mini", action="store_true")
    p.add_argument("--stages", default=None,
                   help="comma list; default all")
    p.add_argument("--flow", default="lk",
                   choices=["lk", "none", "jax-raft", "raft", "torchscript"],
                   help="optical-flow estimator: built-in pyramidal LK, a "
                        "RAFT TorchScript export (--flow-ckpt), the native "
                        "JAX RAFT fed an official .pth (jax-raft), or "
                        "none (expects precomputed *_flow.npy)")
    p.add_argument("--flow-ckpt", default="",
                   help="TorchScript file for --flow raft/torchscript "
                        "(reference scripts/cal_flow.py:18-21)")
    p.add_argument("--seg", default="none",
                   choices=["none", "jax-panoptic", "torchscript",
                            "panoptic-deeplab"],
                   help="semantic-seg estimator: 'jax-panoptic' (the "
                        "official panoptic_deeplab_R101_os32_cityscapes"
                        ".pth into the TPU-native clean-room JAX model, "
                        "models/panoptic_deeplab.py), a TorchScript "
                        "export (--seg-ckpt) or none (expects precomputed "
                        "*_mseg.npy; scripts/semantic_seg.py)")
    p.add_argument("--seg-ckpt", default="",
                   help="checkpoint for --seg (official .pth for "
                        "jax-panoptic, TorchScript file otherwise)")
    p.add_argument("--seg-remap", default="merged",
                   choices=["merged", "vehicle", "cityscapes",
                            "vehicle_cityscapes"],
                   help="estimator label space + artifact: mseg-universal "
                        "-> 21-class ('merged') / vehicle mask "
                        "('vehicle'); cityscapes trainIds -> 21-class "
                        "('cityscapes') / vehicle mask "
                        "('vehicle_cityscapes', semantic_seg.py:163-166). "
                        "Use the cityscapes pair with --seg jax-panoptic")
    p.set_defaults(fn=cmd_prep)

    p = sub.add_parser("train", help="train a model variant")
    _add_common_model_flags(p)
    p.add_argument("--data-parallel", type=int, default=None,
                   help="data-axis mesh size; default auto = largest "
                        "batch divisor fitting the devices (the reference "
                        "runs DataParallel by default, runner.py:135-136)")
    p.add_argument("--fsdp", type=int, default=None,
                   help="fsdp-axis mesh size (ZeRO-style param/optimizer "
                        "sharding)")
    p.add_argument("--spatial-parallel", type=int, default=None,
                   help="shard the image H axis over this many chips")
    p.add_argument("--run-dir", default=None,
                   help="explicit run directory (required for "
                        "multi-process runs; default: auto-indexed "
                        "Output/<arch>/<run>/<n>)")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="write best-val checkpoints on a background "
                        "thread (Orbax async) instead of blocking the "
                        "epoch loop")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host pod: jax.distributed."
                        "initialize with TPU auto-detection (one process "
                        "per host; run the same command on every host)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-process coordinator address (explicit "
                        "form of --multihost for non-TPU clusters/tests; "
                        "requires --num-processes and --process-id)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser(
        "distill",
        help="distill a parity teacher checkpoint into the --tpu-decoder "
             "variant (dense per-pixel teacher supervision; makes the "
             "fast variant usable from reference weights)")
    _add_common_model_flags(p)
    p.add_argument("--teacher-checkpoint", required=True,
                   help="teacher weights: reference .pth, Orbax "
                        "checkpoint, or a run dir (best ckpt "
                        "auto-selected)")
    p.add_argument("--teacher-tpu-decoder", action="store_true",
                   help="the teacher itself is a TPU-decoder model "
                        "(self-distillation / compression runs)")
    p.add_argument("--no-strict-teacher", action="store_true",
                   help="allow a partially-matching teacher checkpoint "
                        "(mismatched tensors keep fresh init — normally "
                        "refused because random teacher heads poison the "
                        "distillation targets)")
    p.add_argument("--alpha", type=float, default=0.7,
                   help="objective mix: alpha*distill + (1-alpha)*GT "
                        "multitask loss (default 0.7; 1.0 = pure "
                        "distillation, no lidar needed for the loss)")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="softmax temperature for the seg-logit KL terms")
    p.add_argument("--no-teacher-init", action="store_true",
                   help="skip the shape-matching warm start from the "
                        "teacher weights (utils.py:352-370 semantics; "
                        "also skipped automatically when --checkpoint "
                        "resumes a student)")
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--fsdp", type=int, default=None)
    p.add_argument("--spatial-parallel", type=int, default=None)
    p.add_argument("--run-dir", default=None)
    p.add_argument("--async-checkpoint", action="store_true")
    p.set_defaults(fn=cmd_distill)

    p = sub.add_parser("test", help="test-split metric report")
    p.add_argument("--report-json", default=None, metavar="PATH",
                   help="also write the metric dict as JSON (for CI / "
                        "regression tracking)")
    _add_common_model_flags(p)
    p.add_argument("--test-batch", type=int, default=8)
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("viz", help="prediction collages")
    _add_common_model_flags(p)
    p.add_argument("--out", default="viz_out")
    p.add_argument("--num-vis", type=int, default=25)
    p.add_argument("--test-batch", type=int, default=8)
    p.set_defaults(fn=cmd_viz)

    p = sub.add_parser("export",
                       help="export checkpoint: reference .pth or "
                            "self-contained StableHLO serving artifact")
    _add_common_model_flags(p)
    p.add_argument("--out", required=True)
    p.add_argument("--format", choices=("pth", "stablehlo"),
                   default="pth",
                   help="pth: reference-compatible state dict; "
                        "stablehlo: compiled serving artifact (params "
                        "baked in, loadable by `serve` with no model "
                        "code — required for --tpu-decoder)")
    p.add_argument("--serve-batch", type=int, default=8,
                   help="batch size baked into a stablehlo artifact")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets for a "
                        "stablehlo artifact")
    p.add_argument("--artifact-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="weight dtype baked into a stablehlo artifact; "
                        "bfloat16 halves the file and is numerically "
                        "free on bfloat16-compute configs (the "
                        "flagship default)")
    p.add_argument("--dynamic-batch", action="store_true",
                   help="export the stablehlo artifact with a SYMBOLIC "
                        "batch dimension (serves any batch size; the "
                        "runtime compiles per concrete shape on first "
                        "use) instead of baking --serve-batch")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "search", help="random hyperparameter search (runner.py:521-565)"
    )
    _add_common_model_flags(p)
    p.add_argument("--num-trials", type=int, default=10,
                   help="reference default args.random_search_num_trials")
    p.add_argument("--trial-steps", type=int, default=50,
                   help="optimizer-step budget per trial")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--space", default=None,
                   help='JSON {"field": [[lo,hi],"log|float|int|item"], …}; '
                        "model./data. prefixes route to those config trees")
    p.add_argument("--halving", action="store_true",
                   help="successive-halving early pruning: all trials "
                        "start at --min-steps, each rung keeps the best "
                        "1/3 with a 3x budget up to --trial-steps")
    p.add_argument("--vmap-trials", action="store_true",
                   help="train ALL trials simultaneously as one jitted "
                        "vmapped program (optimizer hyperparameters "
                        "only: learning_rate/weight_decay), optionally "
                        "sharding the trial axis over --data-parallel "
                        "devices; combine with --halving for "
                        "checkpoint-based successive halving (survivors "
                        "continue training, rungs prune the vmapped "
                        "trial axis)")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="with --vmap-trials: shard the trial axis over "
                        "this many devices (num-trials must divide)")
    p.add_argument("--min-steps", type=int, default=10,
                   help="rung-0 step budget for --halving")
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser(
        "serve", help="streaming batched inference over a split "
                      "(production serving engine)"
    )
    _add_common_model_flags(p)
    p.add_argument("--out", default="served")
    p.add_argument("--serve-batch", type=int, default=8,
                   help="8 is the v5e sweet spot (XLA space-to-batches "
                        "convs below batch 8)")
    p.add_argument("--limit", type=int, default=0,
                   help="stop after N frames (0 = all)")
    p.add_argument("--inflight", type=int, default=2,
                   help="batches kept queued on the device so output "
                        "D2H overlaps the next batch's compute "
                        "(1 = fully serialized)")
    p.add_argument("--http-port", type=int, default=None,
                   help="serve a REST endpoint instead of streaming a "
                        "split: GET /healthz, GET /v1/info, POST "
                        "/v1/depth (.npy in, .npz out; with --wire + "
                        "--set data.wire_radar_cap=N requests are "
                        "compact .npz wire bodies, ~8x smaller); "
                        "0 = ephemeral")
    p.add_argument("--http-host", default="0.0.0.0")
    p.add_argument("--http-batch-window-ms", type=float, default=3.0,
                   help="cross-request micro-batching window: "
                        "concurrent POSTs coalesce into one device "
                        "batch (batch-1 forwards cost ~3x a batched "
                        "slot here); 0 disables")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard the serving batch over this many chips "
                        "(throughput scales with chips)")
    p.add_argument("--spatial-parallel", type=int, default=1,
                   help="shard the image H axis over this many chips "
                        "(GSPMD halo exchanges; cuts single-frame "
                        "latency). Combinable with --data-parallel — "
                        "inference is exact under any sp layout")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "summary",
        help="model summary: per-module params + analytic FLOPs/floor "
             "(shape-only; claims no device)",
    )
    _add_common_model_flags(p)
    p.add_argument("--summary-batch", type=int, default=8,
                   help="batch size for the FLOPs/floor analysis "
                        "(matches bench.py's headline batch)")
    p.add_argument("--project-scaling", choices=["weak", "strong"],
                   default=None,
                   help="also print the analytic data-parallel scaling "
                        "projection (gradient all-reduce vs compute; "
                        "utils/scaling.py — projection, not measurement)")
    p.add_argument("--step-time-ms", type=float, default=None,
                   help="measured single-chip train-step ms to anchor "
                        "--project-scaling (default: last recorded "
                        "--tpu-tuned measurement)")
    p.set_defaults(fn=cmd_summary)

    p = sub.add_parser(
        "validate-data",
        help="artifact-contract checker for a prepared dataset "
             "(catches the sorted-glob column-shift failure mode, "
             "missing files, wrong shapes/dtypes)",
    )
    p.add_argument("--split", default=None, help="(N,7) split .npy")
    p.add_argument("--data-dir", default=None,
                   help="prepared_data dir to glob instead of a split")
    p.add_argument("--image-dimension", default="416,800",
                   metavar="H,W")
    p.add_argument("--limit", type=int, default=0,
                   help="check only the first N rows (0 = all)")
    p.add_argument("--no-decode", action="store_true",
                   help="skip jpg decode (faster)")
    p.set_defaults(fn=cmd_validate_data)

    p = sub.add_parser(
        "inspect",
        help="summarize any artifact (StableHLO/.pth/Orbax dir/split "
             ".npy) without touching a device backend",
    )
    p.add_argument("path")
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser(
        "doctor",
        help="environment health report (bounded backend probe, "
             "native kernels, optional deps, compile cache)",
    )
    p.add_argument("--timeout", type=float, default=60.0,
                   help="seconds to wait for backend init before "
                        "declaring the device unreachable")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser("bench", help="headline throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    from camradepth_tpu.config import ConfigError

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except (UserError, ConfigError) as e:
        # config-building errors (bad --set path/value, preset invariant
        # violations, strict-export mismatches) and library-raised
        # ConfigErrors (unsupported field combinations discovered at
        # construction time, e.g. wire-format checks) are user errors,
        # not crashes. Anything else propagates with its traceback — a
        # blanket ValueError catch would mask internal numpy/JAX shape
        # errors deep in training as "bad flag" exits.
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    raise SystemExit(main())
