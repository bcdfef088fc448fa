"""Teacher-vs-student accuracy report for a distilled TPU-decoder model.

VERDICT r3 item 2: the --tpu-decoder variant's 6x speedup had no
accuracy story. This report attaches one: evaluate the parity TEACHER
and the distilled STUDENT through the SAME metric harness
(reference metric definitions, runner.py:394-519) on the test split,
and additionally measure the student's dense agreement with its
teacher (MAE/RMSE between the two predictions in metric depth space) —
the quantity distillation directly optimizes.

Usage:
  python tools/distill_report.py --teacher <ckpt|run-dir>
      --student <ckpt|run-dir> --split split.npy
      --train-val-split 192,24 [--out DISTILL_REPORT.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", required=True)
    ap.add_argument("--student", required=True)
    ap.add_argument("--split", required=True)
    ap.add_argument("--train-val-split", default=None)
    ap.add_argument("--preset", default="base")
    ap.add_argument("--test-batch", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--extra", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from camradepth_tpu import config as C
    from camradepth_tpu.cli import (
        _enable_compile_cache_on_accelerator,
        _load_params,
    )

    _enable_compile_cache_on_accelerator()
    from camradepth_tpu.data.pipeline import make_loaders
    from camradepth_tpu.data import channels
    from camradepth_tpu.evaluation.harness import evaluate

    cfg = C.preset(args.preset)
    data_kw = {"split_path": args.split}
    if args.train_val_split:
        n_tr, n_va = (int(v) for v in args.train_val_split.split(","))
        data_kw["train_val_split"] = (n_tr, n_va)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, **data_kw)
    )

    def load(path, tpu_decoder):
        c = cfg.replace(
            model=dataclasses.replace(cfg.model, tpu_decoder=tpu_decoder)
        )
        return _load_params(c, path)

    teacher, t_params = load(args.teacher, tpu_decoder=False)
    student, s_params = load(args.student, tpu_decoder=True)

    loaders = make_loaders(cfg.data, batch_size=args.test_batch)
    t_report = evaluate(cfg, teacher, t_params, loaders["test"])
    s_report = evaluate(
        cfg.replace(model=dataclasses.replace(cfg.model,
                                              tpu_decoder=True)),
        student, s_params, loaders["test"],
    )

    # dense teacher-vs-student agreement in metric depth space
    @jax.jit
    def both(feats):
        td = teacher.apply({"params": t_params}, feats,
                           deterministic=True)["depth"]["final_depth"]
        sd = student.apply({"params": s_params}, feats,
                           deterministic=True)["depth"]["final_depth"]
        return td[..., 0], sd[..., 0]

    max_d = float(cfg.data.max_distances[0])
    abs_sum = sq_sum = n_px = 0.0
    n_frames = 0
    for batch in loaders["test"]:
        valid = np.asarray(batch.get(
            "valid", np.ones(batch["features"].shape[0])
        )) > 0
        td, sd = both(jnp.asarray(batch["features"]))
        td = channels.decode_inverse_depth(
            np.asarray(td, np.float64), max_d
        )
        sd = channels.decode_inverse_depth(
            np.asarray(sd, np.float64), max_d
        )
        diff = (td - sd)[valid]
        abs_sum += float(np.abs(diff).sum())
        sq_sum += float((diff ** 2).sum())
        n_px += diff.size
        n_frames += int(valid.sum())

    report = {
        "teacher": {k: float(v) for k, v in t_report.items()},
        "student": {k: float(v) for k, v in s_report.items()},
        "student_vs_teacher": {
            "dense_mae_m": round(abs_sum / n_px, 4),
            "dense_rmse_m": round((sq_sum / n_px) ** 0.5, 4),
            "n_test_frames": n_frames,
        },
        "notes": (
            "teacher = parity architecture; student = --tpu-decoder "
            "variant distilled from it (train/distill.py). Metrics via "
            "the same harness as `cli test` (reference definitions, "
            "runner.py:394-519); dense agreement in metres over ALL "
            "pixels of the test frames."
        ),
    }
    if args.extra:
        report.update(json.loads(args.extra))
    text = json.dumps(report, indent=1)
    if args.out:
        Path(args.out).write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
