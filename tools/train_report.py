"""Summarize a training run dir into one committed-evidence JSON.

VERDICT r3 item 7: the 16.1/38.8 train-fps numbers were profiled over
a few steps; this report proves (or honestly refutes) them over a full
run by distilling the run dir's metrics.jsonl into step-time series
statistics + the loss/val curves + checkpoint inventory.

Usage: python tools/train_report.py <run_dir> [--out report.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def summarize(run_dir: str | Path) -> dict:
    run_dir = Path(run_dir)
    rows = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if line.strip()
    ]
    by_tag: dict = {}
    for r in rows:
        by_tag.setdefault(r["tag"], []).append(r)

    def series(tag, k=12):
        pts = by_tag.get(tag, [])
        if not pts:
            return None
        idx = np.unique(
            np.linspace(0, len(pts) - 1, min(k, len(pts))).astype(int)
        )
        return [
            {"step": pts[i]["step"], "value": round(pts[i]["value"], 6)}
            for i in idx
        ]

    out = {
        "run_dir": str(run_dir),
        "loss_curve": series("train/loss"),
        "val_loss_curve": series("val/loss"),
        "val_rmse_m_curve": series("val/rmse_m"),
        "lr_curve": series("train/lr", 5),
        "checkpoints": sorted(
            p.name for p in run_dir.iterdir()
            if p.is_dir() and p.name.startswith("ckpt")
        ),
    }
    sps = by_tag.get("train/steps_per_sec", [])
    if sps:
        # steps_per_sec is cumulative-within-epoch; the steady value is
        # the tail of each epoch. Also reconstruct per-log-interval
        # instantaneous rates from wall timestamps.
        vals = np.asarray([r["value"] for r in sps], np.float64)
        times = np.asarray([r["time"] for r in sps], np.float64)
        steps = np.asarray([r["step"] for r in sps], np.float64)
        dt = np.diff(times)
        ds = np.diff(steps)
        ok = (dt > 0) & (ds > 0)
        inst = ds[ok] / dt[ok]
        out["steps_per_sec"] = {
            "reported_median": round(float(np.median(vals)), 4),
            "n_logged": int(len(sps)),
        }
        if inst.size:  # needs >=2 logged rows (short/preempted runs)
            out["steps_per_sec"].update(
                instantaneous_p50=round(float(np.percentile(inst, 50)), 4),
                instantaneous_p90=round(float(np.percentile(inst, 90)), 4),
                instantaneous_p10=round(float(np.percentile(inst, 10)), 4),
            )
        first_loss = by_tag["train/loss"][0]
        last_loss = by_tag["train/loss"][-1]
        out["steps_total"] = int(last_loss["step"])
        out["wall_clock_s"] = round(
            float(last_loss["time"] - first_loss["time"]), 1
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--extra", default=None,
                    help="JSON string merged into the report "
                         "(context: batch size, device, config)")
    args = ap.parse_args()
    rep = summarize(args.run_dir)
    if args.extra:
        rep.update(json.loads(args.extra))
    text = json.dumps(rep, indent=1)
    if args.out:
        Path(args.out).write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
