"""Test-mode evaluation driver: reference metric report + throughput.

Mirrors the reference's test flow (runner.py:394-519) — per-frame metrics at
both caps, rain(edge)/sunny RMSE split by filename, seg IoU, mean inference
time — but batched: the device computes per-frame metric rows for a whole
batch in one jitted call, and only tiny [B]-vectors cross the host boundary
(the reference syncs full prediction maps to host per frame).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from camradepth_tpu.config import ExperimentConfig
from camradepth_tpu.data import wire
from camradepth_tpu.evaluation import metrics as M
from camradepth_tpu.utils.prefetch import prefetch_iter

# Wall-clock-derived report keys: never metric-compared across runs
# (consumers that diff two reports — e.g. live ckpt vs StableHLO
# artifact — must skip exactly this set).
TIMING_KEYS = (
    "wall_s",
    "time_per_frame_s",
    "frames_per_sec_end_to_end",
    "frames_per_sec_steady",
    "time_per_frame_steady_s",
)


def make_test_step(cfg: ExperimentConfig, model):
    """Returns test_step(params, batch) -> per-frame metric rows [B]."""

    def test_step(params, batch):
        if wire.is_wire_micro(batch):
            # compact wire batches (data/wire.py) decode on device:
            # ~8x fewer H2D bytes per frame than the dense f32 stack,
            # bit-identical features/GT after the fused decode
            batch = wire.decode_wire_micro(batch)
        pred = model.apply(
            {"params": params}, batch["features"], deterministic=True
        )
        depth = pred["depth"]["final_depth"][..., 0]
        rows = M.depth_metrics_inverse(
            depth,
            batch["gt_depth"],
            cfg.data.max_depth,
            cfg.data.max_distances,
        )
        rows.update(
            M.depth_metrics_true(depth, batch["gt_depth"], cfg.data.max_depth)
        )
        if cfg.model.supervised_seg and pred["seg"]["final_seg"] is not None:
            rows["iou"] = M.jaccard_index(
                pred["seg"]["final_seg"], batch["seg"], cfg.model.num_classes
            )
        return rows

    return test_step


def make_artifact_test_step(cfg: ExperimentConfig, call, header):
    """Metric rows from a StableHLO serving artifact's outputs
    (interop/hlo_export.py): the artifact emits decoded metric depth
    (unless exported raw) and argmax seg labels, so the depth is
    re-encoded to the inverse space the reference metrics live in
    (exact up to float roundoff — the decode is affine) and IoU uses
    the label-map variant. Pre-ship validation evaluates the EXACT
    compiled bits that will serve."""

    max_depth = float(header["max_depth"])
    decode = bool(header["decode_depth"])

    def test_step(params, batch):
        del params  # baked into the artifact
        out = call(batch["features"])
        depth = out["depth"]
        enc = (1.0 - depth / max_depth) if decode else depth
        rows = M.depth_metrics_inverse(
            enc, batch["gt_depth"], cfg.data.max_depth,
            cfg.data.max_distances,
        )
        rows.update(
            M.depth_metrics_true(enc, batch["gt_depth"], cfg.data.max_depth)
        )
        if (cfg.model.supervised_seg and out.get("seg") is not None
                and "seg" in batch):
            rows["iou"] = M.jaccard_index_labels(
                out["seg"], batch["seg"], cfg.model.num_classes
            )
        return rows

    return test_step


def evaluate(
    cfg: ExperimentConfig,
    model,
    params,
    loader,
    time_inference: bool = True,
    test_step=None,
    prefetch: int = 2,
) -> Dict[str, float]:
    """Run the full test split; returns the reference report plus
    true-depth north-star metrics and throughput. ``test_step``
    overrides the model-built step (the deployment-artifact path,
    :func:`make_artifact_test_step`). ``prefetch`` batches are loaded
    + dispatched ahead on a worker thread (device_put is async) so host
    artifact reads overlap device compute; 0 = inline."""
    if test_step is None:
        test_step = jax.jit(make_test_step(cfg, model))
    all_rows = []
    names = []
    n_frames = 0

    dev_keys = ("features", "gt_depth", "seg") + wire.WIRE_KEYS

    def _prepare(batch):
        dev = {
            k: jax.device_put(v)
            for k, v in batch.items()
            if k in dev_keys
        }
        return batch, dev

    t_start = time.perf_counter()
    t_first_done = None
    frames_first = 0
    for batch, dev_batch in prefetch_iter(loader, prefetch, _prepare):
        rows = test_step(params, dev_batch)
        rows = {k: np.asarray(v) for k, v in rows.items()}
        valid = batch["valid"].astype(bool)
        for k in rows:
            rows[k] = rows[k][valid]
        all_rows.append(rows)
        idxs = batch["index"][valid]
        names.extend(loader.frames.name(int(i)) for i in idxs)
        n_frames += int(valid.sum())
        if t_first_done is None:
            # the first batch absorbs the test-step compile (~80 s for
            # the flagship through the axon tunnel) — mark it so small
            # splits can also report a steady-state rate
            t_first_done = time.perf_counter()
            frames_first = n_frames
    wall = time.perf_counter() - t_start

    keys = all_rows[0].keys()
    cat = {k: np.concatenate([r[k] for r in all_rows]) for k in keys}

    cap0, cap1 = (int(c) for c in cfg.data.max_distances[:2])
    rain = np.array(["rain" in n for n in names])
    rmse0 = cat[f"rmse_{cap0}"]
    report: Dict[str, float] = {}
    for k, v in cat.items():
        if not k.startswith("n_"):
            report[k] = float(np.nanmean(v))
    report["rmse_edge"] = float(np.nanmean(rmse0[rain])) if rain.any() else float("nan")
    report["rmse_sunny"] = (
        float(np.nanmean(rmse0[~rain])) if (~rain).any() else float("nan")
    )
    report["frames"] = float(n_frames)
    if time_inference:
        report["wall_s"] = wall
        report["time_per_frame_s"] = wall / max(1, n_frames)
        report["frames_per_sec_end_to_end"] = n_frames / wall
        steady_frames = n_frames - frames_first
        if t_first_done is not None and steady_frames > 0:
            # rate excluding the compile-bearing first batch: what a
            # long split (or a warm server) sustains end-to-end
            steady_wall = wall - (t_first_done - t_start)
            if steady_wall > 0:
                report["frames_per_sec_steady"] = steady_frames / steady_wall
                report["time_per_frame_steady_s"] = (
                    steady_wall / steady_frames
                )
    return report


def format_report(cfg: ExperimentConfig, report: Dict[str, float]) -> str:
    """Reference report structure (runner.py:494-519): both cap blocks open
    with the (identical) mean inference time, then RMSE/MAE/REL; the first
    block additionally carries the sunny/edge split and — when the seg
    branch is supervised — IoU (printed under the first cap only,
    runner.py:507-509). Then our true-depth north-star caps."""
    cap0, cap1 = (int(c) for c in cfg.data.max_distances[:2])
    lines = [f"==== max depth {cap0} ===="]
    if "time_per_frame_s" in report:
        lines.append(f"inference time: {report['time_per_frame_s']:.6f} s")
    lines += [
        f"RMSE: {report[f'rmse_{cap0}']:.4f} m (inverse space)",
        f"sunny RMSE:       {report['rmse_sunny']:.4f} m",
        f"edge (rain) RMSE: {report['rmse_edge']:.4f} m",
        f"MAE:  {report[f'mae_{cap0}']:.4f} m",
        f"REL:  {report[f'rel_{cap0}']:.4f}",
    ]
    if "iou" in report:
        lines.append(f"IoU: {report['iou']:.4f}")
    lines.append(f"==== max depth {cap1} ====")
    if "time_per_frame_s" in report:
        lines.append(f"inference time: {report['time_per_frame_s']:.6f} s")
    lines += [
        f"RMSE: {report[f'rmse_{cap1}']:.4f} m",
        f"MAE:  {report[f'mae_{cap1}']:.4f} m",
        f"REL:  {report[f'rel_{cap1}']:.4f}",
        "==== true-depth caps (north star) ====",
    ]
    for cap in (50, 70, 80):
        if f"true_rmse_{cap}" in report:
            lines.append(
                f"cap {cap} m: RMSE {report[f'true_rmse_{cap}']:.4f} "
                f"MAE {report[f'true_mae_{cap}']:.4f} "
                f"REL {report[f'true_rel_{cap}']:.4f}"
            )
    if "frames_per_sec_end_to_end" in report:
        lines.append(
            f"frames: {int(report['frames'])}  end-to-end "
            f"{report['frames_per_sec_end_to_end']:.2f} fps"
        )
    return "\n".join(lines)
