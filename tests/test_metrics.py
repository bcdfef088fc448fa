"""Evaluation-metric parity vs a torch oracle of the reference test math
(runner.py:442-492), including the inverse-space REL and band-2 quirks."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from camradepth_tpu.evaluation import metrics as M


def _torch_reference_metrics(pred_n, gt_n, max_depth=100.0, caps=(100.0, 50.0)):
    """Oracle reproducing the per-frame test-mode computation."""
    pred = torch.clip(torch.from_numpy(pred_n), 0, 1) * max_depth
    gt = torch.from_numpy(gt_n) * max_depth
    out = []
    gt = gt.clone()
    gt[gt > caps[0]] = 0
    idx = torch.where(gt > 0)
    if len(idx[0]) == 0:
        return [(np.nan,) * 3] * 2
    err = pred[idx] - gt[idx]
    rel = torch.abs(err) / gt[idx]
    mae = torch.nn.L1Loss()(pred[idx], gt[idx]).item()
    rmse = torch.sqrt(torch.nn.MSELoss()(pred[idx], gt[idx])).item()
    out.append((mae, rmse, (rel.sum() / len(rel)).item()))
    gt[gt < caps[1]] = 0
    idx = torch.where(gt > 0)
    if len(idx[0]) == 0:
        out.append((np.nan,) * 3)
        return out
    err = pred[idx] - gt[idx]
    rel = torch.abs(err) / gt[idx]
    mae = torch.nn.L1Loss()(pred[idx], gt[idx]).item()
    rmse = torch.sqrt(torch.nn.MSELoss()(pred[idx], gt[idx])).item()
    out.append((mae, rmse, (rel.sum() / len(rel)).item()))
    return out


class TestInverseMetrics:
    def test_matches_reference_oracle(self):
        rng = np.random.default_rng(0)
        b, h, w = 3, 24, 32
        pred = rng.uniform(-0.1, 1.1, (b, h, w)).astype(np.float32)
        gt = rng.uniform(0, 1, (b, h, w)).astype(np.float32)
        gt *= rng.uniform(size=gt.shape) > 0.5
        rows = M.depth_metrics_inverse(jnp.asarray(pred), jnp.asarray(gt))
        for i in range(b):
            (mae0, rmse0, rel0), (mae1, rmse1, rel1) = _torch_reference_metrics(
                pred[i], gt[i]
            )
            assert abs(float(rows["mae_100"][i]) - mae0) < 1e-4
            assert abs(float(rows["rmse_100"][i]) - rmse0) < 1e-4
            assert abs(float(rows["rel_100"][i]) - rel0) < 1e-4
            assert abs(float(rows["mae_50"][i]) - mae1) < 1e-4
            assert abs(float(rows["rmse_50"][i]) - rmse1) < 1e-4
            assert abs(float(rows["rel_50"][i]) - rel1) < 1e-4

    def test_empty_frame_is_nan(self):
        pred = np.zeros((1, 8, 8), np.float32)
        gt = np.zeros((1, 8, 8), np.float32)
        rows = M.depth_metrics_inverse(jnp.asarray(pred), jnp.asarray(gt))
        assert np.isnan(float(rows["rmse_100"][0]))

    def test_band2_keeps_near_field(self):
        """gt<50 (inverse) zeroed => band 2 keeps inverse>=50, i.e. TRUE
        depth <= 50 m."""
        pred = np.full((1, 2, 2), 0.5, np.float32)
        gt = np.array([[[0.6, 0.3], [0.0, 0.9]]], np.float32)  # inv meters 60,30,-,90
        rows = M.depth_metrics_inverse(jnp.asarray(pred), jnp.asarray(gt))
        # band2 valid: inverse 60 and 90 (= true depths 40, 10 m)
        assert int(rows["n_50"][0]) == 2


class TestTrueDepthMetrics:
    def test_cap_masks_far_field(self):
        pred = np.full((1, 2, 2), (100 - 40) / 100, np.float32)  # pred 40 m
        gt_d = np.array([[[30.0, 60.0], [85.0, 0.0]]], np.float32)
        gt_inv = np.where(gt_d > 0, (100 - gt_d) / 100, 0).astype(np.float32)
        rows = M.depth_metrics_true(jnp.asarray(pred), jnp.asarray(gt_inv),
                                    caps=(50.0, 70.0, 80.0))
        # cap 50: only the 30 m pixel -> MAE 10
        assert abs(float(rows["true_mae_50"][0]) - 10.0) < 1e-4
        # cap 70: 30 and 60 -> MAE (10+20)/2
        assert abs(float(rows["true_mae_70"][0]) - 15.0) < 1e-4


class TestJaccard:
    def test_matches_torchmetrics_style_macro_iou(self):
        rng = np.random.default_rng(1)
        b, h, w, c = 2, 16, 16, 5
        logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
        target = rng.integers(0, c, (b, h, w)).astype(np.int32)
        target[0, :2, :2] = 255
        got = np.asarray(
            M.jaccard_index(jnp.asarray(logits), jnp.asarray(target), c)
        )
        pred = logits.argmax(-1)
        for i in range(b):
            v = target[i] != 255
            p, t = pred[i][v], target[i][v]
            ious = []
            for k in range(c):
                tp = ((p == k) & (t == k)).sum()
                fp = ((p == k) & (t != k)).sum()
                fn = ((p != k) & (t == k)).sum()
                if tp + fp + fn > 0:
                    ious.append(tp / (tp + fp + fn))
            assert abs(got[i] - np.mean(ious)) < 1e-5
