"""Loss parity tests against PyTorch oracles (loss_funcs.py semantics)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from camradepth_tpu.train import losses


def _rand_depth_pair(seed=0, shape=(2, 32, 48)):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(0, 1, shape).astype(np.float32)
    target = rng.uniform(0, 1, shape).astype(np.float32)
    target *= rng.uniform(size=shape) > 0.6  # sparsify
    return pred, target


class TestMaskedDepthLosses:
    def test_smooth_l1(self):
        pred, target = _rand_depth_pair()
        got = float(losses.masked_smooth_l1(jnp.asarray(pred), jnp.asarray(target)))
        p, t = torch.from_numpy(pred), torch.from_numpy(target)
        m = t > 0
        want = torch.nn.SmoothL1Loss()(p[m], t[m]).item()
        assert abs(got - want) < 1e-6

    def test_mse_and_rmse(self):
        pred, target = _rand_depth_pair(1)
        got = float(losses.masked_mse(jnp.asarray(pred), jnp.asarray(target)))
        p, t = torch.from_numpy(pred), torch.from_numpy(target)
        m = t > 0
        want = ((t[m] - p[m]) ** 2).mean().item()
        assert abs(got - want) < 1e-6
        got_rmse = float(losses.masked_rmse(jnp.asarray(pred), jnp.asarray(target)))
        assert abs(got_rmse - want ** 0.5) < 1e-6

    def test_l1(self):
        pred, target = _rand_depth_pair(2)
        got = float(losses.masked_l1(jnp.asarray(pred), jnp.asarray(target)))
        p, t = torch.from_numpy(pred), torch.from_numpy(target)
        m = t > 0
        want = (t[m] - p[m]).abs().mean().item()
        assert abs(got - want) < 1e-6

    def test_berhu(self):
        pred, target = _rand_depth_pair(3)
        got = float(losses.masked_berhu(jnp.asarray(pred), jnp.asarray(target)))
        # torch oracle of the reference formula (loss_funcs.py:130-154)
        p, t = torch.from_numpy(pred), torch.from_numpy(target)
        m = t > 0
        diff = (t[m] - p[m]).abs()
        delta = 0.2 * diff.max().item()
        part1 = -torch.nn.functional.threshold(-diff, -delta, 0.0)
        part2 = torch.nn.functional.threshold(
            diff ** 2 - delta ** 2, 0.0, -delta ** 2
        ) + delta ** 2
        part2 = part2 / (2.0 * delta)
        want = (part1 + part2).mean().item()
        assert abs(got - want) < 1e-5


class TestFocalLoss:
    def test_scalar_focal_on_mean_ce(self):
        rng = np.random.default_rng(4)
        logits = rng.standard_normal((2, 16, 24, 21)).astype(np.float32)
        target = rng.integers(0, 21, (2, 16, 24)).astype(np.int64)
        target[rng.uniform(size=target.shape) < 0.1] = 255
        got = float(
            losses.masked_focal_ce(jnp.asarray(logits), jnp.asarray(target))
        )
        # torch: CE(ignore_index=255) mean THEN scalar focal transform
        lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
        tt = torch.from_numpy(target)
        ce = torch.nn.CrossEntropyLoss(ignore_index=255)(lt, tt)
        want = ((1 - torch.exp(-ce)) ** 2 * ce).item()
        assert abs(got - want) < 1e-5

    def test_all_ignored(self):
        logits = np.zeros((1, 4, 4, 21), np.float32)
        target = np.full((1, 4, 4), 255, np.int64)
        got = float(
            losses.masked_focal_ce(jnp.asarray(logits), jnp.asarray(target))
        )
        assert np.isfinite(got)


class TestSmoothness:
    def test_matches_torch_formula(self):
        rng = np.random.default_rng(5)
        depth = rng.uniform(0.1, 1, (2, 16, 24, 1)).astype(np.float32)
        img = rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
        got = float(
            losses.smoothness_loss(jnp.asarray(depth), jnp.asarray(img))
        )
        d = torch.from_numpy(depth).permute(0, 3, 1, 2)
        im = torch.from_numpy(img).permute(0, 3, 1, 2)
        dm = d.mean(2, True).mean(3, True)
        dn = d / (dm + 1e-7)
        gdx = (dn[:, :, :, :-1] - dn[:, :, :, 1:]).abs()
        gdy = (dn[:, :, :-1, :] - dn[:, :, 1:, :]).abs()
        gix = (im[:, :, :, :-1] - im[:, :, :, 1:]).abs().mean(1, keepdim=True)
        giy = (im[:, :, :-1, :] - im[:, :, 1:, :]).abs().mean(1, keepdim=True)
        want = ((gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()).item()
        assert abs(got - want) < 1e-6


class TestHuber:
    def test_matches_torch(self):
        pred, target = _rand_depth_pair(7)
        got = float(
            losses.masked_huber(jnp.asarray(pred), jnp.asarray(target))
        )
        p, t = torch.from_numpy(pred), torch.from_numpy(target)
        m = t > 0
        want = torch.nn.HuberLoss()(p[m], t[m]).item()
        assert abs(got - want) < 1e-6
