"""diffGradNorm optax transform vs a PyTorch oracle of the published math
(AdaNorm WACV'23 norm correction + diffGrad friction; reference formulas at
diffGradNorm.py:81-110)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from camradepth_tpu.train.diffgrad import diffgrad_norm


class _TorchOracle:
    """Minimal torch implementation of the same update rule, written from
    the published equations (not imported from the reference)."""

    def __init__(self, params, lr, betas=(0.9, 0.999), eps=1e-8):
        self.params = params
        self.lr = lr
        self.b1, self.b2 = betas
        self.eps = eps
        self.state = {
            i: {
                "step": 0,
                "m": torch.zeros_like(p),
                "v": torch.zeros_like(p),
                "prev": torch.zeros_like(p),
                "egn": torch.tensor(0.0),
            }
            for i, p in enumerate(params)
        }

    def step(self, grads):
        import math

        for i, (p, g) in enumerate(zip(self.params, grads)):
            s = self.state[i]
            s["step"] += 1
            gn = torch.linalg.norm(g)
            egn = 0.95 * s["egn"] + 0.05 * gn
            g1 = g * egn / (gn + 1e-8) if egn > gn else g
            s["egn"] = egn.clone()
            s["m"].mul_(self.b1).add_(g1, alpha=1 - self.b1)
            s["v"].mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
            denom = s["v"].sqrt().add_(self.eps)
            bc1 = 1 - self.b1 ** s["step"]
            bc2 = 1 - self.b2 ** s["step"]
            dfc = 1.0 / (1.0 + torch.exp(-(s["prev"] - g).abs()))
            s["prev"] = g.clone()
            step_size = self.lr * math.sqrt(bc2) / (bc1 + 1e-8)
            p.data.addcdiv_(s["m"] * dfc, denom, value=-step_size)


class TestDiffGradNorm:
    def test_matches_torch_oracle_over_steps(self):
        rng = np.random.default_rng(0)
        shapes = [(4, 5), (7,), (2, 3, 3)]
        params_np = [rng.standard_normal(s).astype(np.float32) for s in shapes]
        lr = 1e-2

        # torch side
        tparams = [torch.from_numpy(p.copy()) for p in params_np]
        oracle = _TorchOracle(tparams, lr)

        # jax side
        jparams = {f"p{i}": jnp.asarray(p) for i, p in enumerate(params_np)}
        tx = diffgrad_norm(lr)
        opt_state = tx.init(jparams)

        for step in range(5):
            grads_np = [
                rng.standard_normal(s).astype(np.float32) * (0.5 + step)
                for s in shapes
            ]
            oracle.step([torch.from_numpy(g.copy()) for g in grads_np])
            jgrads = {f"p{i}": jnp.asarray(g) for i, g in enumerate(grads_np)}
            updates, opt_state = tx.update(jgrads, opt_state, jparams)
            jparams = optax.apply_updates(jparams, updates)

        for i in range(len(shapes)):
            np.testing.assert_allclose(
                np.asarray(jparams[f"p{i}"]),
                tparams[i].numpy(),
                rtol=1e-5,
                atol=1e-6,
            )

    def test_norm_correction_boosts_small_gradients(self):
        """After a large-norm step, a small-norm gradient must be scaled up
        toward the EMA norm."""
        p = {"w": jnp.ones((4,))}
        tx = diffgrad_norm(1.0)
        st = tx.init(p)
        big = {"w": jnp.full((4,), 10.0)}
        _, st = tx.update(big, st, p)
        small = {"w": jnp.full((4,), 1e-4)}
        upd, st2 = tx.update(small, st, p)
        # exp_grad_norm EMA after big step ~ 0.05*20=1.0; small grad norm
        # 2e-4 << EMA -> corrected grad scaled by egn/gn >> 1.
        inner = st2[0] if isinstance(st2, tuple) else st2
        assert float(jax.tree.leaves(upd)[0][0]) != 0.0


class TestOneCycle:
    def test_matches_torch_onecycle(self):
        torch_opt = torch.optim.SGD([torch.zeros(1, requires_grad=True)], lr=1.0)
        total = 40
        sched_t = torch.optim.lr_scheduler.OneCycleLR(
            torch_opt, max_lr=6e-5, total_steps=total, div_factor=2,
            pct_start=0.15,
        )
        from camradepth_tpu.train.schedule import onecycle

        sched_j = onecycle(6e-5, total, pct_start=0.15, div_factor=2.0)
        torch_lrs = []
        for i in range(total):
            torch_lrs.append(torch_opt.param_groups[0]["lr"])
            torch_opt.step()
            sched_t.step()
        jax_lrs = [float(sched_j(i)) for i in range(total)]
        np.testing.assert_allclose(jax_lrs, torch_lrs, rtol=1e-5, atol=1e-12)
