"""Hyperparameter search + profiling utility tests."""

import numpy as np

import jax.numpy as jnp

from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.train.search import (
    apply_overrides,
    random_search,
    sample_config,
    successive_halving_search,
)
from camradepth_tpu.utils.profiling import StepTimer, flops_estimate, trace


class TestSearch:
    SPACES = {
        "learning_rate": ([1e-5, 1e-3], "log"),
        "batch_size": ([1, 3], "int"),
        "pct_start": ([0.05, 0.3], "float"),
        "model.drop_path_rate": ([0.0, 0.1, 0.2], "item"),
    }

    def test_sample_modes(self):
        rng = np.random.default_rng(0)
        s = sample_config(self.SPACES, rng)
        assert 1e-5 <= s["learning_rate"] <= 1e-3
        assert s["batch_size"] in (1, 2)
        assert 0.05 <= s["pct_start"] <= 0.3
        assert s["model.drop_path_rate"] in (0.0, 0.1, 0.2)

    def test_apply_overrides_routes_trees(self):
        cfg = tiny_test_config()
        # keep desired_batch_size a multiple of batch_size
        cfg = apply_overrides(
            cfg,
            {"learning_rate": 1e-4, "batch_size": 2,
             "desired_batch_size": 2, "model.drop_path_rate": 0.2},
        )
        assert cfg.train.learning_rate == 1e-4
        assert cfg.model.drop_path_rate == 0.2

    def test_random_search_with_stub_runner(self):
        cfg = tiny_test_config()
        calls = []

        def runner(c):
            calls.append(c)
            return abs(c.train.learning_rate - 3e-4)

        spaces = {"learning_rate": ([1e-5, 1e-3], "log")}
        best, best_loss, results = random_search(
            cfg, spaces, num_trials=8, seed=1, trial_runner=runner
        )
        assert len(results) == 8
        assert best_loss == min(r["val_loss"] for r in results)
        assert best["learning_rate"] > 0

    def test_successive_halving_prunes_budget(self):
        """9 trials, eta=3: rung budgets 10/30/90 over 9/3/1 trials =
        9*10 + 3*30 + 1*90 = 270 steps vs 9*90 = 810 for full-budget
        random search; the best config must be the true argmin."""
        cfg = tiny_test_config()
        spent = []

        def runner(c):
            spent.append(c.train.num_steps)
            return abs(c.train.learning_rate - 3e-4)

        spaces = {"learning_rate": ([1e-5, 1e-3], "log")}
        best, best_loss, results = successive_halving_search(
            cfg, spaces, num_trials=9, min_steps=10, max_steps=90,
            eta=3, seed=1, trial_runner=runner,
        )
        assert sum(spent) == 9 * 10 + 3 * 30 + 1 * 90
        assert len(results) == 13
        # survivors of each rung are the rung's best third
        rung0 = [r for r in results if r["rung"] == 0]
        rung1_set = {
            tuple(r["overrides"].items()) for r in results
            if r["rung"] == 1
        }
        top3 = sorted(rung0, key=lambda r: r["val_loss"])[:3]
        assert {tuple(r["overrides"].items()) for r in top3} == rung1_set
        # deterministic runner: the winner is the global best config
        assert best_loss == min(r["val_loss"] for r in results)
        assert abs(best["learning_rate"] - 3e-4) == best_loss


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(warmup=1)
        for _ in range(4):
            t.start()
            t.stop(jnp.ones(()))
        s = t.summary()
        assert s["steps"] == 3
        assert s["steps_per_sec"] > 0

    def test_flops_estimate(self):
        f = flops_estimate(lambda a, b: a @ b, jnp.ones((64, 64)),
                           jnp.ones((64, 64)))
        assert f is None or f > 0

    def test_trace_noop(self, tmp_path):
        with trace(str(tmp_path), enabled=False):
            pass
        with trace(str(tmp_path), enabled=True):
            _ = jnp.ones((8, 8)).sum()


class TestMetricWriter:
    def test_scalars_jsonl_and_tb(self, tmp_path):
        import json

        from camradepth_tpu.utils.logging import MetricWriter, create_run_dir

        run = create_run_dir(tmp_path, "Arch", "run")
        assert run.name == "1"
        run2 = create_run_dir(tmp_path, "Arch", "run")
        assert run2.name == "2"  # auto-indexed like the reference

        w = MetricWriter(run)
        w.scalar("loss", 0.5, 1)
        w.scalars({"a": 1.0, "b": 2.0}, 2, prefix="train/")
        w.close()
        lines = [json.loads(l) for l in
                 (run / "metrics.jsonl").read_text().splitlines()]
        assert lines[0]["tag"] == "loss" and lines[0]["value"] == 0.5
        assert {l["tag"] for l in lines} == {"loss", "train/a", "train/b"}
        assert list(run.glob("events.out.tfevents.*"))  # TB events written


class TestSearchCLI:
    def test_search_subcommand_wiring(self, monkeypatch, capsys):
        """`camradepth search` routes flags into random_search: trial-step
        budget lands in cfg.train.num_steps, --space JSON becomes typed
        spaces (working replacement for the reference's TODO stub,
        runner.py:521-565)."""
        from camradepth_tpu import cli
        from camradepth_tpu.train import search as search_mod

        seen = {}

        def fake(cfg, spaces, num_trials=0, seed=0):
            seen.update(cfg=cfg, spaces=spaces, num_trials=num_trials)
            return (
                {"learning_rate": 1e-4},
                0.5,
                [{"overrides": {"learning_rate": 1e-4}, "val_loss": 0.5}],
            )

        monkeypatch.setattr(search_mod, "random_search", fake)
        rc = cli.main([
            "search", "--preset", "base", "--num-trials", "3",
            "--trial-steps", "7",
            "--space", '{"learning_rate": [[1e-5, 1e-3], "log"]}',
        ])
        assert rc == 0
        assert seen["num_trials"] == 3
        assert seen["cfg"].train.num_steps == 7
        assert seen["cfg"].train.save_model is False
        assert seen["spaces"] == {"learning_rate": ((1e-5, 1e-3), "log")}
        assert "best config" in capsys.readouterr().out


class TestVmapSearchCLI:
    def test_vmap_trials_subcommand_wiring(self, monkeypatch, capsys):
        """`camradepth search --vmap-trials` stacks loader microbatches
        into [update_interval, B, ...] optimizer batches (order
        preserved, non-batch keys dropped), extracts one val batch, and
        hands everything to vmapped_trials."""
        from camradepth_tpu import cli
        from camradepth_tpu.data import pipeline as pipe_mod
        from camradepth_tpu.train import search as search_mod

        h, w = 8, 16

        def fake_batch(i):
            return {
                "features": np.full((2, h, w, 7), float(i), np.float32),
                "gt_depth": np.ones((2, h, w), np.float32),
                "token": np.zeros((2,), np.int64),  # must be dropped
            }

        fake_loaders = {
            "train": [fake_batch(i) for i in range(7)],
            "val": [fake_batch(99)],
        }
        monkeypatch.setattr(pipe_mod, "make_loaders",
                            lambda *a, **k: fake_loaders)

        seen = {}

        def fake_vmapped(cfg, spaces, num_trials=0, num_steps=0, seed=0,
                         batches=None, val_batch=None, loaders=None,
                         mesh=None):
            # the CLI passes loaders (the shared _resolve_batches does
            # the stacking — the CLI-side copy was deleted); resolve
            # here so the stacking semantics stay pinned end to end
            batches, val_batch = search_mod._resolve_batches(
                batches, val_batch, loaders, cfg.train.update_interval
            )
            seen.update(cfg=cfg, num_trials=num_trials, batches=batches,
                        val_batch=val_batch, mesh=mesh)
            return ({"learning_rate": 1e-4}, 0.25,
                    [{"overrides": {"learning_rate": 1e-4},
                      "val_loss": 0.25, "steps": num_steps}])

        monkeypatch.setattr(search_mod, "vmapped_trials", fake_vmapped)

        rc = cli.main([
            "search", "--preset", "base", "--vmap-trials",
            "--num-trials", "4", "--trial-steps", "5",
            "--train-val-split", "5,2",
        ])
        assert rc == 0
        assert seen["num_trials"] == 4
        assert seen["cfg"].data.train_val_split == (5, 2)
        accum = seen["cfg"].train.update_interval
        assert len(seen["batches"]) == 7 // accum
        b0 = seen["batches"][0]
        assert set(b0) <= {"features", "gt_depth", "seg", "seg_inter"}
        assert b0["features"].shape == (accum, 2, h, w, 7)
        if accum >= 2:  # microbatch order preserved within a stack
            np.testing.assert_array_equal(
                b0["features"][1], np.full((2, h, w, 7), 1.0))
        assert seen["val_batch"]["features"].shape == (2, h, w, 7)
        assert seen["mesh"] is None
        assert "best config" in capsys.readouterr().out

        # --data-parallel N < device count must build the mesh over the
        # FIRST N devices (regression: passing all 8 devices to a
        # 4x1x1 mesh raised "does not match 8 devices" and exited 2)
        rc = cli.main([
            "search", "--preset", "base", "--vmap-trials",
            "--num-trials", "4", "--trial-steps", "5",
            "--train-val-split", "5,2", "--data-parallel", "4",
        ])
        assert rc == 0
        assert seen["mesh"] is not None
        assert seen["mesh"].shape["data"] == 4


class TestVmappedTrials:
    """One-program concurrent trials (train/search.py vmapped_trials).

    The trials train a 2-conv toy depth model injected via the
    ``model`` hook: XLA:CPU takes ~10 minutes to compile the vmapped
    FLAGSHIP step (measured; on TPU it is the usual one-off compile),
    and everything these tests pin — hyperparameter sampling, the
    normalized OneCycle shape, scan accumulation, coupled L2, vmap
    ranking, trial-axis sharding parity — is model-independent. The
    flagship train step itself is covered by test_trainer/test_step.
    """

    class _ToyDepth:
        """Built lazily (flax import inside) — emits the multitask_loss
        prediction contract from two convs."""

        def __new__(cls):
            import flax.linen as nn

            class Toy(nn.Module):
                @nn.compact
                def __call__(self, x, deterministic=True):
                    h = nn.gelu(nn.Conv(8, (3, 3), name="feat")(x))
                    # head keeps 4 output channels: JAX's conv vmap
                    # batching rule (trial axis -> feature groups)
                    # rejects 1-output-channel convs
                    d = nn.sigmoid(nn.Conv(4, (1, 1), name="head")(h))
                    d = d.mean(-1, keepdims=True)
                    return {
                        "depth": {
                            "final_depth": d,
                            "intermediate_depths": [
                                None, None,
                                d[:, ::4, ::4, :], d[:, ::2, ::2, :],
                            ],
                        },
                        "seg": {"final_seg": None,
                                "intermediate_seg": None,
                                "unsup_map": None},
                    }

            return Toy()

    def _batches(self, rng, n=2, accum=1, bs=2, hw=(64, 128)):
        h, w = hw
        return [
            {
                "features": rng.standard_normal(
                    (accum, bs, h, w, 7)).astype(np.float32),
                "gt_depth": np.abs(
                    rng.standard_normal((accum, bs, h, w))
                ).astype(np.float32) * 0.1,
            }
            for _ in range(n)
        ]

    def test_rejects_non_optimizer_spaces(self):
        import pytest

        from camradepth_tpu.train.search import vmapped_trials

        with pytest.raises(ValueError, match="optimizer"):
            vmapped_trials(
                tiny_test_config(),
                {"batch_size": ([1, 3], "int")},
                batches=[],
            )

    def test_loaders_fallback(self):
        """vmapped_trials(loaders=<make_loaders dict>) groups the
        loader's [B, ...] microbatches into [update_interval, B, ...]
        optimizer stacks and draws a val batch from the dict's val
        loader (regression: this path crashed on dict attribute access
        and, with an attribute object, fed un-stacked batches whose
        batch dim was consumed as the accumulation axis)."""
        from camradepth_tpu.train.search import vmapped_trials

        cfg = tiny_test_config()
        accum = cfg.train.update_interval
        assert accum >= 2  # the bug is only visible with stacking
        rng = np.random.default_rng(0)

        def mb():
            return {
                "features": rng.standard_normal(
                    (2, 64, 128, 7)).astype(np.float32),
                "gt_depth": np.abs(rng.standard_normal(
                    (2, 64, 128))).astype(np.float32) * 0.1,
                "valid": np.ones((2,), np.float32),  # dropped
            }

        loaders = {"train": [mb() for _ in range(2 * accum)],
                   "val": [mb()]}
        _, best_loss, seq = vmapped_trials(
            cfg, {"learning_rate": ([1e-4, 1e-2], "log")},
            num_trials=2, num_steps=2, seed=0, loaders=loaders,
            model=self._ToyDepth(),
        )
        assert len(seq) == 2
        assert all(np.isfinite(r["val_loss"]) for r in seq)
        assert best_loss == min(r["val_loss"] for r in seq)

    def test_vmap_halving_subcommand_wiring(self, monkeypatch, capsys):
        """`search --vmap-trials --halving` composes the two upgrades:
        the vmapped batch stacks route to vmapped_halving with the
        halving budget flags."""
        from camradepth_tpu import cli
        from camradepth_tpu.data import pipeline as pipe_mod
        from camradepth_tpu.train import search as search_mod

        h, w = 8, 16
        fake_loaders = {
            "train": [
                {
                    "features": np.zeros((2, h, w, 7), np.float32),
                    "gt_depth": np.ones((2, h, w), np.float32),
                }
                for _ in range(6)
            ],
            "val": None,
        }
        monkeypatch.setattr(pipe_mod, "make_loaders",
                            lambda *a, **k: fake_loaders)
        seen = {}

        def fake_halving(cfg, spaces, num_trials=0, min_steps=0,
                         max_steps=0, eta=3, seed=0, batches=None,
                         val_batch=None, loaders=None, mesh=None):
            batches, val_batch = search_mod._resolve_batches(
                batches, val_batch, loaders, cfg.train.update_interval
            )
            seen.update(num_trials=num_trials, min_steps=min_steps,
                        max_steps=max_steps, batches=batches)
            return ({"learning_rate": 1e-4}, 0.5,
                    [{"overrides": {"learning_rate": 1e-4},
                      "val_loss": 0.5, "rung": 0,
                      "steps": min_steps}])

        monkeypatch.setattr(search_mod, "vmapped_halving", fake_halving)
        rc = cli.main([
            "search", "--preset", "base", "--vmap-trials", "--halving",
            "--num-trials", "8", "--min-steps", "3",
            "--trial-steps", "27", "--train-val-split", "5,2",
        ])
        assert rc == 0
        assert seen["num_trials"] == 8
        assert seen["min_steps"] == 3
        assert seen["max_steps"] == 27
        assert seen["batches"]  # loader stacks made it through
        assert "best config" in capsys.readouterr().out

    def test_vmapped_halving_prunes_and_continues(self):
        """Checkpoint-based SHA over the vmapped sweep: every rung
        halves the survivor set (jit retraces for the smaller trial
        axis), survivors continue from their state, and the winner is
        the final rung's best."""
        from camradepth_tpu.train.search import vmapped_halving

        cfg = tiny_test_config()
        spaces = {"learning_rate": ([1e-4, 1e-2], "log"),
                  "weight_decay": ([1e-6, 1e-3], "log")}
        batches = self._batches(np.random.default_rng(4), accum=2)
        best, best_loss, results = vmapped_halving(
            cfg, spaces, num_trials=4, min_steps=2, max_steps=8,
            eta=2, seed=5, batches=batches, model=self._ToyDepth(),
        )
        # rung 0: 4 trials at 2 steps; rung 1: 2 at 4; rung 2: 1 at 8
        by_rung = {}
        for r in results:
            by_rung.setdefault(r["rung"], []).append(r)
        assert {k: len(v) for k, v in by_rung.items()} == {0: 4, 1: 2,
                                                           2: 1}
        assert [v[0]["steps"] for _, v in sorted(by_rung.items())] == \
            [2, 4, 8]
        assert all(np.isfinite(r["val_loss"]) for r in results)
        # survivors of rung r are the best of rung r-1
        r0_sorted = sorted(by_rung[0], key=lambda r: r["val_loss"])
        surv = [r["overrides"] for r in by_rung[1]]
        assert {id(o) for o in surv} == \
            {id(r["overrides"]) for r in r0_sorted[:2]}
        final = by_rung[2][0]
        assert best is final["overrides"]
        assert best_loss == final["val_loss"]

    def test_vmapped_halving_mesh_replication_fallback(self):
        """A rung whose survivor count no longer divides the mesh's
        data axis falls back to replication instead of crashing."""
        import jax
        import pytest

        from camradepth_tpu.config import MeshConfig
        from camradepth_tpu.parallel.mesh import create_mesh
        from camradepth_tpu.train.search import vmapped_halving

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        cfg = tiny_test_config()
        spaces = {"learning_rate": ([1e-4, 1e-2], "log")}
        batches = self._batches(np.random.default_rng(5), accum=2)
        mesh = create_mesh(MeshConfig(data_parallel=2),
                           jax.devices()[:2])
        # 4 -> 2 (divides) -> 1 (replicated rung)
        best, best_loss, results = vmapped_halving(
            cfg, spaces, num_trials=4, min_steps=1, max_steps=4,
            eta=2, seed=6, batches=batches, mesh=mesh,
            model=self._ToyDepth(),
        )
        assert np.isfinite(best_loss)
        assert max(r["rung"] for r in results) == 2

    def test_ranks_and_mesh_parity(self):
        """One unsharded + one trial-axis-sharded run: ranking contract,
        per-trial divergence (different lr/wd must yield different
        losses), and sharded-vs-unsharded parity."""
        import jax
        import pytest

        from camradepth_tpu.config import MeshConfig
        from camradepth_tpu.parallel.mesh import create_mesh
        from camradepth_tpu.train.search import vmapped_trials

        cfg = tiny_test_config()
        spaces = {"learning_rate": ([1e-4, 1e-2], "log"),
                  "weight_decay": ([1e-6, 1e-3], "log")}
        batches = self._batches(np.random.default_rng(2), accum=2)
        kw = dict(num_trials=4, num_steps=3, seed=3, batches=batches,
                  model=self._ToyDepth())
        best, best_loss, seq = vmapped_trials(cfg, spaces, **kw)
        assert len(seq) == 4
        losses = [r["val_loss"] for r in seq]
        assert all(np.isfinite(v) for v in losses)
        assert len(set(losses)) > 1  # hyperparameters actually differ
        assert best_loss == min(losses)
        assert best in [r["overrides"] for r in seq]

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices for the sharded half")
        # Parity is asserted at ONE optimizer step: the sharded and
        # unsharded runs compile DIFFERENT programs (GSPMD-partitioned
        # vs single-device), whose fp32 fusion/reassociation roundoff
        # (~1e-7 on the loss) is then amplified without bound by
        # diffGrad's sign-like update (direction ~ g/|g| elementwise —
        # a 1e-7 gradient perturbation flips near-zero components into
        # O(lr) parameter differences, measured 0.4% after 3 steps).
        # A trial/shard misalignment bug would show up at step 1 as
        # order-unity divergence.
        kw1 = dict(kw, num_steps=1)
        _, _, one = vmapped_trials(cfg, spaces, **kw1)
        mesh = create_mesh(MeshConfig(data_parallel=4), jax.devices()[:4])
        _, _, shd = vmapped_trials(cfg, spaces, mesh=mesh, **kw1)
        np.testing.assert_allclose(
            [r["val_loss"] for r in one],
            [r["val_loss"] for r in shd],
            rtol=1e-5,
        )
