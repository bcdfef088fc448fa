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
