"""Model construction / forward-shape tests (reference shape contract:
CamRaDepth.py:99-170 comments and SURVEY.md §3.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.config import ModelConfig, tiny_test_config
from camradepth_tpu.models.camradepth import CamRaDepth


def _init_and_run(cfg, batch=1, deterministic=True):
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    x = jnp.zeros((batch, h, w, cfg.model.input_channels), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        deterministic=True,
    )
    out = model.apply(
        variables, x, deterministic=deterministic,
        rngs=None if deterministic else {"dropout": jax.random.PRNGKey(2)},
    )
    return variables, out


class TestForwardShapes:
    def test_base_variant(self):
        cfg = tiny_test_config()
        _, out = _init_and_run(cfg)
        h, w = cfg.model.img_size
        assert out["depth"]["final_depth"].shape == (1, h, w, 1)
        d3 = out["depth"]["intermediate_depths"][2]
        d4 = out["depth"]["intermediate_depths"][3]
        assert d3.shape == (1, h // 4, w // 4, 1)
        assert d4.shape == (1, h // 2, w // 2, 1)
        assert out["seg"]["final_seg"] is None
        assert out["seg"]["unsup_map"] is None

    def test_sup_unsup_variant(self):
        cfg = tiny_test_config()
        cfg = cfg.replace(
            model=ModelConfig(
                **{
                    **{f.name: getattr(cfg.model, f.name)
                       for f in cfg.model.__dataclass_fields__.values()},
                    "supervised_seg": True,
                    "unsupervised_seg": True,
                }
            )
        )
        _, out = _init_and_run(cfg)
        h, w = cfg.model.img_size
        assert out["seg"]["final_seg"].shape == (1, h, w, 21)
        assert out["seg"]["intermediate_seg"].shape == (1, h // 2, w // 2, 21)
        assert out["seg"]["unsup_map"].shape == (1, h, w, 1)

    def test_rgb_only_variant(self):
        cfg = tiny_test_config()
        model_kw = {f.name: getattr(cfg.model, f.name)
                    for f in cfg.model.__dataclass_fields__.values()}
        model_kw["input_channels"] = 3
        cfg = cfg.replace(model=ModelConfig(**model_kw))
        _, out = _init_and_run(cfg)
        assert out["depth"]["final_depth"].shape[-1] == 1

    def test_dropout_changes_output_in_train_mode(self):
        cfg = tiny_test_config()
        model = CamRaDepth(cfg.model)
        h, w = cfg.model.img_size
        x = jnp.ones((1, h, w, cfg.model.input_channels), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, x, deterministic=True
        )
        out_det = model.apply(variables, x, deterministic=True)
        out_a = model.apply(
            variables, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert not np.allclose(
            out_det["depth"]["final_depth"], out_a["depth"]["final_depth"]
        )
