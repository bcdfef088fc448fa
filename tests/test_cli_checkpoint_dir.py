"""--checkpoint <run-dir>: every consumer command picks the BEST
(lowest-val-loss) checkpoint out of a training run dir, matching the
reference's best-ckpt convention (runner.py:366-373) — no more copying
ckpt_epoch_... paths by hand."""

import contextlib
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu import cli
from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.utils import checkpoint as ck


def test_load_params_from_run_dir_picks_best(tmp_path):
    cfg = tiny_test_config()
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    # two checkpoints with DIFFERENT first-kernel contents: the best
    # (lowest loss) is epoch 1, not the latest
    marked = jax.tree.map(lambda x: x, params)
    first = jax.tree.leaves(marked)[0]
    ck.save_checkpoint(tmp_path, {"params": params}, epoch=0,
                       eval_loss=0.25)
    worse = jax.tree.map(lambda x: x + 1.0, params)
    ck.save_checkpoint(tmp_path, {"params": worse}, epoch=1,
                       eval_loss=0.75)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _, loaded = cli._load_params(cfg, str(tmp_path))
    assert "using best checkpoint ckpt_epoch_1" in buf.getvalue()
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(loaded)[0]), np.asarray(first)
    )

    # an empty dir is a clean user error
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(cli.UserError, match="no ckpt_epoch_"):
        cli._load_params(cfg, str(empty))
