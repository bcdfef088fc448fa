"""Full product-lifecycle integration through the REAL CLI.

One chain, all through ``cli.main`` — proving the 11-stage artifact
contract end-to-end the way a user would drive it (reference:
scripts/preprocess_data.sh + runner.py lifecycle):

  prep  (LK flow + TorchScript seg stand-in over FakeNuscenes with
         real 900x1600 camera jpgs -> the full artifact directory)
  train (2 optimizer steps at the artifact resolution, best-ckpt saved)
  test  (metric report over the test split)
  export (reference-format .pth)
  re-import the exported .pth and assert forward equality with the
  Orbax checkpoint it came from.
"""

import contextlib
import dataclasses
import io
import sys
import types
import unittest.mock as mock
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from camradepth_tpu import cli  # noqa: E402
from camradepth_tpu.config import (  # noqa: E402
    DataConfig,
    TrainConfig,
    tiny_test_config,
)
from tests.fake_nuscenes import FakeNuscenes  # noqa: E402


class _TinySegHead(torch.nn.Module):
    def __init__(self, classes: int = 194):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, classes, 3, padding=1)

    def forward(self, x):
        return self.conv(x)


@pytest.fixture(scope="module")
def prep_dir(tmp_path_factory):
    """Run `camradepth prep` (real cmd_prep) over the fake world."""
    root = tmp_path_factory.mktemp("lifecycle")
    # 8 samples/scene -> 5 usable frames/scene after the split drops the
    # scene-edge frames; 10 total = 4 train + 2 val + 4 test
    world = FakeNuscenes(n_scenes=2, samples_per_scene=8,
                         image_root=root / "nuscenes")
    seg_ckpt = root / "seg.ts"
    torch.jit.script(_TinySegHead()).save(str(seg_ckpt))

    # stand-in for the absent nuscenes-devkit: cmd_prep only constructs
    # NuScenes(version, dataroot=..., verbose=...) and hands it to the
    # pipeline, which uses the devkit record surface FakeNuscenes provides
    nusc_pkg = types.ModuleType("nuscenes")
    nusc_mod = types.ModuleType("nuscenes.nuscenes")
    nusc_mod.NuScenes = lambda version, dataroot=None, verbose=False: world
    nusc_pkg.nuscenes = nusc_mod

    out = root / "prepared_data"
    with mock.patch.dict(
        sys.modules, {"nuscenes": nusc_pkg, "nuscenes.nuscenes": nusc_mod}
    ):
        rc = cli.main([
            "prep",
            "--data-root", str(root / "nuscenes"),
            "--out", str(out),
            "--mini",
            "--flow", "lk",
            "--seg", "torchscript", "--seg-ckpt", str(seg_ckpt),
        ])
    assert rc == 0
    table = np.load(out / "split.npy")
    assert table.shape[1] == 7 and table.shape[0] >= 6
    # The prep phase above proved the REAL 416x800 artifact contract
    # end-to-end (a full-resolution train/test pass was also validated
    # manually once: ~20 TFLOP per optimizer step makes it a >1 h CPU
    # test). For the recurring suite the remaining phases run on a
    # faithful 128x256 rescale of every artifact — same files, same
    # channel semantics, 10x less compute.
    small = _downscale_artifacts(out, (128, 256))
    table = np.load(small / "split.npy")
    return small, table.shape[0]


def _downscale_artifacts(out: Path, hw) -> Path:
    import cv2

    from camradepth_tpu.data.split import build_split_from_dir

    h, w = hw
    small = out.parent / "prepared_small"
    small.mkdir(exist_ok=True)
    for src in sorted(out.iterdir()):
        dst = small / src.name
        if src.suffix == ".jpg":
            img = cv2.imread(str(src))
            cv2.imwrite(str(dst), cv2.resize(
                img, (w, h), interpolation=cv2.INTER_NEAREST))
        elif src.suffix == ".npy" and src.name[5] == "_":
            a = np.load(src)
            scaled = cv2.resize(
                a.astype(np.float32), (w, h),
                interpolation=cv2.INTER_NEAREST,
            )
            if a.ndim == 3 and scaled.ndim == 2:
                scaled = scaled[..., None]
            np.save(dst, scaled.astype(a.dtype))
        elif src.suffix == ".npz":
            import shutil

            shutil.copyfile(src, dst)
    table = build_split_from_dir(small)
    np.save(small / "split.npy", table)
    return small


def _lifecycle_cfg(prep_dir, tmp_path, n_train=4, n_val=2):
    out, n = prep_dir
    cfg = tiny_test_config()
    from camradepth_tpu.config import ModelConfig

    model_kw = {f: getattr(cfg.model, f)
                for f in cfg.model.__dataclass_fields__}
    model_kw["img_size"] = (128, 256)
    data = DataConfig(
        image_dimension=(128, 256),
        split_path=str(out / "split.npy"),
        train_val_split=(n_train, n_val),
        num_workers=2,
    )
    train = TrainConfig(
        batch_size=2, desired_batch_size=2, num_steps=None, num_epochs=1,
        learning_rate=5e-4, output_dir=str(tmp_path / "Output"),
        save_model=True, stop_after=10,
    )
    return cfg.replace(model=ModelConfig(**model_kw), data=data,
                       train=train)


def test_prep_train_test_export_reimport(prep_dir, tmp_path):
    cfg = _lifecycle_cfg(prep_dir, tmp_path)

    # -- train (2 optimizer steps over 4 frames, saves best ckpt) -------
    with mock.patch.object(cli, "_build_config", lambda a: cfg):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(["train", "--preset", "base"])
    assert rc == 0, buf.getvalue()[-2000:]
    assert "best val loss" in buf.getvalue()

    ckpts = sorted(Path(cfg.train.output_dir).rglob("ckpt_*"))
    assert ckpts, "training saved no checkpoint"
    ckpt = str(ckpts[-1])

    # -- test (metric report over the remaining frames) -----------------
    report_json = tmp_path / "report.json"
    with mock.patch.object(cli, "_build_config", lambda a: cfg):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "test", "--preset", "base", "--checkpoint", ckpt,
                "--test-batch", "2",
                "--report-json", str(report_json),
            ])
    report = buf.getvalue()
    assert rc == 0, report[-2000:]
    assert "RMSE" in report and "MAE" in report
    import json

    parsed = json.loads(report_json.read_text())
    assert any("rmse" in k.lower() for k in parsed)

    # -- export to the reference .pth format ----------------------------
    pth = tmp_path / "exported.pth"
    with mock.patch.object(cli, "_build_config", lambda a: cfg):
        rc = cli.main([
            "export", "--preset", "base", "--checkpoint", ckpt,
            "--out", str(pth),
        ])
    assert rc == 0 and pth.is_file()

    # -- re-import the exported .pth: forward must match exactly --------
    model, params_orbax = cli._load_params(cfg, ckpt)
    _, params_pth = cli._load_params(cfg, str(pth))
    h, w = cfg.model.img_size
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, h, w, cfg.model.input_channels)
        ).astype(np.float32)
    )
    fwd = jax.jit(
        lambda p: model.apply({"params": p}, x, deterministic=True)[
            "depth"
        ]["final_depth"]
    )
    np.testing.assert_allclose(
        np.asarray(fwd(params_orbax)), np.asarray(fwd(params_pth)),
        rtol=0, atol=0,
    )
