"""End-to-end dataprep -> dataloader -> model integration on the synthetic
world: run the offline pipeline, build the split table, load a batch
through the training input pipeline and feed the model."""

import numpy as np
import pytest

import cv2

from camradepth_tpu.config import DataConfig, tiny_test_config
from camradepth_tpu.data.pipeline import make_loaders
from camradepth_tpu.dataprep import stages
from camradepth_tpu.dataprep.pipeline import run_pipeline
from tests.fake_nuscenes import FakeNuscenes


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    world = FakeNuscenes(n_scenes=2, samples_per_scene=10)
    out = tmp_path_factory.mktemp("prepared_data")
    split = stages.build_scene_split(world, mini=True)
    stages.save_scene_split(split, out / "data_split.json")
    rng = np.random.default_rng(0)
    # synthesize the stages that need real images / external nets
    for idx in split["all"]:
        img = rng.integers(0, 255, (416, 800, 3)).astype(np.uint8)
        cv2.imwrite(str(out / f"{idx:05d}_im.jpg"), img)
        cv2.imwrite(str(out / f"{idx:05d}_im_next.jpg"), img)
        np.save(out / f"{idx:05d}_flow.npy",
                rng.normal(0, 1, (416, 800, 2)).astype(np.float32))
        seg = rng.integers(0, 21, (416, 800)).astype(np.int64)
        np.save(out / f"{idx:05d}_mseg.npy", seg)
    run_pipeline(
        world, out,
        stage_names=("matrices", "uv", "gt", "radar", "filter",
                     "split_file"),
        progress=False,
    )
    return world, out, split


class TestPipeline:
    def test_artifact_contract(self, prepared):
        world, out, split = prepared
        idx = split["all"][0]
        for suffix in ("_matrix.npz", "_im_uv.npy", "_gt.npy",
                       "_msk_lh.npy", "_radar.npy", "_rad_vel.npy",
                       "_radar_filtered.npy"):
            assert (out / f"{idx:05d}{suffix}").exists(), suffix
        gt = np.load(out / f"{idx:05d}_gt.npy")
        assert gt.shape == (416, 800, 3)
        radar = np.load(out / f"{idx:05d}_radar.npy")
        assert radar.shape == (416, 800, 3)
        table = np.load(out / "split.npy")
        assert table.shape[1] == 7
        assert table.shape[0] == len(split["all"])

    def test_loader_and_model_consume_prepared_data(self, prepared):
        world, out, split = prepared
        n = len(split["all"])
        from camradepth_tpu.config import ModelConfig

        cfg = tiny_test_config()
        model_kw = {f: getattr(cfg.model, f)
                    for f in cfg.model.__dataclass_fields__}
        model_kw["img_size"] = (416, 800)
        cfg = cfg.replace(model=ModelConfig(**model_kw))
        data = DataConfig(
            image_dimension=(416, 800),
            split_path=str(out / "split.npy"),
            train_val_split=(n, 0),
            num_workers=2,
        )
        loaders = make_loaders(data, batch_size=2)
        batch = next(iter(loaders["train"]))
        assert batch["features"].shape == (2, 416, 800, 7)
        assert np.isfinite(batch["features"]).all()
        # radar + gt channels are plausible (sparse, in [0,1])
        assert 0 <= batch["gt_depth"].max() <= 1.0

        import jax
        import jax.numpy as jnp
        from camradepth_tpu.models.camradepth import CamRaDepth

        model = CamRaDepth(cfg.model)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(batch["features"]), deterministic=True,
        )
        out_d = model.apply(
            variables, jnp.asarray(batch["features"]), deterministic=True
        )
        assert out_d["depth"]["final_depth"].shape == (2, 416, 800, 1)
