"""Dataprep stage tests on the synthetic FakeNuscenes world."""

import numpy as np
import pytest

from camradepth_tpu.dataprep import lidar_fusion, radar_fusion, stages
from camradepth_tpu.geometry import se3
from tests.fake_nuscenes import CAM_K, FakeNuscenes


@pytest.fixture(scope="module")
def world():
    return FakeNuscenes(n_scenes=2, samples_per_scene=10, rain_scene_idx=1)


class TestSceneSplit:
    def test_split_excludes_edges_and_rain(self, world):
        split = stages.build_scene_split(world, mini=True)
        all_idx = split["all"]
        assert all_idx  # interior moving frames survive
        # first/last two samples of each scene excluded
        assert 0 not in all_idx and 1 not in all_idx
        # rain scene (scene-1) never lands in clear-day split
        rain_samples = {
            i for i, s in enumerate(world.sample)
            if s["scene_token"] == "scene-1"
        }
        assert not (set(all_idx) & rain_samples)
        assert set(split["all"]) == set(
            split["train"] + split["val"] + split["test"]
        )

    def test_split_json_roundtrip(self, world, tmp_path):
        split = stages.build_scene_split(world, mini=True)
        p = tmp_path / "data_split.json"
        stages.save_scene_split(split, p)
        loaded = stages.load_scene_split(p)
        assert loaded["all"] == split["all"]


class TestCameraMatrices:
    def test_k_and_transform(self, world):
        split = stages.build_scene_split(world, mini=True)
        idx = split["all"][0]
        m = stages.camera_matrices(world, idx)
        np.testing.assert_allclose(m["K"], CAM_K)
        # cam3 is later than cam2 and the ego drives +x, so the cam3->cam2
        # transform must translate along the camera's +z (forward) ... the
        # translation magnitude equals ego motion between the two frames.
        T = m["T"]
        assert T.shape == (4, 4)
        assert np.linalg.norm(T[:3, 3]) > 0.01


class TestRadarFusion:
    def test_merge_and_artifacts(self, world):
        split = stages.build_scene_split(world, mini=True)
        idx = split["all"][0]
        merged = radar_fusion.merge_radar_sweeps(world, idx, (0, 4))
        assert merged is not None
        assert merged["valid"].any()
        art = radar_fusion.radar_artifacts(world, idx, CAM_K, (0, 4))
        assert art["radar"].shape == (416, 800, 3)
        assert art["rad_vel"].shape == (416, 800)
        depth = art["radar"][..., 0]
        assert (depth > 0).sum() > 0
        assert depth.max() <= 95  # points sampled below 90 m + fov mask
        # uv zero where no radar return
        assert np.all(art["radar"][..., 1][depth == 0] == 0)


class TestLidarFusion:
    def test_tracks_interpolate(self, world):
        split = stages.build_scene_split(world, mini=True)
        idx = split["all"][0]
        tracks = lidar_fusion.tracks_for_scene(world, idx)
        sample = world.sample[idx]
        key_tok = sample["data"]["LIDAR_TOP"]
        assert key_tok in tracks
        assert len(tracks[key_tok]) == 2  # two instances
        # intermediate sweep token present with interpolated pose
        inter_tok = world.get("sample_data", key_tok)["next"]
        assert inter_tok in tracks
        inst = next(iter(tracks[inter_tok]))
        key_t = np.asarray(tracks[key_tok][inst]["translation"])
        inter_t = np.asarray(tracks[inter_tok][inst]["translation"])
        # moving box advanced between key frame and first sweep OR static
        assert inter_t.shape == (3,)

    def test_gt_artifacts_shapes(self, world):
        split = stages.build_scene_split(world, mini=True)
        idx = split["all"][0]
        tracks = lidar_fusion.tracks_for_scene(world, idx)
        flow_im = np.zeros((416, 800, 2), np.float32)
        seg = np.zeros((416, 800), bool)
        art = lidar_fusion.gt_artifacts(
            world, idx, tracks, CAM_K, flow_im, seg
        )
        assert art["gt"].shape == (416, 800, 3)
        assert art["msk_lh"].shape == (416, 800)
        assert (art["gt"][..., 0] > 0).sum() > 50  # accumulated density

    def test_flow_occlusion_filter(self):
        depth = np.ones((4, 4))
        low_h = np.ones((4, 4), bool)
        in_box = np.zeros((4, 4), bool)
        flow_l = np.zeros((4, 4, 2))
        flow_l[0, 0] = [5.0, 0.0]  # disagrees with image flow by 5 px
        flow_im = np.zeros((4, 4, 2))
        d2, lh2, _, fl2 = lidar_fusion.filter_occlusion_by_flow(
            depth, low_h, in_box, flow_l, flow_im, thres=3.0
        )
        assert d2[0, 0] == 0 and d2[1, 1] == 1
        assert not lh2[0, 0]
        assert np.all(fl2[0, 0] == 0)

    def test_bbox_occlusion_filter(self):
        depth = np.full((10, 10), 50.0)
        seg = np.zeros((10, 10), bool)
        seg[2:5, 2:5] = True
        in_box = np.zeros((10, 10), bool)
        # one box whose in-FOV corners span rows/cols 2..5 with max corner
        # depth 20 -> seg pixels at depth 50 inside the rect die
        x_cn = np.array([2.0, 2.0, 5.0, 5.0, 2.0, 5.0, 2.0, 5.0])
        y_cn = np.array([2.0, 5.0, 2.0, 5.0, 2.0, 5.0, 5.0, 2.0])
        d_cn = np.full(8, 20.0)
        m_cn = np.ones(8, bool)
        d2, _ = lidar_fusion.filter_occlusion_by_bbox(
            depth, seg, in_box, x_cn, y_cn, d_cn, m_cn,
            downsample_scale=1.0, y_cutoff=0, h_im=10, w_im=10,
        )
        assert d2[3, 3] == 0.0       # seg & behind box -> dropped
        assert d2[1, 1] == 50.0      # outside rect -> kept
        assert d2[6, 6] == 50.0      # inside rect but not seg -> kept


class TestSegRemap:
    def test_label_tables(self):
        assert len(stages.MSEG_CLASSES) == 194
        assert len(stages.KEPT_CLASSES) == 56
        assert len(stages.MERGED_CLASSES) == 21

    def test_merged_remap_values(self):
        # 'car' universal id maps to merged class 18 ('car' position)
        uni = np.array(
            [stages.MSEG_CLASSES.index("car"),
             stages.MSEG_CLASSES.index("sky"),
             stages.MSEG_CLASSES.index("banana")]
        )
        merged = stages.mseg_to_training_labels(uni)
        keys = list(stages.MERGED_CLASSES)
        assert merged[0] == keys.index("car")
        assert merged[1] == keys.index("sky")
        assert merged[2] == stages.IGNORE_LABEL

    def test_vehicle_mask_includes_trucks(self):
        uni = np.array(
            [stages.MSEG_CLASSES.index("car"),
             stages.MSEG_CLASSES.index("truck"),
             stages.MSEG_CLASSES.index("sky")]
        )
        m = stages.vehicle_mask(uni)
        assert m.tolist() == [True, True, False]


class TestRadarFilter:
    def test_threshold(self):
        radar = np.zeros((4, 4, 3))
        gt = np.zeros((4, 4, 3))
        radar[0, 0, 0] = 10.0
        gt[0, 0, 0] = 200.0  # diff 190 > 100 -> dropped
        radar[1, 1, 0] = 30.0
        gt[1, 1, 0] = 50.0  # diff 20 <= 100 -> kept
        out = stages.filter_radar_by_lidar(radar, gt)
        assert out[0, 0] == 0.0
        assert out[1, 1] == 30.0


class TestQuatSlerp:
    def test_against_scipy(self):
        from scipy.spatial.transform import Rotation, Slerp

        rng = np.random.default_rng(0)
        q0 = rng.standard_normal(4)
        q1 = rng.standard_normal(4)
        q0 /= np.linalg.norm(q0)
        q1 /= np.linalg.norm(q1)
        for amt in (0.0, 0.3, 0.7, 1.0):
            got = se3.quat_slerp(q0, q1, amt)
            r = Slerp(
                [0, 1],
                Rotation.from_quat(
                    [[q0[1], q0[2], q0[3], q0[0]],
                     [q1[1], q1[2], q1[3], q1[0]]]
                ),
            )(amt)
            want = r.as_quat()  # xyzw
            want = np.array([want[3], want[0], want[1], want[2]])
            if np.dot(got, want) < 0:
                want = -want
            np.testing.assert_allclose(got, want, atol=1e-9)
