"""validate_split / cli validate-data: the artifact-contract checker.

The reference builds split tables by zipping independently-globbed
sorted lists (create_a_split_file.py:40-67); one missing artifact
shifts every later row's columns. These tests build a small valid
prepared dir, then corrupt it in each contract-breaking way.
"""

import numpy as np
import pytest

from camradepth_tpu.cli import main as cli_main
from camradepth_tpu.data.split import (
    ARTIFACT_SUFFIXES,
    build_split_from_dir,
    validate_split,
)

H, W = 32, 64


def _write_frame(d, i, mseg_h=None):
    try:
        import cv2
    except ImportError:  # pragma: no cover
        cv2 = None
    stem = f"{i:05d}"
    if cv2 is not None:
        cv2.imwrite(str(d / f"{stem}_im.jpg"),
                    np.zeros((H, W, 3), np.uint8))
    else:
        (d / f"{stem}_im.jpg").write_bytes(b"\xff\xd8\xff\xd9")
    np.save(d / f"{stem}_radar.npy", np.zeros((H, W, 3), np.float32))
    np.save(d / f"{stem}_radar_filtered.npy", np.zeros((H, W), np.float32))
    np.save(d / f"{stem}_mseg.npy",
            np.zeros((mseg_h or H, W), np.int64))
    np.save(d / f"{stem}_im_uv.npy", np.zeros((H, W, 2), np.float32))
    np.save(d / f"{stem}_rad_vel.npy", np.zeros((H, W), np.float32))
    np.save(d / f"{stem}_gt.npy", np.zeros((H, W, 3), np.float64))


@pytest.fixture()
def prepared(tmp_path):
    for i in range(3):
        _write_frame(tmp_path, i, mseg_h=H + 4 if i == 1 else None)
    return tmp_path


class TestValidateSplit:
    def test_valid_dir_passes(self, prepared):
        rows = build_split_from_dir(prepared)
        r = validate_split(rows, image_dimension=(H, W))
        assert r["ok"], r["errors"]
        assert r["checked"] == 3

    def test_missing_file_and_shift(self, prepared):
        rows = build_split_from_dir(prepared)
        # delete frame 1's radar: a rebuilt sorted-glob table would
        # zip frame 2's radar into frame 1's row
        (prepared / "00001_radar.npy").unlink()
        r = validate_split(rows, image_dimension=(H, W))
        assert not r["ok"]
        assert any("missing file" in m for _, m in r["errors"])
        shifted = np.array(
            [list(row) for row in rows[:2]], dtype=object
        )
        shifted[1, 1] = str(prepared / "00002_radar.npy")
        r2 = validate_split(shifted, image_dimension=(H, W))
        assert any("misaligned row" in m for _, m in r2["errors"])

    def test_wrong_shape_dtype_and_negative_gt(self, prepared):
        np.save(prepared / "00000_radar.npy",
                np.zeros((H, W), np.float32))  # rank
        np.save(prepared / "00002_mseg.npy",
                np.zeros((H, W), np.float32))  # dtype kind
        np.save(prepared / "00001_gt.npy",
                -np.ones((H, W, 3), np.float64))  # negative depth
        rows = build_split_from_dir(prepared)
        r = validate_split(rows, image_dimension=(H, W))
        msgs = " | ".join(m for _, m in r["errors"])
        assert "expected ndim 3" in msgs
        assert "dtype" in msgs
        assert "negative depth" in msgs

    def test_limit(self, prepared):
        rows = build_split_from_dir(prepared)
        (prepared / "00002_gt.npy").unlink()
        r = validate_split(rows, image_dimension=(H, W), limit=2)
        assert r["ok"] and r["checked"] == 2


class TestValidateDataCLI:
    def test_cli_ok_and_fail(self, prepared, capsys):
        rc = cli_main(["validate-data", "--data-dir", str(prepared),
                       "--image-dimension", f"{H},{W}"])
        out = capsys.readouterr().out
        assert rc == 0 and "OK" in out
        np.save(prepared / "00000_rad_vel.npy",
                np.zeros((H + 1, W), np.float32))
        rc = cli_main(["validate-data", "--data-dir", str(prepared),
                       "--image-dimension", f"{H},{W}"])
        out = capsys.readouterr().out
        assert rc == 1 and "errors" in out

    def test_cli_requires_one_source(self, capsys):
        rc = cli_main(["validate-data"])
        assert rc == 2


class TestMeshDeviceOrder:
    """create_mesh: CPU meshes and explicit device subsets keep the
    deterministic linear order (the topology-aware mesh_utils path is
    TPU-multi-chip only)."""

    def test_cpu_mesh_linear_order(self):
        import jax

        from camradepth_tpu.config import MeshConfig
        from camradepth_tpu.parallel.mesh import create_mesh

        devs = jax.devices()[:8]
        mesh = create_mesh(
            MeshConfig(data_parallel=4, fsdp_parallel=2), devs
        )
        assert mesh.devices.shape == (4, 2, 1)
        assert [d.id for d in mesh.devices.flat] == [d.id for d in devs]
        # implicit full device set on CPU: same linear order
        mesh2 = create_mesh(MeshConfig(data_parallel=-1))
        n = len(jax.devices())
        assert mesh2.devices.shape == (n, 1, 1)
        assert [d.id for d in mesh2.devices.flat] == [
            d.id for d in jax.devices()
        ]
