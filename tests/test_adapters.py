"""TorchScript external-net adapters (dataprep components #15/#18).

Real RAFT / Panoptic-DeepLab weights are not available in this
environment, so the adapters are interface-tested with randomly
initialized scripted stand-ins exercising the exact contracts the
reference uses (scripts/cal_flow.py:26-93, scripts/semantic_seg.py:
89-171): RAFT's 0..255 float input + /8 padding + iterate-list output,
and a [1,C,H,W]-logits semantic head.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from camradepth_tpu.dataprep.adapters import (  # noqa: E402
    make_flow_estimator,
    make_seg_estimator,
    raft_flow_from_torchscript,
    seg_classmap_from_torchscript,
)


class TinyRaft(torch.nn.Module):
    """RAFT-shaped stand-in: returns a list of flow iterates at input
    resolution, asserts the /8-padded RAFT input convention."""

    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(6, 2, 3, padding=1)

    def forward(self, image1, image2, iters: int = 12):
        assert image1.shape[-1] % 8 == 0 and image1.shape[-2] % 8 == 0
        x = torch.cat([image1, image2], dim=1) / 255.0
        flow = self.conv(x)
        return [flow * 0.5, flow]


class TinySegHead(torch.nn.Module):
    def __init__(self, classes: int = 194):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, classes, 3, padding=1)

    def forward(self, x):
        return self.conv(x)


@pytest.fixture()
def raft_ckpt(tmp_path):
    path = tmp_path / "raft.ts"
    torch.jit.script(TinyRaft()).save(str(path))
    return path


@pytest.fixture()
def seg_ckpt(tmp_path):
    path = tmp_path / "seg.ts"
    torch.jit.script(TinySegHead()).save(str(path))
    return path


def test_raft_adapter_contract(raft_ckpt):
    est = raft_flow_from_torchscript(raft_ckpt)
    rng = np.random.RandomState(0)
    # 30x50 is not a multiple of 8 -> exercises the pad/unpad path.
    im1 = rng.randint(0, 255, (30, 50, 3), dtype=np.uint8)
    im2 = rng.randint(0, 255, (30, 50, 3), dtype=np.uint8)
    flow = est(im1, im2)
    assert flow.shape == (30, 50, 2)
    assert flow.dtype == np.float32
    # Last iterate wins: the stand-in returns [0.5*f, f].
    flow2 = est(im1, im2)
    np.testing.assert_array_equal(flow, flow2)


def test_seg_adapter_contract(seg_ckpt):
    est = seg_classmap_from_torchscript(seg_ckpt)
    rng = np.random.RandomState(1)
    im = rng.randint(0, 255, (33, 47, 3), dtype=np.uint8)
    cls = est(im)
    assert cls.shape == (33, 47)
    assert cls.dtype == np.int64
    assert cls.min() >= 0 and cls.max() < 194


def test_factories(raft_ckpt, seg_ckpt):
    assert make_flow_estimator("none") is None
    assert make_seg_estimator("none") is None
    est = make_flow_estimator("raft", ckpt=str(raft_ckpt))
    assert est is not None
    est = make_seg_estimator("torchscript", ckpt=str(seg_ckpt))
    assert est is not None
    with pytest.raises(ValueError, match="flow-ckpt"):
        make_flow_estimator("raft")
    with pytest.raises(ValueError, match="seg-ckpt"):
        make_seg_estimator("torchscript")


def test_adapter_feeds_pipeline_stage(tmp_path, raft_ckpt, seg_ckpt):
    """compute_flow / semantic_seg_artifact run end-to-end through the
    TorchScript adapters, producing the reference-format artifacts."""
    import cv2

    from camradepth_tpu.dataprep import stages

    rng = np.random.RandomState(2)
    cv2.imwrite(str(tmp_path / "00000_im.jpg"),
                rng.randint(0, 255, (32, 48, 3), dtype=np.uint8))
    cv2.imwrite(str(tmp_path / "00000_im_next.jpg"),
                rng.randint(0, 255, (32, 48, 3), dtype=np.uint8))
    est = raft_flow_from_torchscript(raft_ckpt)
    stages.compute_flow(tmp_path, 0, est)
    flow = np.load(tmp_path / "00000_flow.npy")
    assert flow.shape == (32, 48, 2)

    seg_est = seg_classmap_from_torchscript(seg_ckpt)
    stages.semantic_seg_artifact(tmp_path, 0, seg_est)
    seg = np.load(tmp_path / "00000_mseg.npy")
    assert seg.shape == (32, 48)
