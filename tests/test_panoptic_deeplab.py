"""Clean-room JAX Panoptic-DeepLab: architecture pin + torch oracle.

The official repo is not vendored (external/needed_repos.txt only lists
its URL) and this machine has no egress, so the checkpoint contract is
pinned three ways:

1. a TORCH MIRROR of the architecture (registration order and module
   layout reconstructed from the upstream repo, documented in
   models/panoptic_deeplab.py) is built HERE in torch, its real
   state_dict() loaded through ``load_torch_panoptic_deeplab``, and the
   JAX forward must match the torch forward — numerics (conv/BN/
   align_corners resize/argmax) oracle-tested end to end;
2. the loader is ORDER+SHAPE based, and a test proves it is totally
   insensitive to key RENAMES (upstream naming drift cannot break it);
3. the parameter table (676 tensors) and every shape are pinned by
   ``param_order`` against the live Flax tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camradepth_tpu.models import panoptic_deeplab as pdl

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


# ---------------------------------------------------------------------------
# Torch mirror (registration order documented in the module docstring)
# ---------------------------------------------------------------------------


def conv_bn(cin, cout, k, stride=1, dilation=1, relu=True, groups=1):
    pad = dilation * (k - 1) // 2
    mods = [
        nn.Conv2d(cin, cout, k, stride=stride, padding=pad,
                  dilation=dilation, groups=groups, bias=False),
        nn.BatchNorm2d(cout),
    ]
    if relu:
        mods.append(nn.ReLU(inplace=True))
    return nn.Sequential(*mods)


def sep_conv(cin, cout, k=5):
    return nn.Sequential(
        conv_bn(cin, cin, k, groups=cin), conv_bn(cin, cout, 1)
    )


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = conv_bn(cin, planes, 1, relu=False)[:2]
        self.conv2 = conv_bn(planes, planes, 3, stride=stride,
                             relu=False)[:2]
        self.conv3 = conv_bn(planes, planes * 4, 1, relu=False)[:2]
        self.downsample = (
            conv_bn(cin, planes * 4, 1, stride=stride, relu=False)[:2]
            if (stride != 1 or cin != planes * 4) else None
        )

    def forward(self, x):
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        out = self.conv3(out)
        sk = x if self.downsample is None else self.downsample(x)
        return F.relu(out + sk)


class ResNet101(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = conv_bn(3, 64, 7, stride=2)
        cin, planes = 64, 64
        for li, n in enumerate((3, 4, 23, 3)):
            blocks = []
            for bi in range(n):
                blocks.append(Bottleneck(
                    cin, planes, stride=(2 if (li and bi == 0) else 1)
                ))
                cin = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
            planes *= 2

    def forward(self, x):
        x = F.max_pool2d(self.stem(x), 3, stride=2, padding=1)
        feats = {}
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
            feats[f"res{li + 2}"] = x
        return feats


class ASPP(nn.Module):
    def __init__(self, cin, cout, rates=(3, 6, 9)):
        super().__init__()
        self.convs = nn.ModuleList(
            [conv_bn(cin, cout, 1)]
            + [conv_bn(cin, cout, 3, dilation=r) for r in rates]
            + [conv_bn(cin, cout, 1)]  # pooling branch conv
        )
        self.project = conv_bn(cout * 5, cout, 1)

    def forward(self, x):
        outs = [m(x) for m in self.convs[:-1]]
        pooled = self.convs[-1](x.mean((2, 3), keepdim=True))
        outs.append(pooled.expand(-1, -1, x.shape[2], x.shape[3]))
        return self.project(torch.cat(outs, 1))


class SingleDecoder(nn.Module):
    def __init__(self, aspp_ch, dec_ch, proj_ch, low_ch=(512, 256)):
        super().__init__()
        self.aspp = ASPP(2048, aspp_ch)
        self.project = nn.ModuleList(
            [conv_bn(lc, pc, 1) for lc, pc in zip(low_ch, proj_ch)]
        )
        self.fuse = nn.ModuleList([
            sep_conv(aspp_ch + proj_ch[0], dec_ch),
            sep_conv(dec_ch + proj_ch[1], dec_ch),
        ])

    def forward(self, res5, lows):
        x = self.aspp(res5)
        for proj, fuse, low in zip(self.project, self.fuse, lows):
            low = proj(low)
            x = F.interpolate(x, size=low.shape[2:], mode="bilinear",
                              align_corners=True)
            x = fuse(torch.cat([x, low], 1))
        return x


class Head(nn.Module):
    def __init__(self, cin, head_ch, nout):
        super().__init__()
        self.head_conv = sep_conv(cin, head_ch)
        self.predictor = nn.Conv2d(head_ch, nout, 1, bias=True)

    def forward(self, x):
        return self.predictor(self.head_conv(x))


class TorchPDL(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = ResNet101()
        self.semantic_decoder = SingleDecoder(256, 256, (64, 32))
        self.semantic_head = Head(256, 256, pdl.NUM_CLASSES)
        self.instance_decoder = SingleDecoder(256, 128, (32, 16))
        self.center_head = Head(128, 32, 1)
        self.offset_head = Head(128, 32, 2)

    def forward(self, x):
        feats = self.backbone(x)
        lows = [feats["res3"], feats["res2"]]
        sem = self.semantic_decoder(feats["res5"], lows)
        ins = self.instance_decoder(feats["res5"], lows)
        return {
            "semantic": self.semantic_head(sem),
            "center": self.center_head(ins),
            "offset": self.offset_head(ins),
        }


def _randomized_state(model, seed=0):
    """Non-degenerate random weights incl. BN running stats."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif v.ndim == 4:
            sd[k] = torch.randn(v.shape, generator=g) * (
                1.5 / max(1, v.shape[1] * v.shape[2] * v.shape[3]) ** 0.5
            )
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
    model.load_state_dict(sd)
    return model


@pytest.fixture(scope="module")
def torch_model():
    m = TorchPDL()
    _randomized_state(m)
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_params(torch_model):
    return pdl.load_torch_panoptic_deeplab(torch_model.state_dict())


def test_param_table_is_pinned():
    order = pdl.param_order()
    assert len(order) == 676
    model = pdl.PanopticDeepLab()
    want = jax.eval_shape(
        lambda k: model.init(
            {"params": k}, jnp.zeros((1, 65, 129, 3), jnp.float32)
        )["params"],
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    from flax import traverse_util

    assert {p for p, _ in order} == set(traverse_util.flatten_dict(want))


def test_jax_matches_torch_mirror(torch_model, flax_params):
    """End-to-end numeric oracle: the same (random, BN-stats-bearing)
    state dict through torch and through the order+shape loader into
    JAX must produce the same semantic/center/offset maps — pins conv
    padding/strides, eval BN, align_corners resize, and the loader's
    OIHW->HWIO / depthwise transposes in one assertion."""
    h, w = pdl._pad_hw(56, 95)  # 65x129, odd like the real pad rule
    rng = np.random.default_rng(3)
    img = rng.uniform(-2, 2, (1, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch_model(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    model = pdl.PanopticDeepLab()
    out = jax.jit(
        lambda p, x: model.apply({"params": p}, x)
    )(flax_params, jnp.asarray(img))
    for key in ("semantic", "center", "offset"):
        want = t[key].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(out[key]), want, rtol=1e-4, atol=1e-4,
            err_msg=key,
        )


def test_loader_is_key_name_insensitive(torch_model, flax_params):
    """Upstream module names are reconstructed best-effort; the loader
    must not depend on them. Renaming EVERY key leaves the loaded tree
    bit-identical (order + shape grammar only)."""
    sd = torch_model.state_dict()
    renamed = {f"m.{i}.x": v for i, (k, v) in enumerate(sd.items())
               if not k.endswith("num_batches_tracked")}
    p2 = pdl.load_torch_panoptic_deeplab(renamed)
    a = jax.tree.leaves(flax_params)
    b = jax.tree.leaves(p2)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_loader_rejects_wrong_architecture(torch_model):
    sd = dict(torch_model.state_dict())
    sd.pop(next(iter(sd)))
    with pytest.raises(ValueError, match="tensors"):
        pdl.load_torch_panoptic_deeplab(sd)


def test_classmap_contract_and_vehicle_stage(torch_model, flax_params,
                                             tmp_path):
    """The dataprep contract end to end: uint8 RGB frame -> estimator
    -> cityscapes trainIds at the INPUT geometry (pad cropped away),
    agreeing with the torch mirror's argmax; then the two cityscapes
    remaps produce the artifact formats."""
    import cv2

    from camradepth_tpu.dataprep import stages
    from camradepth_tpu.models.panoptic_deeplab import classmap_fn

    rng = np.random.default_rng(5)
    im = rng.integers(0, 255, (56, 95, 3), np.uint8)
    est = classmap_fn(flax_params)
    cls = est(im)
    assert cls.shape == (56, 95) and cls.dtype == np.int64
    assert cls.min() >= 0 and cls.max() < pdl.NUM_CLASSES

    # torch mirror oracle for the full pad->normalize->argmax path
    ph, pw = pdl._pad_hw(56, 95)
    canvas = np.empty((ph, pw, 3), np.float32)
    canvas[:] = np.asarray(pdl.MEAN, np.float32)
    canvas[:56, :95] = im
    x = (canvas - np.asarray(pdl.MEAN, np.float32)) / np.asarray(
        pdl.STD, np.float32
    )
    with torch.no_grad():
        logits = torch_model(
            torch.from_numpy(x.transpose(2, 0, 1)[None])
        )["semantic"]
        logits = F.interpolate(logits, size=(ph, pw), mode="bilinear",
                               align_corners=True)
        want = logits[0].argmax(0).numpy()[:56, :95]
    agree = (cls == want).mean()
    assert agree > 0.999, f"classmap agreement {agree:.4f}"

    # artifact stage: vehicle mask + 21-class remap from cityscapes ids
    d = tmp_path
    cv2.imwrite(str(d / "00000_im.jpg"), im[..., ::-1])
    stages.semantic_seg_artifact(d, 0, est, remap="vehicle_cityscapes")
    veh = np.load(d / "00000_mseg.npy")
    assert veh.dtype == bool and veh.shape == (56, 95)
    stages.semantic_seg_artifact(d, 0, est, remap="cityscapes")
    merged = np.load(d / "00000_mseg.npy")
    assert set(np.unique(merged)) <= (set(range(21)) | {255})
    # spot the mapping: car (13) -> 18, road (0) -> 4
    re_cls = est(cv2.imread(str(d / "00000_im.jpg"))[..., ::-1])
    assert (merged[re_cls == 13] == 18).all()
    assert (merged[re_cls == 0] == 4).all()
