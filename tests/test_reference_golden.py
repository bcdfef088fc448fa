"""Golden parity against the REAL reference model.

All other parity tests use tests/torch_mirror.py — a clean-room torch
reimplementation. If the mirror and the Flax model shared one misreading of
the reference, those tests would pass while both diverge from
/root/reference/src/models/CamRaDepth.py. Here the ground truth is the
reference's own code (imported via interop.reference_loader with a stubbed
args singleton): its real state_dict flows through the interop converter
into the Flax model, and the SAME state_dict into the mirror, closing the
triangle reference == mirror == flax.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from camradepth_tpu.config import ModelConfig  # noqa: E402
from camradepth_tpu.interop.reference_loader import (  # noqa: E402
    load_reference_model,
    reference_available,
)
from camradepth_tpu.interop.torch_convert import convert_state_dict  # noqa: E402
from camradepth_tpu.models.camradepth import CamRaDepth  # noqa: E402
from camradepth_tpu.utils.checkpoint import partial_restore_params  # noqa: E402
from tests.torch_mirror import MirrorCamRaDepth  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

HW = (64, 128)
DIMS = (16, 32, 32, 64)
DEPTHS = (1, 1, 1, 1)
FF = (2, 2, 2, 2)


def _model_cfg(**over):
    # mid_channels MUST be 128: hardcoded upstream (CamRaDepth.py:37)
    kw = dict(
        img_size=HW, dims=DIMS, heads=(1, 2, 4, 8), ff_expansion=FF,
        sr_ratios=(8, 4, 2, 1), depths=DEPTHS, mid_channels=128,
        input_channels=7, groupnorm_divisor=16, drop_path_rate=0.0,
        compute_dtype="float32", use_pallas_attention=False,
    )
    kw.update(over)
    return ModelConfig(**kw)


def _reference(**over):
    kw = dict(
        img_size=HW, heads=(1, 2, 4, 8), ff_expansion=FF,
        reduction_ratio=(8, 4, 2, 1), depths=DEPTHS, dims=DIMS,
        input_channels=7,
    )
    kw.update(over)
    torch.manual_seed(7)
    return load_reference_model(**kw)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


class TestReferenceGolden:
    def test_mirror_matches_reference_base(self):
        """The torch mirror must agree with the real reference bit-near-
        exactly when fed the reference's own weights (same framework, same
        ops — this validates the mirror as an oracle)."""
        ref = _reference()
        cfg = _model_cfg()
        mirror = MirrorCamRaDepth(cfg).eval()
        missing = mirror.load_state_dict(ref.state_dict(), strict=True)
        assert not missing.missing_keys and not missing.unexpected_keys
        x = np.random.default_rng(0).standard_normal(
            (1, HW[0], HW[1], 7)
        ).astype(np.float32)
        with torch.no_grad():
            r = ref(_nchw(x))
            m = mirror(_nchw(x))
        np.testing.assert_allclose(
            m["depth"]["final_depth"].numpy(),
            r["depth"]["final_depth"].numpy(),
            rtol=1e-5, atol=1e-6,
        )
        for i in (2, 3):
            np.testing.assert_allclose(
                m["depth"]["intermediate_depths"][i].numpy(),
                r["depth"]["intermediate_depths"][i].numpy(),
                rtol=1e-5, atol=1e-6,
            )

    def test_mirror_matches_reference_seg(self):
        ref = _reference(supervised_seg=True, unsupervised_seg=True)
        cfg = _model_cfg(supervised_seg=True, unsupervised_seg=True)
        mirror = MirrorCamRaDepth(cfg).eval()
        missing = mirror.load_state_dict(ref.state_dict(), strict=True)
        assert not missing.missing_keys and not missing.unexpected_keys
        x = np.random.default_rng(1).standard_normal(
            (1, HW[0], HW[1], 7)
        ).astype(np.float32)
        with torch.no_grad():
            r = ref(_nchw(x))
            m = mirror(_nchw(x))
        # Pins the reference quirk: intermediate_seg is ALWAYS None
        # upstream (CamRaDepth.py:171) so the runner's loss_seg_inter is 0
        # in every reference run — cfg.train.seg_inter_loss defaults False
        # to match.
        assert r["seg"]["intermediate_seg"] is None
        np.testing.assert_allclose(
            m["seg"]["final_seg"].numpy(),
            r["seg"]["final_seg"].numpy(),
            rtol=1e-5, atol=5e-6,
        )
        np.testing.assert_allclose(
            m["depth"]["final_depth"].numpy(),
            r["depth"]["final_depth"].numpy(),
            rtol=1e-5, atol=5e-6,
        )
        np.testing.assert_allclose(
            m["seg"]["unsup_map"].numpy(),
            r["seg"]["unsup_map"].numpy(),
            rtol=1e-5, atol=5e-6,
        )

    def test_flax_matches_reference_base(self):
        """Reference weights -> interop converter -> Flax model: forward
        parity against the reference's own outputs (fp32)."""
        ref = _reference()
        cfg = _model_cfg()
        jx = CamRaDepth(cfg)
        x = np.random.default_rng(2).standard_normal(
            (1, HW[0], HW[1], 7)
        ).astype(np.float32)
        variables = jx.init(
            {"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
            deterministic=True,
        )
        converted = convert_state_dict(ref.state_dict())
        params, mismatches = partial_restore_params(
            converted, variables["params"], verbose=False
        )
        assert not mismatches, f"unconverted reference keys: {mismatches[:5]}"
        with torch.no_grad():
            r = ref(_nchw(x))
        j = jx.apply({"params": params}, jnp.asarray(x), deterministic=True)
        want = r["depth"]["final_depth"].permute(0, 2, 3, 1).numpy()
        got = np.asarray(j["depth"]["final_depth"])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
        for i in (2, 3):
            want_i = (
                r["depth"]["intermediate_depths"][i]
                .permute(0, 2, 3, 1)
                .numpy()
            )
            got_i = np.asarray(j["depth"]["intermediate_depths"][i])
            np.testing.assert_allclose(got_i, want_i, rtol=1e-3, atol=2e-4)
