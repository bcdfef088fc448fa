"""Compact wire format: loader -> device batches for the tunneled TPU.

The axon tunnel moves ~44 MB/s host->device (measured, tools/exp_h2d.py).
The dense training payload — bf16 features + f32 GT + int32 seg — is
~61 MB per padded batch-8 step, ~1.4 s of transfer against a 0.37 s
compute step: the sustained 416x800 run (TRAIN_r04.json) was wire-bound
at ~0.5 steps/s even with transfers overlapped. The fix is to ship the
information, not the rasters:

  image_u8    [H,W,3] uint8   the camera jpg bytes as loaded (BGR);
                              ImageNet-normalized on device (f32, the
                              exact host arithmetic)
  radar_idx   [P]     int32   flattened pixel index of every pixel any
  radar_val   [P,R]   f32     radar-derived channel touches; values are
                              post-transform (clip/scale applied host-
                              side per point), scatter-added into zeros
  gt_idx/gt_val [Pg]          inverse-encoded lidar GT, same scheme
  seg/seg_inter       uint8   21-class labels + 255 ignore fit a byte

Decoded on device inside the jitted step (decode_wire_micro), the batch
is bit-identical to the dense assemble_frame stack: point transforms run
host-side in the same f32/f64 numpy arithmetic, image normalization is a
host-built 256-entry LUT gathered on device (XLA's reciprocal-multiply
rewrite of f32 divides is ~1 ulp off numpy — measured, so divides can't
be replayed on device), zeros scatter to zeros, and padding rows (idx 0,
val 0) scatter-ADD 0.0 — exact. One intentional canonicalization: a -0.0 in a source raster is
"not a point" (numpy nonzero semantics), so the decoded map holds +0.0
where the dense path kept -0.0; both are masked as invalid everywhere
downstream. Reference analog: none — the reference feeds dense f32
tensors through PCIe (dataloader.py:197-333); this is the TPU-tunnel
redesign of that boundary.

Payload at the flagship geometry: 8 + ~0.1 + (GT density-dependent,
~2-6) + 3.4 MB ≈ 15-18 MB/step -> ~0.4 s on the tunnel, fully
overlapped with compute by the trainer's prefetcher.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

from camradepth_tpu.config import (
    DataConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from camradepth_tpu.data import channels as ch

WIRE_KEYS = ("image_u8", "radar_idx", "radar_val", "gt_idx", "gt_val")


@dataclasses.dataclass(frozen=True)
class WirePlan:
    """Static per-run wire layout (shapes must be jit-constant)."""

    radar_cap: int          # points per frame, padded
    gt_cap: int             # 0 = GT ships dense f32 (sparse won't pay)
    n_radar_ch: int         # R: channels in the sparse radar group
    # seg label planes ride the wire only when the consuming config
    # reads them (DataConfig.wire_ship_seg*): batch["seg"] feeds the
    # supervised seg loss / IoU only, batch["seg_inter"] only the
    # optional seg_inter_loss — everything else pays pure H2D bytes.
    ship_seg: bool = True
    ship_seg_inter: bool = True


def _roundup(n: int, to: int) -> int:
    return max(to, ((int(n) + to - 1) // to) * to)


def _identity(v):
    return v


def _radar_source_descs(arrays: Dict[str, np.ndarray], cfg: DataConfig):
    """[(source_2d, clip_desc)] for the sparse radar group, in
    assemble_frame's exact channel order; ``clip_desc`` is
    ``(lo, hi, div)`` for ``np.clip(v, lo, hi) / div`` or None for
    identity. One declarative description drives BOTH the numpy path
    (:func:`_radar_sources`) and the native C++ encode."""
    if cfg.filtered_radar:
        # reference hard-codes 100.0 here, not max_depth (dataloader.py)
        return [(arrays["radar_filtered"], (0.0, 100.0, 100.0))]
    radar = arrays["radar"]
    md = float(cfg.max_depth)
    groups = [(radar[..., 0], (0.0, md, md))]
    if cfg.sparse_depth_uv:
        groups += [(radar[..., 1], None), (radar[..., 2], None)]
    if cfg.rad_vel:
        groups.append((arrays["rad_vel"], None))
    return groups


def _radar_sources(arrays: Dict[str, np.ndarray], cfg: DataConfig):
    """[(source_2d, transform_on_point_values)] for the sparse radar
    group, in assemble_frame's exact channel order. Transforms run in
    the source dtype (f32 or f64), matching the dense path's op order
    (transform, then astype(float32) at write time)."""
    out = []
    for s, desc in _radar_source_descs(arrays, cfg):
        if desc is None:
            out.append((s, _identity))
        else:
            lo, hi, div = desc
            out.append(
                (s, lambda v, lo=lo, hi=hi, div=div: np.clip(v, lo, hi) / div)
            )
    return out


def wire_supported(cfg: DataConfig) -> bool:
    """Channel configs the codec covers: the standard radar stack and
    the filtered-radar variant. sparse_lidar (per-epoch random masks)
    and im_uv (a dense flow image) stay on the dense path."""
    return not cfg.sparse_lidar and not cfg.im_uv


def radar_channel_count(cfg: DataConfig) -> int:
    """Number of sparse radar channels the wire codec carries for this
    DataConfig — the cfg-only mirror of ``_radar_sources`` (which needs
    the loaded arrays). Used by consumers that must build a WirePlan
    without a dataset to probe (HTTP serving)."""
    if cfg.filtered_radar:
        return 1
    return 1 + (2 if cfg.sparse_depth_uv else 0) + (1 if cfg.rad_vel else 0)


def plan_wire(
    frames_rows: Sequence, cfg: DataConfig, sample_n: int = 4
) -> Optional[WirePlan]:
    """Probe a few frames and pick static point caps (or None when the
    config is unsupported). Caps carry generous margins (radar 4x + 64,
    GT 1.5x + 1024) because later frames may be denser than the sample;
    an overflow at encode time raises with the cap to set. GT falls
    back to dense whenever sparse wouldn't beat the dense f32 bytes."""
    if not wire_supported(cfg) or len(frames_rows) == 0:
        return None
    from camradepth_tpu.data.pipeline import load_frame_arrays

    h, w = cfg.image_dimension
    max_radar = max_gt = 0
    n_radar_ch = 0
    for i in range(min(sample_n, len(frames_rows))):
        arrays = load_frame_arrays(frames_rows[i], cfg)
        if arrays["image"].dtype != np.uint8 or arrays["image"].shape != (
            h, w, 3,
        ):
            return None
        groups = _radar_sources(arrays, cfg)
        n_radar_ch = len(groups)
        mask = np.zeros((h, w), bool)
        for s, _ in groups:
            if np.asarray(s).shape[:2] != (h, w):
                # same contract encode_frame_wire enforces (and the
                # dense channels.f2d path): a plan must never accept
                # data the encoder will reject mid-epoch
                return None
            mask |= np.asarray(s) != 0
        max_radar = max(max_radar, int(mask.sum()))
        enc = ch.encode_inverse_depth(
            np.asarray(arrays["gt"][..., 0]), cfg.max_depth
        )
        max_gt = max(max_gt, int(np.count_nonzero(enc)))
    radar_cap = (
        cfg.wire_radar_cap or _roundup(4 * max_radar + 64, 256)
    )
    gt_cap = cfg.wire_gt_cap or _roundup(int(1.5 * max_gt) + 1024, 1024)
    # sparse GT = 8 B/pt (i32 idx + f32 val) vs 4 B/px dense
    if gt_cap * 8 >= h * w * 4:
        gt_cap = 0
    # a "radar" denser than ~1/3 of the image would cost more on the
    # wire than the dense channels it replaces — dense path wins
    if radar_cap * (4 + 4 * n_radar_ch) >= h * w * 4 * n_radar_ch // 2:
        return None
    return WirePlan(radar_cap=radar_cap, gt_cap=gt_cap,
                    n_radar_ch=n_radar_ch,
                    ship_seg=cfg.wire_ship_seg,
                    ship_seg_inter=cfg.wire_ship_seg_inter)


class WireOverflowError(ValueError):
    pass


def resolve_wire_ship(cfg) -> "DataConfig":
    """DataConfig with wire_ship_seg/_inter narrowed to what this
    ExperimentConfig actually consumes: batch["seg"] feeds only the
    supervised seg loss (losses.py:133-135) and the IoU metric
    (evaluation/harness.py:57-60), batch["seg_inter"] only the optional
    stage-4 seg loss (train.seg_inter_loss) — for configs without those
    the planes are dead weight on the H2D wire (~0.42 MB/frame at
    416x800). Never widens: an explicit False stays False."""
    sup = bool(cfg.model.supervised_seg)
    return dataclasses.replace(
        cfg.data,
        wire_ship_seg=cfg.data.wire_ship_seg and sup,
        wire_ship_seg_inter=(
            cfg.data.wire_ship_seg_inter
            and sup
            and bool(cfg.train.seg_inter_loss)
        ),
    )


def _pix_view(s: np.ndarray):
    """(view, element_stride) when flat pixel ``i`` of a 2-D view lives at
    ``data_ptr + i * stride`` (rows packed back-to-back — true for full
    arrays and fixed-channel views like ``radar[..., 0]``); None when the
    layout is anything else (native path falls back to numpy)."""
    if s.ndim != 2:
        return None
    it = s.dtype.itemsize
    st_r, st_c = s.strides
    if st_c <= 0 or st_c % it or st_r != s.shape[1] * st_c:
        return None
    return s, st_c // it


def _encode_frame_wire_native(
    arrays, descs, cfg: DataConfig, plan: WirePlan, h: int, w: int
):
    """C++ fast path for :func:`encode_frame_wire` (native/rasterize.cc
    wire kernels): the union-nonzero mask + gathers, the fused
    inverse-depth encode + sparsify, and the seg-label resizes each run
    as ONE GIL-free pass (~26 -> ~6 ms/frame host, and loader worker
    threads actually parallelize). Bit-exact vs the numpy path — same op
    order, dtype promotion and rounding (pinned by tests/test_native.py).
    Returns None whenever any input's dtype/layout is unsupported."""
    from camradepth_tpu import native

    if not native.available():
        return None
    views = []
    for s, _ in descs:
        pv = _pix_view(s)
        if pv is None:
            return None
        views.append(pv)
    dts = {v.dtype for v, _ in views}
    if dts not in ({np.dtype(np.float32)}, {np.dtype(np.float64)}):
        return None
    gt = arrays["gt"]
    g_pv = _pix_view(gt[..., 0]) if (
        gt.ndim == 3 and gt.dtype in (np.float32, np.float64)
    ) else None
    if g_pv is None:
        return None
    mseg = arrays["mseg"]
    if mseg.dtype not in (np.int64, np.int32) or mseg.ndim != 2:
        return None

    npix = h * w
    radar_idx = np.zeros((plan.radar_cap,), np.int32)
    n_pts = native.wire_union_nonzero(views, npix, radar_idx)
    if n_pts > plan.radar_cap:
        raise WireOverflowError(
            f"radar channels: {n_pts} nonzero points exceed the wire cap "
            f"{plan.radar_cap}; raise data.wire_radar_cap/wire_gt_cap or "
            "set data.wire_format=off"
        )
    radar_val = np.zeros((plan.radar_cap, plan.n_radar_ch), np.float32)
    for c, ((v, stride), (_, desc)) in enumerate(zip(views, descs)):
        use_clip = desc is not None
        lo, hi, div = desc if use_clip else (0.0, 0.0, 1.0)
        native.wire_gather(v, stride, radar_idx, n_pts, use_clip,
                           lo, hi, div, radar_val, c, plan.n_radar_ch)

    out = {
        "image_u8": np.ascontiguousarray(arrays["image"]),
        "radar_idx": radar_idx,
        "radar_val": radar_val,
    }

    g, g_stride = g_pv
    if plan.gt_cap:
        gt_idx = np.zeros((plan.gt_cap,), np.int32)
        gt_val = np.zeros((plan.gt_cap,), np.float32)
        n_gt = native.wire_gt_sparse(
            g, g_stride, npix, float(cfg.max_depth), gt_idx, gt_val
        )
        if n_gt > plan.gt_cap:
            raise WireOverflowError(
                f"lidar GT: {n_gt} nonzero points exceed the wire cap "
                f"{plan.gt_cap}; raise data.wire_radar_cap/wire_gt_cap "
                "or set data.wire_format=off"
            )
        out["gt_idx"] = gt_idx
        out["gt_val"] = gt_val
    else:
        out["gt_depth"] = native.encode_inverse_depth_native(
            np.ascontiguousarray(g), float(cfg.max_depth)
        )

    mseg = mseg[:h, :]
    if plan.ship_seg:
        ri, ci = ch._order0_indices(mseg.shape[0], mseg.shape[1], (h, w))
        seg = native.gather_resize_u8(mseg, ri, ci)
        if seg is None:
            return None  # labels outside uint8 — numpy path raises nicely
        out["seg"] = seg
    if plan.ship_seg_inter:
        ri2, ci2 = ch._order0_indices(
            mseg.shape[0], mseg.shape[1], (h // 2, w // 2)
        )
        seg_inter = native.gather_resize_u8(mseg, ri2, ci2)
        if seg_inter is None:
            return None
        out["seg_inter"] = seg_inter
    return out


def _sparsify(idx: np.ndarray, cap: int, what: str):
    if len(idx) > cap:
        raise WireOverflowError(
            f"{what}: {len(idx)} nonzero points exceed the wire cap "
            f"{cap}; raise data.wire_radar_cap/wire_gt_cap or set "
            f"data.wire_format=off"
        )
    out = np.zeros((cap,), np.int32)
    out[: len(idx)] = idx
    return out


def encode_frame_wire(
    arrays: Dict[str, np.ndarray], cfg: DataConfig, plan: WirePlan
) -> Dict[str, np.ndarray]:
    """Raw artifact arrays -> one wire example (host side).

    Mirrors channels.assemble_frame value-for-value: transforms run in
    the source dtype then cast f32, exactly like the dense path."""
    h, w = cfg.image_dimension
    img = arrays["image"]
    if img.dtype != np.uint8 or img.shape != (h, w, 3):
        raise ValueError(
            f"wire codec requires the resized uint8 BGR image; got "
            f"{img.dtype} {img.shape} vs {(h, w, 3)}"
        )

    # sources must be exactly (h, w), same contract as the dense paths
    # (channels.f2d rejects anything else) — assert so mask indices and
    # gathered values can never come from differently-shaped views
    descs = [(np.asarray(s), d) for s, d in _radar_source_descs(arrays, cfg)]
    for s, _ in descs:
        if s.shape[:2] != (h, w):
            raise ValueError(
                f"radar source shape {s.shape} != image dimension "
                f"{(h, w)}"
            )

    if getattr(cfg, "native_assemble", False):
        native_out = _encode_frame_wire_native(arrays, descs, cfg, plan,
                                               h, w)
        if native_out is not None:
            return native_out

    groups = [(s, _identity if d is None else (
        lambda v, lo=d[0], hi=d[1], div=d[2]: np.clip(v, lo, hi) / div
    )) for s, d in descs]
    mask = np.zeros((h, w), bool)
    for s, _ in groups:
        mask |= s != 0
    pts = np.flatnonzero(mask.reshape(-1))
    radar_idx = _sparsify(pts, plan.radar_cap, "radar channels")
    radar_val = np.zeros((plan.radar_cap, plan.n_radar_ch), np.float32)
    for c, (src, fn) in enumerate(groups):
        vals = fn(src.reshape(-1)[pts])
        radar_val[: len(pts), c] = np.asarray(vals, np.float32)

    out = {
        "image_u8": np.ascontiguousarray(img),
        "radar_idx": radar_idx,
        "radar_val": radar_val,
    }

    enc = ch.encode_inverse_depth(
        np.asarray(arrays["gt"][..., 0]), cfg.max_depth
    )
    if plan.gt_cap:
        gpts = np.flatnonzero(enc.reshape(-1))
        out["gt_idx"] = _sparsify(gpts, plan.gt_cap, "lidar GT")
        gv = np.zeros((plan.gt_cap,), np.float32)
        gv[: len(gpts)] = enc.reshape(-1)[gpts]
        out["gt_val"] = gv
    else:
        out["gt_depth"] = enc

    mseg = arrays["mseg"][:h, :]
    if plan.ship_seg or plan.ship_seg_inter:
        seg = ch.resize_order0(mseg, (h, w))
        if seg.min() < 0 or seg.max() > 255:
            raise ValueError(
                f"seg labels outside uint8 range [{seg.min()}, "
                f"{seg.max()}] — wire codec expects the remapped "
                "21-class + 255-ignore label space"
            )
        if plan.ship_seg:
            out["seg"] = seg.astype(np.uint8)
        if plan.ship_seg_inter:
            out["seg_inter"] = ch.resize_order0(
                mseg, (h // 2, w // 2)
            ).astype(np.uint8)
    return out


def is_wire_micro(micro: Dict) -> bool:
    return "image_u8" in micro


_NORM_LUT: Optional[np.ndarray] = None


def _normalize_lut() -> np.ndarray:
    """[256, 3] f32 table: the EXACT host normalization for every byte
    value. XLA rewrites f32 divides-by-constant into reciprocal
    multiplies (~1 ulp off numpy's divide chain — measured), so the
    device can't replay ``(x/255 - mean)/std`` bit-exactly; a host-built
    table + device gather is exact by construction and cheaper than the
    divides."""
    global _NORM_LUT
    if _NORM_LUT is None:
        v = np.arange(256, dtype=np.float32)[:, None] / 255.0
        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        _NORM_LUT = ((v - mean) / std).astype(np.float32)
    return _NORM_LUT


def decode_wire_micro(micro: Dict) -> Dict:
    """Wire microbatch [B, ...] -> the dense batch contract
    (features/gt_depth/seg/seg_inter), traceable under jit/vmap/scan.

    Image normalization goes through a host-built 256-entry LUT
    (:func:`_normalize_lut`) so every decoded value is BIT-identical to
    the dense path's numpy arithmetic; the sparse scatters are exact
    f32 adds of host-computed values into zeros."""
    import jax
    import jax.numpy as jnp

    lut = jnp.asarray(_normalize_lut())
    u8 = micro["image_u8"]
    img = lut[u8.astype(jnp.int32), jnp.arange(3, dtype=jnp.int32)]

    lead = img.shape[:-3]          # [B] (or [] for a single frame)
    h, w = img.shape[-3], img.shape[-2]
    rv = micro["radar_val"].astype(jnp.float32)
    ri = micro["radar_idx"]

    def scatter(idx, val, n_ch):
        dense = jnp.zeros((h * w, n_ch), jnp.float32)
        return dense.at[idx].add(val).reshape(h, w, n_ch)

    scat = scatter
    for _ in lead:
        scat = jax.vmap(scat, in_axes=(0, 0, None))
    radar = scat(ri, rv, rv.shape[-1])
    features = jnp.concatenate([img, radar], axis=-1)

    out = {
        k: v for k, v in micro.items() if k not in WIRE_KEYS
    }
    out["features"] = features
    if "gt_val" in micro:
        gt = scat(
            micro["gt_idx"], micro["gt_val"][..., None].astype(jnp.float32), 1
        )[..., 0]
        out["gt_depth"] = gt
    if "seg" in micro and micro["seg"].dtype == jnp.uint8:
        out["seg"] = micro["seg"].astype(jnp.int32)
    if "seg_inter" in micro and micro["seg_inter"].dtype == jnp.uint8:
        out["seg_inter"] = micro["seg_inter"].astype(jnp.int32)
    return out
