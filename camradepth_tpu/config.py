"""Typed configuration tree for the TPU-native CamRaDepth framework.

Replaces the reference's argparse->EasyDict singleton (see
/root/reference/src/utils/args.py:11-198) with an immutable dataclass tree.
The six published experiment presets (args.py:72-122) are exposed via
:func:`preset`, and the derived-field logic (update_interval, channel flags,
transformer-depth variants, args.py:124-198) lives in ``__post_init__`` /
factory helpers so it is pure and unit-testable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Mapping, Sequence, Tuple

# Transformer depth variants (reference args.py:186-188). The published runs
# use variant "5" = (3, 10, 16, 5).
TRANSFORMER_DEPTH_VARIANTS: Mapping[str, Tuple[int, int, int, int]] = {
    "0": (2, 2, 2, 2),
    "1": (2, 2, 2, 2),
    "1.5": (2, 2, 3, 3),
    "2": (3, 3, 6, 3),
    "2.5": (3, 4, 7, 3),
    "3": (3, 6, 8, 3),
    "3.5": (3, 8, 10, 3),
    "4": (3, 8, 12, 5),
    "5": (3, 10, 16, 5),
}

MODEL_VARIANTS = (
    "base (rgb)",
    "base",
    "supervised_seg",
    "unsupervised_seg",
    "sup_unsup_seg",
    "sup_unsup_seg (rgb)",
)

# ImageNet normalization constants. NOTE: the reference normalizes cv2's BGR
# channel order with these RGB-ordered stats (dataloader.py:225-232). We keep
# the same behavior for weight round-trip parity; see data/channels.py.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class ConfigError(ValueError):
    """A user-facing configuration error raised by library code (bad
    field value / unsupported combination discovered at construction
    time, e.g. Trainer wire-format checks). The CLI prints these as a
    one-line exit-2 user error, same as its own UserError; internal
    failures must NOT use this class."""


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference CamRaDepth.py:20-57)."""

    img_size: Tuple[int, int] = (416, 800)
    dims: Tuple[int, int, int, int] = (64, 128, 160, 256)
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    ff_expansion: Tuple[int, int, int, int] = (8, 8, 4, 4)
    sr_ratios: Tuple[int, int, int, int] = (8, 4, 2, 1)
    depths: Tuple[int, int, int, int] = (3, 10, 16, 5)
    mid_channels: int = 128
    input_channels: int = 7
    num_classes: int = 21
    unsup_classes: int = 19
    supervised_seg: bool = False
    unsupervised_seg: bool = False
    groupnorm_divisor: int = 16
    drop_path_rate: float = 0.1
    dropout_rate: float = 0.2  # Dropout2d in the decoder (CamRaDepth.py:96)
    qkv_bias: bool = True
    # Compute dtype for the forward pass ("bfloat16" or "float32"). Norms and
    # params stay float32; this replaces the reference's CUDA AMP autocast.
    compute_dtype: str = "bfloat16"
    # Use the fused Pallas max-pool-attention kernel. Off by default: at
    # 416x800 XLA's fused einsum path measures faster (6.8 vs 5.3 ms/frame
    # encoder time); the kernel remains available for larger images where
    # score materialization would spill to HBM.
    use_pallas_attention: bool = False
    # Rematerialize decoder stages in the backward pass (jax.checkpoint):
    # trades ~15% extra decoder FLOPs for dropping the full-resolution
    # activation residuals — enables whole-effective-batch training without
    # gradient accumulation on a 16 GB chip.
    remat_decoder: bool = False
    # Rematerialize encoder transformer blocks in the backward pass —
    # their ratio-8 MixFFN hiddens are the second-largest training
    # memory consumer; recompute costs ~2 ms/frame.
    remat_encoder: bool = False
    # Rematerialize only the low-resolution decoder stages (up to
    # quarter resolution) — a few hundred MB of residuals for ~0.4 ms
    # of recompute; used to fit whole-batch-6 training alongside
    # remat_encoder without paying full-decoder recompute.
    remat_decoder_small: bool = False
    # Use the Pallas single-pass bicubic upsample in the decoder on TPU
    # (ops/resize_pallas.py; bit-exact vs the XLA path in bf16, and
    # differentiable — its VJP reuses the XLA transpose). Off by
    # default: in-graph, the custom-call's forced operand layouts break
    # XLA's concat-into-conv fusion and cost more in relayout copies
    # (~2 ms/frame measured) than the kernel saves standalone (0.6 ->
    # 0.51 ms). Kept for experimentation and large-image regimes.
    use_pallas_resize: bool = False
    # Documented TPU variant (NOT weight-compatible with the reference
    # architecture): the half/full-resolution decoder stages
    # (depth_upsample_3/4, seg_upsample_0/1) and the final depth/seg
    # heads run at their INPUT resolution with 128-wide MXU
    # lane-filling layers and learn the x2 upsample as a subpixel
    # depth-to-space projection (models/layers.py TPUDecoder /
    # SubpixelDepthActivation). Output shapes and training losses are
    # unchanged; the full-res skip is injected via space-to-depth.
    # ~2x faster inference on v5e; transfer from parity checkpoints
    # restores the encoder + low-res decoder by shape matching.
    tpu_decoder: bool = False

    def __post_init__(self):
        for name in ("dims", "heads", "ff_expansion", "sr_ratios", "depths"):
            v = getattr(self, name)
            if len(v) != 4:
                raise ValueError(f"{name} must have 4 stages, got {v}")
        if self.input_channels <= 0:
            raise ValueError("input_channels must be > 0")
        for d in self.dims:
            if d % self.groupnorm_divisor:
                raise ValueError(
                    f"dims must be divisible by groupnorm_divisor, got {d}"
                )

    @property
    def stage_strides(self) -> Tuple[int, int, int, int]:
        return (4, 8, 16, 32)

    def feature_shape(self, stage: int) -> Tuple[int, int]:
        s = self.stage_strides[stage]
        return (self.img_size[0] // s, self.img_size[1] // s)


@dataclass(frozen=True)
class DataConfig:
    """Input-pipeline options (reference args.py:14-22, 190-198)."""

    split_path: str = "original_split.npy"
    image_dimension: Tuple[int, int] = (416, 800)
    max_depth: float = 100.0
    # Reference evaluates at caps [100, 50] in *inverse* space
    # (args.py:15, runner.py:451-492); the north-star adds true-depth caps.
    max_distances: Tuple[float, ...] = (100.0, 50.0)
    train_val_split: Tuple[int, int] = (17902, 2237)
    mini_dataset: bool = False
    num_workers: int = 8
    prefetch: int = 2
    # Channel-assembly flags (args.py:190-198 defaults).
    sparse_lidar: bool = False
    filtered_radar: bool = False
    lidar_ratio: Tuple[float, float] = (0.75, 0.25)
    sparse_depth_uv: bool = True
    im_uv: bool = False
    rad_vel: bool = True
    radar_uv: bool = False
    gt_uv: bool = False
    # C++ channel assembly (native/rasterize.cc): bit-exact vs numpy and
    # GIL-free so loader worker threads scale; auto-falls back to numpy
    # when the native lib or the frame's dtypes are unsupported.
    native_assemble: bool = True
    # Compact train-loader wire format (data/wire.py): uint8 image +
    # sparse COO radar/GT + uint8 seg, decoded on device inside the
    # jitted step — ~4x fewer H2D bytes/step through the ~44 MB/s axon
    # tunnel, decoded batch bit-identical to the dense stack.
    # "auto" engages for single-process training without sp sharding
    # when the channel config is supported; "on" errors if unusable;
    # "off" keeps the dense path everywhere.
    wire_format: str = "off"
    wire_radar_cap: int = 0  # points/frame; 0 = probe the dataset
    wire_gt_cap: int = 0     # points/frame; 0 = probe (dense if big)
    # Ship seg label planes over the wire. The train step reads
    # batch["seg"] only when model.supervised_seg (losses.py:134) and
    # batch["seg_inter"] only when train.seg_inter_loss on top of that
    # — for every other config the planes are dead H2D weight (~0.42
    # MB/frame through the ~130 MB/s axon tunnel, where transfers do
    # NOT overlap device compute). Trainer/cli resolve these from the
    # full config via wire.resolve_wire_ship; True = unconditional
    # (library callers building loaders directly keep old behavior).
    wire_ship_seg: bool = True
    wire_ship_seg_inter: bool = True

    @property
    def effective_train_val_split(self) -> Tuple[int, int]:
        return (0, 0) if self.mini_dataset else self.train_val_split

    @property
    def num_samples(self) -> int:
        return sum(self.effective_train_val_split)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference args.py:29-42, 105-122)."""

    batch_size: int = 2
    desired_batch_size: int = 6
    learning_rate: float = 6e-5
    div_factor: float = 2.0
    final_div_factor: float = 1e4
    pct_start: float = 0.15
    num_epochs: int = 30
    num_steps: int | None = 60_000
    early_stopping_thresh: int = 6
    stop_after: int | None = None
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0
    # Deep-supervision loss weights [final, stage4, stage3, seg_final,
    # seg_inter] (runner.py:213-215).
    loss_weights: Tuple[float, float, float, float, float] = (1, 1, 1, 0.2, 0.2)
    # The reference allocates weight 0.2 to an intermediate-seg loss but its
    # model always returns intermediate_seg=None (CamRaDepth.py:171), so
    # loss_seg_inter is 0 in every reference run (runner.py:198) — the
    # weight only inflates the normalizing denominator. Default False is
    # reference-exact; True turns on real stage-4 seg supervision (our
    # model does expose the logits).
    seg_inter_loss: bool = False
    # Pad each training microbatch with dummy samples up to this size.
    # XLA:TPU space-to-batches convs with batch < 8 (~2.5x slower);
    # dummies are exact no-ops for every masked loss term (zero depth
    # GT, ignore-index seg labels), so gradients are unchanged. The
    # recommended flagship TPU setting is batch_size=6 (update_interval
    # 1) + pad_microbatch_to=8 + remat_encoder.
    pad_microbatch_to: int | None = None
    seed: int = 0
    checkpoint: str | None = None
    load_ckpt: bool = False
    save_model: bool = False
    # write best-val checkpoints on a background thread (Orbax async):
    # the epoch loop keeps training while bytes hit disk
    async_checkpoint: bool = False
    # catch SIGTERM during train() and save a full-TrainState checkpoint
    # at the next optimizer-step boundary before exiting (TPU pods are
    # preemptible; pairs with auto-resume, which fast-forwards the
    # interrupted epoch past already-consumed steps)
    graceful_preemption: bool = True
    # Input-pipeline shape (round-4 sustained-run finding: the pure
    # device step is 372.6 ms but the naive loop ran at ~1.7-1.9 s/step
    # — host assembly + the per-step 74 MB host->device transfer
    # through the axon tunnel dominate).
    # transfer_dtype: wire format of batch["features"]. "auto" ships
    # bfloat16 IFF model.compute_dtype is bfloat16 — bit-exact there,
    # because the model's first op casts the input to bf16 anyway
    # (models/camradepth.py) — and float32 otherwise. Halves the
    # dominant H2D payload.
    transfer_dtype: str = "auto"  # auto | float32 | bfloat16
    # prefetch_batches: assemble + dispatch H2D for up to N microbatch
    # stacks AHEAD on a worker thread, overlapping host work and
    # transfer with device compute. 0 = inline (multi-process runs
    # always use the inline path: cross-process array assembly must
    # stay on one thread in a deterministic order).
    prefetch_batches: int = 2
    output_dir: str = "Output"
    arch_name: str = "Transformer"
    run_name: str = "current"
    log_every: int = 50

    def __post_init__(self):
        if self.desired_batch_size % self.batch_size:
            raise ValueError(
                "desired_batch_size must be a multiple of batch_size"
            )

    @property
    def update_interval(self) -> int:
        """Gradient-accumulation factor (args.py:132)."""
        return self.desired_batch_size // self.batch_size


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding. The reference's only parallelism
    is single-process ``nn.DataParallel`` (runner.py:135-136); here batches
    shard over a ``data`` ICI axis and optimizer state can shard over a
    ``fsdp`` axis."""

    data_axis: str = "data"
    fsdp_axis: str = "fsdp"
    sp_axis: str = "sp"
    data_parallel: int = -1  # -1 = all available devices
    fsdp_parallel: int = 1
    # shard the image H axis over this many chips (conv halo exchanges and
    # GroupNorm reductions are inserted by GSPMD)
    spatial_parallel: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    name: str = "base"

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _variant_flags(model_name: str) -> Tuple[bool, bool, int]:
    """Map a reference model-variant string to (supervised_seg,
    unsupervised_seg, input_channels) — args.py:156-167."""
    if model_name not in MODEL_VARIANTS:
        raise ValueError(f"Model type invalid: {model_name}")
    sup = model_name in ("sup_unsup_seg", "sup_unsup_seg (rgb)", "supervised_seg")
    unsup = model_name in ("sup_unsup_seg", "sup_unsup_seg (rgb)", "unsupervised_seg")
    rgb_only = model_name in ("base (rgb)", "sup_unsup_seg (rgb)")
    input_channels = 3 if rgb_only else 7
    return sup, unsup, input_channels


# The six published experiment presets (args.py:85-122).
_PRESET_NAMES: Mapping[str, str] = {
    "base_rgb": "base (rgb)",
    "base": "base",
    "supervised_seg": "supervised_seg",
    "unsupervised_seg": "unsupervised_seg",
    "sup_unsup_seg": "sup_unsup_seg",
    "sup_unsup_seg_rgb": "sup_unsup_seg (rgb)",
}


def preset(name: str, **overrides) -> ExperimentConfig:
    """Build one of the six published experiment configurations."""
    if name not in _PRESET_NAMES:
        raise ValueError(
            f"Unknown preset {name!r}; choose from {sorted(_PRESET_NAMES)}"
        )
    variant = _PRESET_NAMES[name]
    sup, unsup, in_ch = _variant_flags(variant)
    model = ModelConfig(
        supervised_seg=sup,
        unsupervised_seg=unsup,
        input_channels=in_ch,
    )
    train = TrainConfig(
        batch_size=2,
        desired_batch_size=6,
        learning_rate=6e-5,
        div_factor=2.0,
        num_steps=60_000,
    )
    cfg = ExperimentConfig(model=model, train=train, name=name)
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def _coerce_override(raw: str, current):
    """Parse an override string against the current field value's type.

    'none'/'null' clears optional fields; bools accept 1/0/true/false/
    yes/no/on/off; tuples take comma lists with per-element coercion
    (ints stay ints unless the value needs a float); everything the
    current value can't type (None-default str fields like
    ``train.checkpoint``) falls back to the raw string.
    """
    s = raw.strip()
    if s.lower() in ("none", "null"):
        return None
    if isinstance(current, bool):
        low = s.lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"expected a boolean, got {raw!r}")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(s)
    if isinstance(current, float):
        return float(s)
    if isinstance(current, tuple):
        parts = [p.strip() for p in s.strip("()").split(",") if p.strip()]
        ref = list(current) + [current[-1] if current else ""] * (
            len(parts) - len(current)
        )
        out = []
        for p, r in zip(parts, ref):
            if isinstance(r, str):
                out.append(p)
            elif isinstance(r, bool):
                out.append(_coerce_override(p, r))
            else:
                f = float(p)
                out.append(int(f) if isinstance(r, int) and f == int(f)
                           else f)
        return tuple(out)
    if isinstance(current, str):
        return s
    # current is None (untyped optional): prefer numbers, else string
    try:
        f = float(s)
        return int(f) if f == int(f) and "." not in s else f
    except ValueError:
        return s


def apply_overrides(cfg: ExperimentConfig, pairs) -> ExperimentConfig:
    """Hydra-style dotted config overrides: ``train.stop_after=5``.

    Every reference argparse option (args.py:11-66) maps to a field of
    this config tree; the CLI exposes the common ones as dedicated flags
    and ``--set section.field=value`` covers the rest (full flag table:
    docs/MIGRATION.md). Sections: model, data, train, mesh, plus the
    top-level ``name``. Values are coerced against the current field's
    type, and dataclass ``__post_init__`` invariants re-run on replace.
    """
    sections = ("model", "data", "train", "mesh")
    for pair in pairs:
        if "=" not in pair:
            raise ValueError(
                f"--set expects section.field=value, got {pair!r}"
            )
        path, _, raw = pair.partition("=")
        path = path.strip()
        if "." not in path:
            if path != "name":
                raise ValueError(
                    f"--set path {path!r} must be section.field with "
                    f"section in {sections} (or 'name')"
                )
            cfg = cfg.replace(name=raw.strip())
            continue
        section, _, fname = path.partition(".")
        if section not in sections:
            raise ValueError(
                f"unknown config section {section!r}; choose from "
                f"{sections}"
            )
        sub = getattr(cfg, section)
        valid = {f.name for f in dataclasses.fields(sub)}
        if fname not in valid:
            raise ValueError(
                f"unknown field {section}.{fname}; available: "
                f"{sorted(valid)}"
            )
        value = _coerce_override(raw, getattr(sub, fname))
        cfg = cfg.replace(
            **{section: dataclasses.replace(sub, **{fname: value})}
        )
    return cfg


def num_epochs_for_steps(cfg: ExperimentConfig) -> int:
    """Auto-derived epoch count when training is step-budgeted
    (args.py:141-143)."""
    if cfg.train.num_steps is None:
        return cfg.train.num_epochs
    train_n = cfg.data.effective_train_val_split[0]
    if train_n <= 0:
        return cfg.train.num_epochs
    return max(1, cfg.train.num_steps * cfg.train.batch_size // train_n)


def tiny_test_config(**overrides) -> ExperimentConfig:
    """A miniature config for unit tests and CPU-mesh dry runs."""
    model = ModelConfig(
        img_size=(64, 128),
        dims=(16, 32, 32, 64),
        heads=(1, 2, 4, 8),
        ff_expansion=(2, 2, 2, 2),
        sr_ratios=(8, 4, 2, 1),
        depths=(1, 1, 1, 1),
        mid_channels=32,
        input_channels=7,
        groupnorm_divisor=16,
        drop_path_rate=0.0,
        compute_dtype="float32",
        use_pallas_attention=False,
    )
    train = TrainConfig(batch_size=2, desired_batch_size=4, num_steps=None,
                        num_epochs=1)
    data = DataConfig(image_dimension=(64, 128), train_val_split=(4, 2))
    cfg = ExperimentConfig(model=model, data=data, train=train, name="tiny")
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
