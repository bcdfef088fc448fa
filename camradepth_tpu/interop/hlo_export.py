"""Portable compiled serving artifacts (StableHLO via ``jax.export``).

The reference's only deployment artifact is a torch ``.pth`` that needs
the full reference source tree to run (runner.py:124-135 torch.load's
the state dict into a freshly constructed CamRaDepth around it). The TPU-native deployment story
adds a self-contained SERVING artifact: the canonical serving forward
(``serving.make_serving_forward`` — decoded metric depth + argmax seg)
with the trained params baked in as constants, serialized as StableHLO
and lowered for BOTH ``cpu`` and ``tpu``, so one file serves anywhere a
JAX runtime exists — no Flax, no model code, no config, no checkpoint
conversion at load time.

File layout: ``CRDSHLO1`` magic, 8-byte little-endian header length, a
JSON header (shape/semantics metadata for validation + inspection),
then the ``jax.export`` blob.

This also covers the TPU architecture variant (``--tpu-decoder``),
which has NO reference-format representation (``cli export`` refuses
``.pth`` for it): the StableHLO artifact is its deployment path.
"""

from __future__ import annotations

import hashlib
import json
import struct
from pathlib import Path
from typing import Dict, Optional, Tuple

from camradepth_tpu.config import ExperimentConfig

_MAGIC = b"CRDSHLO1"
ARTIFACT_SUFFIXES = (".stablehlo", ".hlo")


def export_serving_artifact(
    cfg: ExperimentConfig,
    model,
    params,
    path: str,
    batch_size: int = 8,
    decode_depth: bool = True,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    artifact_dtype: str = "float32",
    dynamic_batch: bool = False,
) -> Dict:
    """Serialize the jitted serving forward (params baked in) to
    ``path``. Returns the artifact header dict.

    ``artifact_dtype="bfloat16"`` bakes the float32 params as bfloat16
    constants, halving the artifact. On a bfloat16-compute config (the
    flagship default) this is numerically FREE: apply casts every
    float32 param to bfloat16 at use anyway, so pre-rounding them
    changes nothing — only float32-compute configs see a (documented,
    bf16-resolution) difference.

    ``dynamic_batch=True`` exports with a SYMBOLIC batch dimension
    (``jax.export`` shape polymorphism): the artifact serves any batch
    size (the runtime compiles per concrete shape on first use) and
    the header records ``batch_size: null``; consumers then pick the
    serving batch at load time."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from camradepth_tpu.serving import make_serving_forward

    if artifact_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"artifact_dtype must be float32 or bfloat16, "
            f"got {artifact_dtype!r}"
        )
    if artifact_dtype == "bfloat16":
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
            params,
        )
    fwd = make_serving_forward(cfg, model, decode_depth=decode_depth)
    h, w = cfg.model.img_size
    c = cfg.model.input_channels
    b = (jax_export.symbolic_shape("b")[0] if dynamic_batch
         else batch_size)
    x_spec = jax.ShapeDtypeStruct((b, h, w, c), jnp.float32)
    exported = jax_export.export(
        jax.jit(lambda x: fwd(params, x)), platforms=list(platforms)
    )(x_spec)
    blob = exported.serialize()
    header = {
        "format": "camradepth-stablehlo",
        "version": 1,
        "batch_size": None if dynamic_batch else batch_size,
        "img_size": [h, w],
        "input_channels": c,
        "decode_depth": decode_depth,
        "variant": cfg.name,
        "tpu_decoder": bool(cfg.model.tpu_decoder),
        "max_depth": float(cfg.data.max_depth),
        "platforms": list(platforms),
        "artifact_dtype": artifact_dtype,
        "blob_sha256": hashlib.sha256(blob).hexdigest(),
    }
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        f.write(blob)
    return header


def is_artifact(path: str) -> bool:
    p = Path(path)
    if p.suffix in ARTIFACT_SUFFIXES:
        return True
    try:
        with open(p, "rb") as f:
            return f.read(len(_MAGIC)) == _MAGIC
    except OSError:
        return False


def read_header(path: str) -> Tuple[Dict, int]:
    """Parse just the JSON header (and report the compiled blob's byte
    size) WITHOUT deserializing the program — bounded inspection that
    never touches a backend."""
    import os

    with open(path, "rb") as f:
        if f.read(len(_MAGIC)) != _MAGIC:
            raise ValueError(
                f"{path} is not a camradepth StableHLO artifact"
            )
        (hdr_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hdr_len).decode())
        blob_bytes = (
            os.fstat(f.fileno()).st_size - len(_MAGIC) - 8 - hdr_len
        )
    return header, blob_bytes


def load_serving_artifact(path: str):
    """Deserialize an artifact -> ``(call, header)``; ``call`` maps a
    ``[batch_size, H, W, C]`` float32 array to the serving output dict
    (depth in meters unless exported raw, argmax seg or None)."""
    import jax
    from jax import export as jax_export

    raw = Path(path).read_bytes()
    if raw[: len(_MAGIC)] != _MAGIC:
        raise ValueError(
            f"{path} is not a camradepth StableHLO artifact "
            f"(bad magic; expected a `cli export --format stablehlo` "
            "output)"
        )
    off = len(_MAGIC)
    (hdr_len,) = struct.unpack("<Q", raw[off: off + 8])
    off += 8
    header = json.loads(raw[off: off + hdr_len].decode())
    blob = raw[off + hdr_len:]
    want = header.get("blob_sha256")
    if want is not None:
        got = hashlib.sha256(blob).hexdigest()
        if got != want:
            raise ValueError(
                f"{path} is corrupt: compiled-program hash mismatch "
                f"(truncated download or bit rot — re-export)"
            )
    exported = jax_export.deserialize(blob)
    call = jax.jit(exported.call)
    return call, header


def artifact_engine(
    path: str,
    cfg: Optional[ExperimentConfig] = None,
    decode_depth: Optional[bool] = None,
    batch_size: Optional[int] = None,
):
    """A ready ``DepthEngine`` serving an exported artifact. ``cfg`` is
    only used for bookkeeping (the artifact is self-contained); when
    given, its geometry must match the header. ``batch_size`` selects
    the serving batch for DYNAMIC-batch artifacts (default 8); fixed
    artifacts always use their baked size."""
    from camradepth_tpu.serving import DepthEngine

    call, header = load_serving_artifact(path)
    if cfg is not None:
        want = (tuple(cfg.model.img_size), cfg.model.input_channels)
        got = (tuple(header["img_size"]), header["input_channels"])
        if want != got:
            raise ValueError(
                f"artifact geometry {got} does not match the config's "
                f"{want} — pass the preset the artifact was exported "
                "from (header variant: "
                f"{header.get('variant')!r})"
            )
    if decode_depth is not None and decode_depth != header["decode_depth"]:
        raise ValueError(
            "decode_depth is baked into the artifact at export time "
            f"(exported with decode_depth={header['decode_depth']})"
        )
    if cfg is None:
        # the artifact is self-contained; the engine only reads the
        # input geometry from the config, so a shim is enough
        from types import SimpleNamespace

        cfg = SimpleNamespace(
            model=SimpleNamespace(
                img_size=tuple(header["img_size"]),
                input_channels=header["input_channels"],
            ),
            data=SimpleNamespace(max_depth=header["max_depth"]),
        )
    engine = DepthEngine(
        cfg,
        model=None,
        params=None,
        batch_size=header["batch_size"] or batch_size or 8,
        decode_depth=header["decode_depth"],
        forward_fn=lambda p, x: call(x),
    )
    return engine
