"""Streaming inference engine for production serving.

The reference has no serving layer (SURVEY.md §1: "no serving layer");
its test loop is a batch-1 Python loop with a host sync per frame
(runner.py:409-420). This engine is the TPU-native deployment path:

- fixed-shape batched forward, jitted once (tail batches are padded and
  masked);
- a pipeline thread overlaps host-side preprocessing/H2D of batch N+1 with
  device compute of batch N (the device queue is async);
- outputs are returned as decoded metric depth (or raw inverse encoding);
- per-request latency / throughput counters built in.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from camradepth_tpu.config import ExperimentConfig
from camradepth_tpu.data import wire as wire_codec

# the wire keys a serving request actually needs (GT never ships)
SERVE_WIRE_KEYS = ("image_u8", "radar_idx", "radar_val")


def make_serving_forward(cfg: ExperimentConfig, model,
                         decode_depth: bool = True):
    """The canonical serving forward ``fwd(params, x) -> {depth, seg}``:
    clipped final depth decoded to metric meters (inverse encoding,
    dataloader.py:243-245) and argmax seg labels. Shared by the live
    DepthEngine and the StableHLO deployment artifact
    (interop/hlo_export.py) so both serve identical semantics."""

    def fwd(p, x):
        out = model.apply({"params": p}, x, deterministic=True)
        depth = jnp.clip(out["depth"]["final_depth"][..., 0], 0.0, 1.0)
        if decode_depth:
            depth = cfg.data.max_depth * (1.0 - depth)
        seg = out["seg"]["final_seg"]
        if seg is not None:
            seg = jnp.argmax(seg, -1)
            if cfg.model.num_classes <= 255:
                # lossless: label ids fit a byte — a 4x smaller D2H /
                # network payload (the 21-class argmax map is ~half
                # the serving output bytes at int32)
                seg = seg.astype(jnp.uint8)
        return {"depth": depth, "seg": seg}

    return fwd


def make_serving_forward_wire(cfg: ExperimentConfig, model,
                              decode_depth: bool = True):
    """Serving forward over compact WIRE requests (data/wire.py):
    ``fwd(params, {image_u8, radar_idx, radar_val}) -> {depth, seg}``.
    The on-device decode (LUT normalize + sparse scatter) fuses into
    the jitted forward and reproduces the dense feature stack
    bit-exactly, so a wire engine serves IDENTICAL outputs from ~8x
    fewer H2D bytes per frame (uint8 image + COO radar vs the dense
    f32 stack) — the production request format for network/edge
    deployment."""
    base = make_serving_forward(cfg, model, decode_depth)

    def fwd(p, req):
        feats = wire_codec.decode_wire_micro(
            {k: req[k] for k in SERVE_WIRE_KEYS}
        )["features"]
        return base(p, feats)

    return fwd


def item_arr(x):
    """The leading-dim-carrying array of a stream item (dense feature
    stack, or the image leaf of a compact wire request dict)."""
    return x["image_u8"] if isinstance(x, dict) else x


def _item_rows(x):
    n = item_arr(x).shape[0]
    if isinstance(x, dict):
        return [{k: v[i] for k, v in x.items()} for i in range(n)]
    return list(x)


def _item_stack(rows):
    if isinstance(rows[0], dict):
        return {k: np.stack([r[k] for r in rows]) for k in rows[0]}
    return np.stack(rows)


class DepthEngine:
    def __init__(
        self,
        cfg: ExperimentConfig,
        model,
        params,
        batch_size: int = 8,
        decode_depth: bool = True,
        mesh=None,
        batch_axis: str = "data",
        spatial_axis: Optional[str] = None,
        forward_fn=None,
        wire_plan=None,
    ):
        """``mesh`` (a jax.sharding.Mesh) turns on multi-chip serving:
        the batch shards over ``batch_axis`` (throughput scales with
        chips) and, when ``spatial_axis`` names a second mesh axis, the
        image height shards spatially — GSPMD inserts the halo
        exchanges. Spatial sharding is the intended route to lower
        single-frame latency on multi-chip hardware (projection — only
        bit-parity is measurable on this single-chip machine; see
        tests/test_parallel.py and tests/test_serving.py).

        ``forward_fn`` replaces the model-built forward with a
        prebuilt ``fwd(params, x)`` callable (the StableHLO deployment
        artifact path — params are baked into the artifact, so
        ``params`` may be None). Mutually exclusive with ``mesh``: an
        artifact's sharding is fixed at export time.

        ``wire_plan`` (a data/wire.py WirePlan) switches the engine to
        COMPACT WIRE requests: items are dicts with ``image_u8`` /
        ``radar_idx`` / ``radar_val`` instead of dense feature stacks,
        decoded on device inside the jitted forward (bit-exact, ~8x
        fewer H2D bytes/frame). Incompatible with ``forward_fn``
        (artifacts bake a dense signature) and with ``spatial_axis``
        (the scatter decode is frame-local; wire requests shard over
        the batch axis only)."""
        self.cfg = cfg
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.decode_depth = decode_depth
        self.wire_plan = wire_plan
        h, w = cfg.model.img_size
        self._in_shape = (batch_size, h, w, cfg.model.input_channels)
        if wire_plan is not None:
            if forward_fn is not None:
                raise ValueError(
                    "wire_plan and forward_fn (deployment artifact) are "
                    "mutually exclusive — artifacts bake a dense-"
                    "features input signature at export time"
                )
            if spatial_axis is not None:
                raise ValueError(
                    "wire_plan cannot be combined with spatial "
                    "sharding — the on-device scatter decode is frame-"
                    "local; use batch (data) sharding only"
                )
            if 3 + wire_plan.n_radar_ch != cfg.model.input_channels:
                raise ValueError(
                    f"wire plan carries 3+{wire_plan.n_radar_ch} "
                    f"channels but the model expects "
                    f"{cfg.model.input_channels}"
                )
        self._in_sharding = None
        if mesh is not None:
            if forward_fn is not None:
                raise ValueError(
                    "forward_fn (deployment artifact) and mesh are "
                    "mutually exclusive — an artifact's partitioning "
                    "is fixed at export time"
                )
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(batch_axis, spatial_axis)
            self._in_sharding = NamedSharding(mesh, spec)
            self.params = jax.device_put(
                params, NamedSharding(mesh, P())
            )

        if forward_fn is not None:
            self._fwd = forward_fn
        elif wire_plan is not None:
            self._fwd = jax.jit(
                make_serving_forward_wire(cfg, model, decode_depth)
            )
        else:
            self._fwd = jax.jit(make_serving_forward(cfg, model,
                                                     decode_depth))
        self.frames_served = 0
        self.batches_served = 0
        self._warmed = False
        self._t_start: Optional[float] = None
        self._batch_times: list = []

    def _warm_input(self):
        if self.wire_plan is None:
            return jnp.zeros(self._in_shape, jnp.float32)
        b, p = self.batch_size, self.wire_plan
        h, w = self.cfg.model.img_size
        return {
            "image_u8": jnp.zeros((b, h, w, 3), jnp.uint8),
            "radar_idx": jnp.zeros((b, p.radar_cap), jnp.int32),
            "radar_val": jnp.zeros(
                (b, p.radar_cap, p.n_radar_ch), jnp.float32
            ),
        }

    def warmup(self) -> None:
        x = self._warm_input()
        if self._in_sharding is not None:
            x = jax.device_put(x, self._in_sharding)
        out = self._fwd(self.params, x)
        np.asarray(out["depth"][0, 0, 0])  # force completion
        self._warmed = True

    def _dispatch(self, features):
        """Pad + H2D + enqueue the forward WITHOUT waiting for the
        result: jitted dispatch is asynchronous, so the returned handle
        represents in-flight device work. The pipelining primitive.
        ``features``: dense [b, H, W, C] stack, or a compact wire
        request dict (wire engines only)."""
        if not self._warmed:
            # compile outside the serving timers — a cold first request
            # must not pollute latency percentiles / throughput stats
            self.warmup()
        if isinstance(features, dict):
            if self.wire_plan is None:
                raise ValueError(
                    "this engine was built without wire_plan; wire "
                    "request dicts need a wire engine (serving.py)"
                )
            features = {k: features[k] for k in SERVE_WIRE_KEYS}
        n = item_arr(features).shape[0]
        if n < self.batch_size:
            k = self.batch_size - n

            def _pad(v):
                return np.concatenate(
                    [v, np.repeat(v[-1:], k, axis=0)], axis=0
                )

            features = jax.tree.map(_pad, features)
        if self._t_start is None:
            self._t_start = time.perf_counter()
        t0 = time.perf_counter()
        x = jax.tree.map(jnp.asarray, features)
        if self._in_sharding is not None:
            x = jax.device_put(x, self._in_sharding)
        out = self._fwd(self.params, x)
        return out, n, t0

    def _materialize(self, handle) -> Dict[str, np.ndarray]:
        """Block on an in-flight handle's D2H and strip tail padding.
        The recorded per-batch time spans dispatch -> materialization
        (in pipelined streaming this includes deliberate on-device
        queue time, the honest per-request latency of a pipeline)."""
        out, n, t0 = handle
        result = {"depth": np.asarray(out["depth"])[:n]}
        if out["seg"] is not None:
            result["seg"] = np.asarray(out["seg"])[:n]
        self._batch_times.append(time.perf_counter() - t0)
        self.frames_served += n
        self.batches_served += 1
        return result

    def infer_batch(self, features) -> Dict[str, np.ndarray]:
        """features: [b<=batch_size, H, W, C] (or a wire request dict
        of [b, ...] leaves); pads the tail internally."""
        return self._materialize(self._dispatch(features))

    def infer_stream(
        self,
        frames: Iterable[np.ndarray],
        prefetch: int = 2,
        inflight: int = 2,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Stream feature stacks; yields per-frame results in order.
        Items may be single frames ``[H, W, C]`` (stacked to batches
        here) or pre-batched ``[b, H, W, C]`` arrays (b <= batch_size
        — a loader's batches pass through without the per-frame
        unpack/restack copy; ragged/mixed sizes are re-chunked). Two
        overlaps keep the device busy: a pipeline thread stacks/stages
        host batches ahead (``prefetch``), and up to ``inflight``
        dispatched batches stay queued on the device so the D2H +
        numpy conversion of batch N runs WHILE batch N+1 computes
        (dispatch is async; materialization is the only blocking
        point)."""
        from collections import deque

        q_in: queue.Queue = queue.Queue(maxsize=prefetch)
        _SENTINEL = object()

        def batcher():
            # exceptions must flow through the queue: a raise inside
            # this worker thread would otherwise strand the consumer
            # on q_in.get() forever
            try:
                buf = []  # list of single frames awaiting a full batch
                for f in frames:
                    if isinstance(f, dict):
                        f = {k: np.asarray(v) for k, v in f.items()
                             if k in SERVE_WIRE_KEYS}
                    else:
                        f = np.asarray(f)
                    if item_arr(f).ndim == 4:  # pre-batched
                        # oversize items (a loader batched larger than
                        # the engine, e.g. a fixed-batch artifact whose
                        # baked size is smaller than --serve-batch) fall
                        # through to the re-chunk path below
                        nb = item_arr(f).shape[0]
                        if not buf and nb in (self.batch_size, 0):
                            if nb:
                                q_in.put(f)  # fast path: no copies
                            continue
                        buf.extend(_item_rows(f))  # ragged: re-chunk
                    else:
                        buf.append(f)
                    while len(buf) >= self.batch_size:
                        q_in.put(_item_stack(buf[: self.batch_size]))
                        buf = buf[self.batch_size:]
                if buf:
                    q_in.put(_item_stack(buf))
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q_in.put(e)
            else:
                q_in.put(_SENTINEL)

        t = threading.Thread(target=batcher, daemon=True)
        t.start()
        inflight = max(1, inflight)
        pending: deque = deque()

        def drain_one():
            out = self._materialize(pending.popleft())
            n = out["depth"].shape[0]
            for i in range(n):
                yield {k: v[i] for k, v in out.items()}

        while True:
            item = q_in.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                while pending:  # finish in-flight work before raising
                    yield from drain_one()
                raise item
            pending.append(self._dispatch(item))
            if len(pending) >= inflight:
                yield from drain_one()
        while pending:
            yield from drain_one()

    def reset_stats(self) -> None:
        """Zero the serving counters/timers (keeps the compiled forward
        — benchmarking different stream settings on one engine)."""
        self.frames_served = 0
        self.batches_served = 0
        self._t_start = None
        self._batch_times = []

    def stats(self) -> Dict[str, float]:
        elapsed = (
            time.perf_counter() - self._t_start if self._t_start else 0.0
        )
        lat = {}
        if self._batch_times:
            bt = np.asarray(self._batch_times) * 1000.0
            lat = {
                "batch_ms_p50": float(np.percentile(bt, 50)),
                "batch_ms_p95": float(np.percentile(bt, 95)),
            }
        return {
            **lat,
            "frames": float(self.frames_served),
            "batches": float(self.batches_served),
            "elapsed_s": elapsed,
            "frames_per_sec": (
                self.frames_served / elapsed if elapsed > 0 else 0.0
            ),
        }


def serving_mesh(
    data_parallel: int = 1, spatial_parallel: int = 1
):
    """Build a serving mesh (data x sp) over the first
    data_parallel*spatial_parallel devices, or None for single-device.

    Inference is exact under ANY sp layout (only conv GRADIENTS hit the
    GSPMD bug documented in parallel/mesh.py), so serving may combine
    batch and spatial sharding freely: throughput scales over ``data``,
    single-frame latency drops over ``sp``."""
    n = data_parallel * spatial_parallel
    if n <= 1:
        return None, "data", None
    from camradepth_tpu.config import MeshConfig
    from camradepth_tpu.parallel.mesh import create_mesh

    mc = MeshConfig(data_parallel=data_parallel, fsdp_parallel=1,
                    spatial_parallel=spatial_parallel)
    devices = jax.devices()
    if n > len(devices):
        raise ValueError(
            f"serving mesh {data_parallel}x{spatial_parallel} needs {n} "
            f"devices, have {len(devices)}"
        )
    mesh = create_mesh(mc, devices[:n])
    sp_axis = mc.sp_axis if spatial_parallel > 1 else None
    return mesh, mc.data_axis, sp_axis


def load_engine(
    cfg: ExperimentConfig,
    checkpoint: str,
    batch_size: int = 8,
    mesh=None,
    batch_axis: str = "data",
    spatial_axis: Optional[str] = None,
    wire_plan=None,
) -> DepthEngine:
    """Engine from an Orbax checkpoint, a reference .pth, or a
    StableHLO serving artifact (``cli export --format stablehlo``);
    pass a mesh (e.g. from ``serving_mesh``) for multi-chip serving,
    or a ``wire_plan`` (data/wire.py) for compact wire requests
    (checkpoint sources only — an artifact's partitioning AND input
    signature are fixed at export time)."""
    from camradepth_tpu.interop.hlo_export import artifact_engine, is_artifact

    if is_artifact(checkpoint):
        if mesh is not None:
            raise ValueError(
                "StableHLO artifacts cannot be served on a mesh — their "
                "partitioning is fixed at export time; pass an Orbax/"
                ".pth checkpoint for --data-parallel/--spatial-parallel"
            )
        if wire_plan is not None:
            raise ValueError(
                "StableHLO artifacts bake a dense input signature — "
                "wire serving needs an Orbax/.pth checkpoint"
            )
        engine = artifact_engine(checkpoint, cfg, batch_size=batch_size)
        engine.warmup()
        return engine
    from camradepth_tpu.cli import _load_params

    model, params = _load_params(cfg, checkpoint)
    engine = DepthEngine(
        cfg, model, params, batch_size=batch_size, mesh=mesh,
        batch_axis=batch_axis, spatial_axis=spatial_axis,
        wire_plan=wire_plan,
    )
    engine.warmup()
    return engine
