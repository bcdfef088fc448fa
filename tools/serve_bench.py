"""Serving throughput/latency harness for the streaming DepthEngine.

  python tools/serve_bench.py                      # flagship, TPU
  python tools/serve_bench.py --tpu-decoder        # TPU variant
  python tools/serve_bench.py --tiny --frames 8    # CPU smoke (tests)

Streams synthetic frames through ``DepthEngine.infer_stream`` at each
requested ``--inflight`` depth and prints ONE JSON line per setting:
end-to-end fps plus p50/p95 per-batch latency (dispatch ->
materialization). inflight=1 serializes device compute with output
D2H/conversion; inflight>=2 overlaps them (the device-level double
buffering) — the fps delta is the measured value of the pipeline.

Timing is honest on the axon-tunneled TPU: the engine syncs via
np.asarray of the outputs (block_until_ready does not reflect device
completion here, CLAUDE.md), and fps is wall-clock over the whole
stream including host-side stacking.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_engine(args):
    import jax
    import jax.numpy as jnp

    from camradepth_tpu.config import preset, tiny_test_config
    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.serving import DepthEngine

    if args.tiny:
        cfg = tiny_test_config()
    else:
        cfg = preset(args.preset)
        if args.tpu_decoder:
            import dataclasses

            cfg = cfg.replace(
                model=dataclasses.replace(cfg.model, tpu_decoder=True)
            )
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    dummy = jnp.zeros((1, h, w, cfg.model.input_channels), jnp.float32)
    init = lambda k: model.init({"params": k}, dummy,
                                deterministic=True)["params"]
    # jitted init: eager per-op dispatch through the tunnel takes
    # minutes for the flagship (CLAUDE.md)
    params = jax.jit(init)(jax.random.PRNGKey(0))
    return cfg, DepthEngine(cfg, model, params, batch_size=args.batch)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="base")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny test config (CPU smoke)")
    ap.add_argument("--tpu-decoder", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--inflight", default="1,2",
                    help="comma-separated in-flight depths to compare")
    ap.add_argument("--wire", action="store_true",
                    help="ALSO measure compact wire serving (uint8 "
                         "image + COO radar decoded on device, "
                         "serving.py wire_plan): same stream shape, "
                         "~8x fewer H2D bytes/frame — the measured "
                         "value of the wire codec on the serving path")
    ap.add_argument("--radar-cap", type=int, default=4096,
                    help="wire radar point cap per frame (the flagship "
                         "plan probes the dataset; the bench picks a "
                         "representative cap, ~1.5%% of pixels)")
    ap.add_argument("--concurrent", type=int, default=0,
                    help="ALSO measure cross-request micro-batching: N "
                         "client threads each stream batch-1 requests "
                         "through a BatchAggregator (serving_http.py), "
                         "vs the serial batch-1 baseline — the measured "
                         "value of request coalescing under load")
    args = ap.parse_args(argv)

    cfg, engine = build_engine(args)
    h, w = cfg.model.img_size
    c = cfg.model.input_channels
    rng = np.random.default_rng(0)
    frames = [rng.standard_normal((h, w, c)).astype(np.float32)
              for _ in range(args.frames)]
    engine.warmup()

    for inflight in (int(s) for s in args.inflight.split(",")):
        engine.reset_stats()
        t0 = time.perf_counter()
        n = sum(1 for _ in engine.infer_stream(iter(frames),
                                               inflight=inflight))
        wall = time.perf_counter() - t0
        stats = engine.stats()
        print(json.dumps({
            "inflight": inflight,
            "frames": n,
            "batch": args.batch,
            "wall_s": round(wall, 4),
            "fps_end_to_end": round(n / wall, 2),
            "batch_ms_p50": round(stats.get("batch_ms_p50", 0.0), 2),
            "batch_ms_p95": round(stats.get("batch_ms_p95", 0.0), 2),
            "variant": ("tiny" if args.tiny else
                        "tpu_decoder" if args.tpu_decoder else
                        cfg.name),
        }))

    if args.wire:
        from camradepth_tpu.data.wire import WirePlan
        from camradepth_tpu.serving import DepthEngine

        plan = WirePlan(radar_cap=args.radar_cap, gt_cap=0,
                        n_radar_ch=c - 3)
        wire_engine = DepthEngine(cfg, engine.model, engine.params,
                                  batch_size=args.batch, wire_plan=plan)
        npts = max(1, args.radar_cap // 4)  # plans pad ~4x over density

        def wire_frame(i):
            r = np.random.default_rng(i)
            idx = np.zeros(args.radar_cap, np.int32)
            idx[:npts] = r.choice(h * w, size=npts, replace=False)
            val = np.zeros((args.radar_cap, c - 3), np.float32)
            val[:npts] = r.random((npts, c - 3), dtype=np.float32)
            return {
                "image_u8": r.integers(0, 256, (h, w, 3), dtype=np.uint8),
                "radar_idx": idx,
                "radar_val": val,
            }

        wire_frames = [wire_frame(i) for i in range(args.frames)]
        wire_bytes = sum(v.nbytes for v in wire_frames[0].values())
        dense_bytes = frames[0].nbytes
        wire_engine.warmup()
        for inflight in (int(s) for s in args.inflight.split(",")):
            wire_engine.reset_stats()
            t0 = time.perf_counter()
            n = sum(1 for _ in wire_engine.infer_stream(
                iter(wire_frames), inflight=inflight))
            wall = time.perf_counter() - t0
            stats = wire_engine.stats()
            print(json.dumps({
                "mode": "wire",
                "inflight": inflight,
                "frames": n,
                "batch": args.batch,
                "wall_s": round(wall, 4),
                "fps_end_to_end": round(n / wall, 2),
                "batch_ms_p50": round(stats.get("batch_ms_p50", 0.0), 2),
                "batch_ms_p95": round(stats.get("batch_ms_p95", 0.0), 2),
                "h2d_bytes_per_frame": wire_bytes,
                "dense_bytes_per_frame": dense_bytes,
                "variant": ("tiny" if args.tiny else
                            "tpu_decoder" if args.tpu_decoder else
                            cfg.name),
            }))

    if args.concurrent > 0:
        import threading

        from camradepth_tpu.serving_http import BatchAggregator

        variant = ("tiny" if args.tiny else
                   "tpu_decoder" if args.tpu_decoder else cfg.name)
        per_client = max(1, args.frames // args.concurrent)

        # serial baseline: one request per device call. The engine runs
        # ONE fixed-shape program (batch padded internally), so a lone
        # batch-1 request pays the whole batch's compute for 1 useful
        # frame — aggregation's win is filling those padded slots with
        # real concurrent requests.
        engine.infer_batch(frames[0][None])  # warm path
        t0 = time.perf_counter()
        for i in range(min(8, args.frames)):
            engine.infer_batch(frames[i][None])
        serial_fps = min(8, args.frames) / (time.perf_counter() - t0)

        # count device rounds to report the achieved coalescing factor
        rounds = []
        real_infer = engine.infer_batch

        def counting_infer(x):
            rounds.append(x.shape[0])
            return real_infer(x)

        engine.infer_batch = counting_infer
        agg = BatchAggregator(engine, max_wait_ms=5.0)
        try:
            errs = []

            def client(k):
                try:
                    for i in range(per_client):
                        agg.infer(frames[(k * per_client + i)
                                         % len(frames)][None])
                except Exception as e:  # pragma: no cover - surfaced below
                    errs.append(e)

            threads = [threading.Thread(target=client, args=(k,))
                       for k in range(args.concurrent)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if errs:
                raise errs[0]
            n = per_client * args.concurrent
            print(json.dumps({
                "mode": "concurrent_batch1_aggregated",
                "clients": args.concurrent,
                "frames": n,
                "wall_s": round(wall, 4),
                "fps_aggregated": round(n / wall, 2),
                "fps_serial_one_request_per_call": round(serial_fps, 2),
                "speedup_vs_serial": round(n / wall / serial_fps, 2),
                "device_rounds": len(rounds),
                "mean_device_batch": round(float(np.mean(rounds)), 2),
                "variant": variant,
            }))
        finally:
            agg.close()
            engine.infer_batch = real_infer
    return 0


if __name__ == "__main__":
    sys.exit(main())
