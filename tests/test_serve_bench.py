"""tools/serve_bench.py smoke: the serving benchmark harness runs on
the CPU backend with the tiny config, emits one valid JSON line per
inflight depth, and counts every frame (incl. ragged tails)."""

import contextlib
import importlib.util
import io
import json
from pathlib import Path


def _load_tool():
    p = Path(__file__).resolve().parents[1] / "tools" / "serve_bench.py"
    spec = importlib.util.spec_from_file_location("serve_bench", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_serve_bench_tiny_smoke():
    mod = _load_tool()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mod.main(["--tiny", "--batch", "2", "--frames", "5",
                       "--inflight", "1,2"])
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert [l["inflight"] for l in lines] == [1, 2]
    for l in lines:
        assert l["frames"] == 5  # 2+2+ragged 1, all counted
        assert l["fps_end_to_end"] > 0
        assert l["batch_ms_p50"] > 0
        assert l["variant"] == "tiny"


def test_serve_bench_concurrent_aggregation():
    """--concurrent N: batch-1 requests from N client threads coalesce
    through the BatchAggregator; every frame is answered and the
    reported device rounds account for exactly the requested frames."""
    mod = _load_tool()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mod.main(["--tiny", "--batch", "2", "--frames", "8",
                       "--inflight", "1", "--concurrent", "4"])
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    agg = [l for l in lines if l.get("mode") == "concurrent_batch1_aggregated"]
    assert len(agg) == 1
    (a,) = agg
    assert a["clients"] == 4
    assert a["frames"] == 8
    assert a["fps_aggregated"] > 0
    assert a["fps_serial_one_request_per_call"] > 0
    # device rounds * mean batch == frames served (nothing dropped,
    # nothing double-served)
    assert a["device_rounds"] * a["mean_device_batch"] == a["frames"]
    # coalescing happened at all (engine batch 2, 4 concurrent clients:
    # strictly fewer device rounds than frames)
    assert a["device_rounds"] <= a["frames"]
