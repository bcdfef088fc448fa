"""Scalar metric logging: TensorBoard events (when available) + JSONL.

Replaces the reference's SummaryWriter usage (runner.py:116, 253-261,
336-344) — scalars land in TensorBoard event files when the `tensorboard`
package is importable, and always in a plain `metrics.jsonl` so headless
runs keep observability. OSErrors are tolerated like the reference."""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: str | Path):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from tensorboard.summary.writer.event_file_writer import (
                EventFileWriter,
            )
            from tensorboard.compat.proto.summary_pb2 import Summary
            from tensorboard.compat.proto.event_pb2 import Event

            self._tb = EventFileWriter(str(self.log_dir))
            self._Summary = Summary
            self._Event = Event
        except Exception:
            self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        try:
            self._jsonl.write(
                json.dumps(
                    {"tag": tag, "value": float(value), "step": int(step),
                     "time": time.time()}
                )
                + "\n"
            )
            self._jsonl.flush()
            if self._tb is not None:
                s = self._Summary(
                    value=[self._Summary.Value(tag=tag,
                                               simple_value=float(value))]
                )
                e = self._Event(summary=s, step=int(step),
                                wall_time=time.time())
                self._tb.add_event(e)
        except OSError:
            # tolerated like the reference (runner.py:260-261)
            pass

    def scalars(self, values: Dict[str, float], step: int,
                prefix: str = "") -> None:
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def close(self) -> None:
        try:
            self._jsonl.close()
            if self._tb is not None:
                self._tb.close()
        except OSError:
            pass


class NullWriter:
    """Metric sink for non-primary processes in multi-host runs: only
    process 0 owns the run dir's events/JSONL files (single-writer)."""

    log_dir = None

    def scalar(self, tag, value, step) -> None:
        pass

    def scalars(self, values, step, prefix: str = "") -> None:
        pass

    def close(self) -> None:
        pass


def create_run_dir(output_dir: str | Path, arch_name: str,
                   run_name: Optional[str]) -> Path:
    """Auto-indexed run directory Output/<arch>/<run>/<n> (runner.py:98-113)."""
    out = Path(output_dir) / arch_name
    out.mkdir(parents=True, exist_ok=True)
    base = out / (run_name or _next_index(out))
    base.mkdir(parents=True, exist_ok=True)
    run = base / _next_index(base)
    run.mkdir(parents=True, exist_ok=True)
    return run


def _next_index(path: Path) -> str:
    nums = [int(d.name) for d in path.iterdir()
            if d.is_dir() and d.name.isdigit()] or [0]
    return str(max(nums) + 1)
