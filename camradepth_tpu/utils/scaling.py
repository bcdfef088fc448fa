"""Analytic multi-chip scaling projection (data-parallel training).

The reference cannot answer "what do I get from more devices?" beyond
plugging more GPUs into ``nn.DataParallel``. For pod planning we answer
it the scaling-book way (jax-ml.github.io/scaling-book): per optimizer
step, data-parallel training overlaps

  T_compute(N) — the backward/forward math, which shrinks with more
      chips at fixed GLOBAL batch (strong scaling) or stays constant at
      fixed PER-CHIP batch (weak scaling), and
  T_comm(N)    — the gradient all-reduce, ``2 * grad_bytes * (N-1)/N``
      over the ICI axis bandwidth (bidirectional ring; reduce-scatter +
      all-gather halves each direction, hence the single factor 2).

XLA overlaps the all-reduce with the tail of the backward pass, so the
projected step time is ``max(T_compute, T_comm)`` (an optimistic bound)
and the no-overlap pessimistic bound is their sum; reality sits between.
Everything here is an ANALYTIC PROJECTION anchored on one measured
single-chip step time — this machine has ONE chip, so multi-chip
numbers are not measurable (PARITY.md marks them the same way).

v5e ICI: 2D torus, 4 links/chip, ~45 GB/s one-way per link
(scaling-book v5e table). A 1D ring all-reduce rides ONE axis =
2 links bidirectional => ~90 GB/s; sharding gradients over both torus
axes doubles that. We use the single-axis figure (conservative) and
note DCN (multi-host pods, ~25 GB/s/host) separately.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

V5E_ICI_AXIS_BW = 2 * 45e9     # bytes/s, bidirectional, one torus axis
DCN_HOST_BW = 25e9             # bytes/s per host, typical pod DCN
GRAD_BYTES_PER_PARAM = 4       # fp32 gradient all-reduce


@dataclass
class ScalingPoint:
    n_chips: int
    t_compute_s: float
    t_comm_s: float

    @property
    def t_overlap_s(self) -> float:          # optimistic (full overlap)
        return max(self.t_compute_s, self.t_comm_s)

    @property
    def t_serial_s(self) -> float:           # pessimistic (no overlap)
        return self.t_compute_s + self.t_comm_s

    @property
    def efficiency(self) -> float:
        """Fraction of linear speedup retained (overlapped model)."""
        return self.t_compute_s / self.t_overlap_s


def project_dp_scaling(
    param_count: int,
    step_time_1chip_s: float,
    n_chips: Sequence[int] = (1, 2, 4, 8, 16, 32),
    mode: str = "weak",
    axis_bw: float = V5E_ICI_AXIS_BW,
) -> List[ScalingPoint]:
    """Project data-parallel step times from one measured single-chip
    step.

    mode="weak": per-chip batch fixed (global batch grows with N) —
        T_compute stays the measured step time.
    mode="strong": global batch fixed — T_compute = measured / N
        (ignores the per-chip efficiency loss of smaller batches, so it
        is a best case; the CLAUDE.md perf ledger shows small-batch
        convs space-to-batch on this architecture).
    """
    if mode not in ("weak", "strong"):
        raise ValueError(f"mode must be weak|strong, got {mode!r}")
    grad_bytes = float(param_count) * GRAD_BYTES_PER_PARAM
    points = []
    for n in n_chips:
        if n < 1:
            raise ValueError("n_chips must be >= 1")
        t_compute = (
            step_time_1chip_s if mode == "weak" else step_time_1chip_s / n
        )
        t_comm = (
            0.0 if n == 1 else 2.0 * grad_bytes * (n - 1) / n / axis_bw
        )
        points.append(ScalingPoint(n, t_compute, t_comm))
    return points


def format_projection(
    points: List[ScalingPoint],
    mode: str,
    param_count: int,
    frames_per_step: Optional[int] = None,
) -> str:
    """Human-readable table; every number labeled as a projection."""
    head = (
        f"data-parallel {mode}-scaling PROJECTION "
        f"({param_count / 1e6:.1f}M params, fp32 grads, "
        f"ICI axis {V5E_ICI_AXIS_BW / 1e9:.0f} GB/s; "
        "overlap = max(compute, all-reduce), serial = sum; "
        "measured only at N=1)"
    )
    lines = [head,
             f"{'chips':>5} {'compute ms':>11} {'all-reduce ms':>13} "
             f"{'step ms (overlap..serial)':>26} {'eff':>5}"
             + ("  fps" if frames_per_step else "")]
    for p in points:
        fps = ""
        if frames_per_step:
            per_step = frames_per_step * (
                p.n_chips if mode == "weak" else 1
            )
            fps = f"  {per_step / p.t_overlap_s:.0f}"
        lines.append(
            f"{p.n_chips:>5} {p.t_compute_s * 1e3:>11.1f} "
            f"{p.t_comm_s * 1e3:>13.2f} "
            f"{p.t_overlap_s * 1e3:>12.1f}..{p.t_serial_s * 1e3:<12.1f} "
            f"{p.efficiency:>5.0%}{fps}"
        )
    return "\n".join(lines)
