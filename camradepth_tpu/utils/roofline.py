"""Analytic attainable-roofline model for the inference graph.

Answers "how fast COULD this architecture run on this chip?" — the
per-frame floor the VERDICT asks bench.py to prove against.

Method: trace the forward with ``jax.make_jaxpr`` and walk every
equation (recursing through pjit/scan/remat sub-jaxprs), collecting

- ``conv_general_dilated`` / ``dot_general`` — the MXU ops. Each one's
  time floor is the max of
    * padded-compute: ``2 * M̂ * K̂ * N̂ / peak`` where the matmul view
      is [M = batch*out-spatial, K = kh*kw*Cin] x [K, N = Cout], with
      N̂ = ceil(N/128)*128 (output channels ride the 128 MXU lanes),
      K̂ = ceil(K/8)*8 (reduction rides sublanes; measured on v5e the
      du4 conv with K=296 runs at 99% K-efficiency, i.e. granularity 8,
      not 128 — CLAUDE.md perf ledger), M̂ = ceil(M/8)*8;
    * memory: (input + weight + output bytes) / HBM bandwidth.
- everything else — elementwise chains, norms, resizes, reductions —
  is VPU/bandwidth work; XLA fuses these into producers/consumers, so
  per-op byte counting would overcount massively. Their floor is taken
  as the compiled executable's total "bytes accessed" (post-fusion HLO
  cost analysis) minus the conv bytes already counted, divided by HBM
  bandwidth.

The result is a per-op-class table plus ``attainable_ms`` /
``roofline_pct = attainable_ms / measured_ms``. This is a FLOOR model:
real schedules also pay VMEM traffic, layout changes and kernel launch
overheads, so 100% is unreachable; >=90% means the schedule is within
noise of the architecture's practical optimum on this chip.

v5e numbers: 197 TFLOP/s bf16 (an FLOP = one mul or add, so a MAC
counts 2), HBM ~819 GB/s.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

V5E_PEAK_FLOPS = 197e12
V5E_HBM_BW = 819e9
LANES = 128
SUBLANES = 8


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclass
class MatmulOp:
    kind: str                 # "conv" | "dot" | "dwconv"
    m: int                    # batch * output spatial positions
    k: int                    # reduction size
    n: int                    # output features
    bytes: int                # in + weights + out
    dtype_bits: int
    bw_only: bool = False     # depthwise: VPU applies taps in-register

    @property
    def flops(self) -> float:
        return 2.0 * self.m * self.k * self.n

    @property
    def padded_flops(self) -> float:
        # Reduction-dominated matmuls (weight-gradient convs in
        # training graphs: K = batch*image positions in the millions,
        # output 3x3xCinxCout only thousands of elements) are
        # layout-free for the compiler: the output is tiny, so it can
        # transpose/accumulate whichever way packs the MXU without a
        # meaningful relayout cost — the N->128 lane padding that binds
        # activation convs (whose NHWC outputs must keep C minor) does
        # not bind here. Floor them at pure peak.
        if self.k >= 8 * max(self.m, self.n):
            return self.flops
        return (
            2.0
            * _ceil_to(self.m, SUBLANES)
            * _ceil_to(self.k, SUBLANES)
            * _ceil_to(self.n, LANES)
        )

    @property
    def attainable_tflops(self) -> float:
        return V5E_PEAK_FLOPS * self.flops / self.padded_flops / 1e12

    @property
    def t_floor(self) -> float:
        if self.bw_only:
            return self.bytes / V5E_HBM_BW
        return max(self.padded_flops / V5E_PEAK_FLOPS,
                   self.bytes / V5E_HBM_BW)


@dataclass
class Roofline:
    matmuls: List[MatmulOp] = field(default_factory=list)
    total_bytes: float = 0.0     # post-fusion, from HLO cost analysis
    total_flops: float = 0.0     # from HLO cost analysis

    @property
    def conv_bytes(self) -> float:
        return float(sum(op.bytes for op in self.matmuls))

    @property
    def other_bytes(self) -> float:
        return max(0.0, self.total_bytes - self.conv_bytes)

    @property
    def t_matmul_floor(self) -> float:
        return float(sum(op.t_floor for op in self.matmuls))

    @property
    def t_other_floor(self) -> float:
        return self.other_bytes / V5E_HBM_BW

    @property
    def attainable_s(self) -> float:
        return self.t_matmul_floor + self.t_other_floor

    def report(self) -> str:
        lines = [
            f"{'kind':<6} {'M':>9} {'K':>5} {'N':>5} "
            f"{'GFLOP':>8} {'attn TF/s':>9} {'floor us':>9}"
        ]
        for op in sorted(self.matmuls, key=lambda o: -o.t_floor)[:20]:
            lines.append(
                f"{op.kind:<6} {op.m:>9} {op.k:>5} {op.n:>5} "
                f"{op.flops / 1e9:>8.2f} {op.attainable_tflops:>9.0f} "
                f"{op.t_floor * 1e6:>9.1f}"
            )
        lines.append(
            f"matmul floor {self.t_matmul_floor * 1e3:.3f} ms + "
            f"fused-elementwise floor {self.t_other_floor * 1e3:.3f} ms "
            f"({self.other_bytes / 1e9:.2f} GB @ 819 GB/s) = "
            f"attainable {self.attainable_s * 1e3:.3f} ms"
        )
        return "\n".join(lines)


def _spatial(shape, dims) -> Tuple[int, ...]:
    return tuple(shape[d] for d in dims)


def _walk_jaxpr(jaxpr, out: List[MatmulOp]) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            lhs = eqn.invars[0].aval
            rhs = eqn.invars[1].aval
            outv = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            fgc = eqn.params.get("feature_group_count", 1)
            bgc = eqn.params.get("batch_group_count", 1)
            bits = np.dtype(lhs.dtype).itemsize * 8
            batch = lhs.shape[dn.lhs_spec[0]]
            cin = lhs.shape[dn.lhs_spec[1]]
            cout = outv.shape[dn.out_spec[1]]
            out_sp = _spatial(outv.shape, dn.out_spec[2:])
            k_sp = _spatial(rhs.shape, dn.rhs_spec[2:])
            m = batch * int(np.prod(out_sp))
            if bgc > 1:
                # grouped-over-batch conv: how AD expresses the
                # WEIGHT gradient of a depthwise conv (groups = C).
                # The dense [M,K,N] view overcounts flops by the group
                # count; per-group m divides out, and like the forward
                # depthwise op it is VPU/bandwidth work, not MXU.
                bytes_ = (
                    int(np.prod(lhs.shape)) + int(np.prod(rhs.shape))
                    + int(np.prod(outv.shape))
                ) * bits // 8
                out.append(
                    MatmulOp("dwgrad", m // bgc, int(np.prod(k_sp)) * cin,
                             cout, bytes_, bits, bw_only=True)
                )
                continue
            if fgc > 1:
                # depthwise/grouped: each group is its own tiny matmul;
                # model as VPU/bandwidth-bound (k = taps, n = 1 lane
                # utilization makes the MXU path irrelevant)
                k = int(np.prod(k_sp)) * (cin // fgc)
                n = cout // fgc
                bytes_ = (
                    int(np.prod(lhs.shape)) + int(np.prod(rhs.shape))
                    + int(np.prod(outv.shape))
                ) * bits // 8
                out.append(
                    MatmulOp("dwconv", m, k, n, bytes_, bits,
                             bw_only=True)
                )
                continue
            k = int(np.prod(k_sp)) * cin
            n = cout
            bytes_ = (
                int(np.prod(lhs.shape)) + int(np.prod(rhs.shape))
                + int(np.prod(outv.shape))
            ) * bits // 8
            out.append(MatmulOp("conv", m, k, n, bytes_, bits))
        elif name == "dot_general":
            lhs = eqn.invars[0].aval
            rhs = eqn.invars[1].aval
            outv = eqn.outvars[0].aval
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            bits = np.dtype(lhs.dtype).itemsize * 8
            k = int(np.prod([lhs.shape[d] for d in lc]))
            b = int(np.prod([lhs.shape[d] for d in lb]))
            m = int(np.prod(lhs.shape)) // max(1, k * b)
            n = int(np.prod(rhs.shape)) // max(1, k * b)
            bytes_ = (
                int(np.prod(lhs.shape)) + int(np.prod(rhs.shape))
                + int(np.prod(outv.shape))
            ) * bits // 8
            # batch dims multiply the M dimension floor-wise
            out.append(MatmulOp("dot", m * b, k, n, bytes_, bits))
        # recurse into sub-jaxprs (pjit, scan, remat, custom_vjp, cond)
        for v in eqn.params.values():
            for sub in _sub_jaxprs(v):
                _walk_jaxpr(sub, out)


def _sub_jaxprs(v: Any):
    from jax._src.core import ClosedJaxpr, Jaxpr

    if isinstance(v, ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for item in v:
            yield from _sub_jaxprs(item)


def analyze(fn, *args, compiled=None) -> Roofline:
    """Build the roofline for ``fn(*args)``.

    ``compiled``: optionally the already-compiled executable whose
    cost_analysis supplies post-fusion total bytes/flops; otherwise only
    the matmul floors are reported (other_bytes = 0).
    """
    r = Roofline()
    jaxpr = jax.make_jaxpr(fn)(*args)
    _walk_jaxpr(jaxpr.jaxpr, r.matmuls)
    if compiled is not None:
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            r.total_bytes = float(ca.get("bytes accessed", 0.0))
            r.total_flops = float(ca.get("flops", 0.0))
        except Exception:
            pass
    return r
