"""Analytic comm/compute model for DP weak scaling on TPU pod slices.

The bundled environment has one physical chip, so multi-chip scaling cannot
be *measured* here (SCALING.json's virtual-CPU numbers validate the program,
not silicon). This module makes the pod-slice run turnkey by MODELING the
per-step cost breakdown from first principles -- the scaling-book recipe:

  step_time(n) = max(compute_time, hbm_time) + allreduce_time(n)
  allreduce_time(n) = 2 * (n - 1) / n * grad_bytes / ici_bw   (ring, bidir)

with compute/HBM taken from XLA's own compiled cost analysis
(``jitted.lower(...).compile().cost_analysis()``), so the model reflects the
real program, not hand counts. ``predict_weak_scaling`` emits per-n expected
efficiency; tools/bench_scaling.py writes it alongside the measured numbers
so a real pod run has the reference curve in the same JSON.

v5e chip constants (per chip): 197 bf16 TFLOP/s / 98.5 f32, 819 GB/s HBM,
one 3D-torus link pair ~ 2 * 45 GB/s usable ICI per axis (conservative
single-axis ring assumption for a v5e-8 slice).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

V5E = {
    "flops_f32": 98.5e12 / 2,  # MXU f32 is half the bf16 rate
    "flops_bf16": 197e12 / 2,  # de-rated 50%: realistic sustained MFU ceiling
    "hbm_gbps": 819e9,
    "ici_gbps": 90e9,  # bidirectional ring bandwidth on one torus axis
}


def program_costs(jitted_fn, *args, **kwargs) -> Dict[str, float]:
    """FLOPs + HBM bytes of a compiled step, from XLA's cost analysis."""
    compiled = jax.jit(jitted_fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "hbm_bytes": float(ca.get("bytes accessed", 0.0)),
    }


def grad_bytes_of(params: Any) -> int:
    return sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params))


def predict_weak_scaling(
    flops: float,
    hbm_bytes: float,
    grad_bytes: float,
    n_devices: int,
    chip: Optional[Dict[str, float]] = None,
    dtype: str = "f32",
) -> Dict[str, float]:
    """Expected per-step breakdown + weak-scaling efficiency at n devices.

    Weak scaling: per-device batch fixed, so per-device compute/HBM time is
    constant in n while the ring allreduce adds 2(n-1)/n * grad_bytes / ici.
    """
    chip = chip or V5E
    peak = chip["flops_bf16"] if dtype == "bf16" else chip["flops_f32"]
    t_compute = flops / peak
    t_hbm = hbm_bytes / chip["hbm_gbps"]
    t_local = max(t_compute, t_hbm)
    t_comm = 0.0
    if n_devices > 1:
        t_comm = 2.0 * (n_devices - 1) / n_devices * grad_bytes / chip["ici_gbps"]
    t_step = t_local + t_comm
    return {
        "n_devices": n_devices,
        "compute_ms": t_compute * 1e3,
        "hbm_ms": t_hbm * 1e3,
        "allreduce_ms": t_comm * 1e3,
        "step_ms": t_step * 1e3,
        "comm_fraction": t_comm / t_step if t_step else 0.0,
        "weak_scaling_efficiency": t_local / t_step if t_step else 1.0,
    }
