"""Per-kernel roofline accounting for the mandated TPU kernels.

The north star requires "per-chip roofline analysis of the disparity and BA
kernels" (BASELINE.json:5, SURVEY.md §6). For each kernel this module pairs
an analytic work model (bytes moved, FLOPs/int-ops) with a measured runtime
and reports achieved vs peak bandwidth/compute and which roof binds.

Peak numbers are per TPU v5e chip (the hardware in this environment):
HBM ~819 GB/s, MXU ~197 TFLOP/s bf16 (~49 TFLOP/s fp32), VPU vector ops
~3.9 Tops/s fp32 (8x128 lanes x 4 ALUs x ~940 MHz).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import numpy as np

TPU_V5E_PEAKS = {
    "hbm_gbps": 819.0,
    "mxu_tflops_bf16": 197.0,
    "mxu_tflops_f32": 49.0,
    "vpu_tops_f32": 3.9,
}


@dataclass
class RooflinePoint:
    name: str
    bytes_accessed: float
    flops: float                  # MXU-eligible FLOPs
    vector_ops: float             # VPU elementwise/min ops
    seconds: float
    notes: str = ""

    @property
    def arithmetic_intensity(self) -> float:
        return (self.flops + self.vector_ops) / max(self.bytes_accessed, 1.0)

    def report(self, peaks: Optional[Dict[str, float]] = None) -> Dict:
        peaks = peaks or TPU_V5E_PEAKS
        if not np.isfinite(self.seconds) or self.seconds <= 0:
            # measure_amortized could not resolve the kernel above the
            # dispatch noise floor: publish the fact, never a fake number
            return {"kernel": self.name, "invalid":
                    "kernel too fast to resolve above dispatch noise",
                    "notes": self.notes}
        bw = self.bytes_accessed / self.seconds / 1e9
        mxu = self.flops / self.seconds / 1e12
        vpu = self.vector_ops / self.seconds / 1e12
        bw_frac = bw / peaks["hbm_gbps"]
        mxu_frac = mxu / peaks["mxu_tflops_bf16"]
        vpu_frac = vpu / peaks["vpu_tops_f32"]
        bound = max(
            ("hbm", bw_frac), ("mxu", mxu_frac), ("vpu", vpu_frac),
            key=lambda kv: kv[1],
        )
        if bound[1] > 1.0:
            # >100% of a hardware roof is by definition a measurement failure
            return {"kernel": self.name, "invalid":
                    f"measured {100.0 * bound[1]:.0f}% of {bound[0]} peak — "
                    "impossible; timing below the resolvable floor",
                    "time_ms": self.seconds * 1e3, "notes": self.notes}
        return {
            "kernel": self.name,
            "time_ms": self.seconds * 1e3,
            "bytes": self.bytes_accessed,
            "achieved_gbps": bw,
            "achieved_mxu_tflops": mxu,
            "achieved_vpu_tops": vpu,
            "pct_hbm_peak": 100.0 * bw_frac,
            "pct_mxu_peak": 100.0 * mxu_frac,
            "pct_vpu_peak": 100.0 * vpu_frac,
            "binding_roof": bound[0],
            "pct_of_binding_roof": 100.0 * bound[1],
            "arithmetic_intensity": self.arithmetic_intensity,
            "notes": self.notes,
        }


def measure(fn: Callable, args, n: int = 5) -> float:
    """Median wall-clock of fn(*args) with full blocking (post-warmup).

    Includes one dispatch's host->device round trip — on a relay-attached
    chip that is tens of ms. Use ``measure_amortized`` for kernel-quality
    numbers.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def measure_amortized(fn: Callable, args, inner: int = 8, n: int = 3,
                      max_inner: int = 512) -> float:
    """Per-invocation seconds of ``fn`` with dispatch overhead removed.

    Runs ``fn`` 1x and ``inner``x inside single jitted ``lax.scan`` loops
    (each iteration's output feeds a negligible perturbation of the next
    iteration's input, so XLA cannot elide or overlap the repeats), times
    both with a forced host fetch (``block_until_ready`` can return early
    through the relay), and reports the slope (t_inner - t_1)/(inner - 1).

    Self-validating: the relay round trip puts tens of ms of noise on both
    timings, so a slope taken from an N-x run that is not measurably longer
    than the 1-x run is garbage (BENCH_r02 published a 13 us kernel at
    192,047% of HBM peak this way). If t_N < 1.3 * t_1, ``inner`` is raised
    to ``max_inner`` and the measurement retried once; if the margin is
    still not met the result is ``nan`` — callers must treat nan as
    "too fast to resolve through this link" and refuse to publish a roofline
    row from it.
    """
    import jax.numpy as jnp

    def make(length: int):
        @jax.jit
        def run(*a):
            def body(carry, _):
                perturbed, used = [], False
                for x in a:
                    if not used and hasattr(x, "dtype") and x.dtype == jnp.float32:
                        perturbed.append(x + carry)
                        used = True
                    else:
                        perturbed.append(x)
                out = fn(*perturbed)
                # reduce over EVERY output leaf: a single-element probe would
                # let XLA dead-code-eliminate the rest of the computation
                total = sum(
                    leaf.astype(jnp.float32).sum()
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                return total * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
            return c

        return run

    one = make(1)
    float(one(*args))  # compile
    while True:
        many = make(inner)
        float(many(*args))  # compile
        t1s, tns = [], []
        for _ in range(n):
            t0 = time.perf_counter(); float(one(*args)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(many(*args)); tns.append(time.perf_counter() - t0)
        t1, tn = float(np.median(t1s)), float(np.median(tns))
        if tn > 1.3 * t1 and tn > t1:
            return (tn - t1) / (inner - 1)
        if inner >= max_inner:
            return float("nan")
        inner = max_inner


# --------------------------------------------------------------------------
# Analytic work models for the mandated kernels
# --------------------------------------------------------------------------

def sgm_aggregation_model(h: int, w: int, d: int, num_paths: int,
                          seconds: float, itemsize: int = 2) -> RooflinePoint:
    """SGM path aggregation (fused multi-direction Pallas kernel,
    stereo/sgm_pallas.py).

    Memory is the PROBLEM's lower bound — read the cost volume once, write
    the aggregation once (2 passes x itemsize); the implementation does ~15
    passes (h-scan + seeded tri-scan + 2 transposes), so pct_of_binding_roof
    measures distance to speed-of-light, not to our own traffic. Compute:
    per cell per direction ~10 VPU ops (2 shifted adds, 5 mins, 1 sub,
    1 add, carry shift) + the D-wide min reduction amortized ~1 op/cell —
    at D=64, L=512 the kernel is VPU-bound, not HBM-bound.
    """
    cells = h * w * d
    bytes_accessed = 2 * cells * itemsize
    vector_ops = num_paths * cells * 11
    return RooflinePoint(
        name=f"sgm_aggregation_{num_paths}path_{h}x{w}x{d}",
        bytes_accessed=bytes_accessed, flops=0.0, vector_ops=vector_ops,
        seconds=seconds,
        notes="fused v+diag lane-shift scan; bytes = problem lower bound",
    )


def matching_model(ka: int, kb: int, bits: int, seconds: float) -> RooflinePoint:
    """Descriptor matching as bipolar matmul (features/match.py)."""
    flops = 2.0 * ka * kb * bits
    bytes_accessed = (ka * bits + kb * bits) * 2 + ka * kb * 4
    return RooflinePoint(
        name=f"hamming_matmul_{ka}x{kb}x{bits}",
        bytes_accessed=bytes_accessed, flops=flops, vector_ops=ka * kb * 4,
        seconds=seconds, notes="MXU bf16 matmul + top-k",
    )


def ba_schur_model(w_kf: int, l_lm: int, n_obs: int, gn_iters: int,
                   seconds: float) -> RooflinePoint:
    """Dense-block Schur GN solve (ba/schur.py)."""
    per_iter_flops = (
        n_obs * (2 * 18 * 6 + 2 * 9 * 3 + 2 * 18 * 3 + 18 + 9)  # JtJ blocks
        + l_lm * 40                                # 3x3 inverses
        + w_kf * l_lm * (2 * 18 * 3 + 2 * 18 * 6 * w_kf / max(w_kf, 1))
        + w_kf * l_lm * 6 * 3 * 6 * w_kf * 2       # S coupling einsum
        + (6 * w_kf) ** 3 / 3                      # Cholesky
    )
    flops = gn_iters * per_iter_flops
    bytes_accessed = gn_iters * (
        n_obs * (4 * 3 * 3 + 4 * 2) + w_kf * l_lm * 18 * 4 * 3 + l_lm * 9 * 4 * 2
    )
    return RooflinePoint(
        name=f"ba_schur_w{w_kf}_l{l_lm}_n{n_obs}_it{gn_iters}",
        bytes_accessed=bytes_accessed, flops=flops, vector_ops=0.0,
        seconds=seconds, notes="dense-block Schur: einsum assembly + Cholesky",
    )


def voxel_model(n_points: int, seconds: float) -> RooflinePoint:
    """Sort + segment-reduce voxel filter (mapping/voxel.py)."""
    log_n = max(1.0, np.log2(max(n_points, 2)))
    bytes_accessed = n_points * 4 * (2 * log_n * 0.5 + 10)
    return RooflinePoint(
        name=f"voxel_downsample_{n_points}",
        bytes_accessed=bytes_accessed, flops=0.0,
        vector_ops=n_points * log_n * 4,
        seconds=seconds, notes="two stable sorts dominate (bitonic on TPU)",
    )
