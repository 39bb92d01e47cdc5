"""Pallas TPU kernel for SGM path aggregation.

The north star mandates "cost-volume SGM -> Pallas scan kernel" (SURVEY.md
§2.2). The recurrence is sequential along the scan direction, but each step
is an elementwise min-tree over an (L, D) line — pure VPU work. The lax.scan
fallback in ``sgm.py`` re-materializes the carry through XLA's while-loop
state each step; this kernel instead keeps the whole (TILE, W, D) cost block
VMEM-resident and runs the forward *and* backward directional scans in one
kernel invocation, writing their sum — so the cost volume is read from HBM
once and the aggregated output written once per direction-pair (2x fewer HBM
round trips than two separate scans, and no per-step loop overhead).

Direction mapping (all four/eight paths reuse this single kernel):
- horizontal pair: scan along axis 1 of (H, W, D)
- vertical pair:   same kernel on the (W, H, D) transpose
- diagonal pairs:  same kernel on the skewed volume (sgm._skew) transposed —
  a sheared image turns diagonals into columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9  # python float: jnp constants would be captured consts in the kernel
# VMEM budget for the (in + out) blocks. The chip's scoped-vmem limit is
# 16 MB and Mosaic double-buffers both blocks across grid steps, so the
# single-copy budget must stay under ~1/4 of that (verified on TPU v5e: a
# 10 MB single-copy budget OOMs at 32 MB scoped allocation).
_VMEM_BYTES = 4 * 1024 * 1024


def _step(carry: jnp.ndarray, cost_slice: jnp.ndarray, p1: float, p2: float) -> jnp.ndarray:
    """One SGM step on an (TA, D) line (identical math to sgm._sgm_step)."""
    min_prev = jnp.min(carry, axis=-1, keepdims=True)
    edge = jnp.full_like(carry[:, :1], _BIG)
    d_minus = jnp.concatenate([edge, carry[:, :-1]], axis=1) + p1
    d_plus = jnp.concatenate([carry[:, 1:], edge], axis=1) + p1
    best = jnp.minimum(jnp.minimum(carry, min_prev + p2), jnp.minimum(d_minus, d_plus))
    return cost_slice + best - min_prev


def _scan_pair_kernel(cost_ref, out_ref, *, p1: float, p2: float):
    """Forward + backward scan along axis 1 of a (TA, B, D) block."""
    ta, b, d = cost_ref.shape
    carry0 = jnp.zeros((ta, d), dtype=jnp.float32)

    def fwd(x, carry):
        new = _step(carry, cost_ref[:, x, :], p1, p2)
        out_ref[:, x, :] = new
        return new

    jax.lax.fori_loop(0, b, fwd, carry0)

    def bwd(i, carry):
        x = b - 1 - i
        new = _step(carry, cost_ref[:, x, :], p1, p2)
        out_ref[:, x, :] += new
        return new

    jax.lax.fori_loop(0, b, bwd, carry0)


def _pick_tile(a: int, b: int, d: int) -> int:
    """Largest row-tile whose in+out blocks fit the VMEM budget (>=8 rows)."""
    per_row = 2 * b * d * 4  # in + out, float32
    tile = max(8, _VMEM_BYTES // max(per_row, 1))
    tile = 1 << (tile.bit_length() - 1)  # round down to power of two
    return min(tile, max(a, 1))


@functools.partial(jax.jit, static_argnames=("p1", "p2", "interpret"))
def scan_pair(cost: jnp.ndarray, p1: float, p2: float,
              interpret: bool = False) -> jnp.ndarray:
    """Sum of forward+backward SGM aggregation along axis 1 of (A, B, D)."""
    a, b, d = cost.shape
    tile = _pick_tile(a, b, d)
    pad = (-a) % tile
    if pad:
        cost = jnp.pad(cost, ((0, pad), (0, 0), (0, 0)))
    a_pad = a + pad

    out = pl.pallas_call(
        functools.partial(_scan_pair_kernel, p1=float(p1), p2=float(p2)),
        out_shape=jax.ShapeDtypeStruct((a_pad, b, d), jnp.float32),
        grid=(a_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, b, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, b, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cost.astype(jnp.float32))
    return out[:a]


def aggregate_pallas(cost: jnp.ndarray, p1: float, p2: float, num_paths: int = 4,
                     interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for sgm.aggregate_scan built on the Pallas kernel."""
    from online_3d_reconstruction_tpu.stereo.sgm import _deskew, _skew

    if num_paths not in (2, 4, 8):
        raise ValueError(f"num_paths must be 2, 4, or 8, got {num_paths}")
    h, w, _ = cost.shape
    cost = cost.astype(jnp.float32)

    # Horizontal pair: rows are lines; scan along W. Block rows of H.
    total = scan_pair(cost, p1, p2, interpret=interpret)
    if num_paths >= 4:
        # Vertical pair: scan along H of the transpose, lines are columns.
        agg_v = scan_pair(jnp.swapaxes(cost, 0, 1), p1, p2, interpret=interpret)
        total = total + jnp.swapaxes(agg_v, 0, 1)
    if num_paths == 8:
        for sign in (1, -1):
            skewed = jnp.swapaxes(_skew(cost, sign), 0, 1)  # (W+H-1, H, D)
            agg = jnp.swapaxes(scan_pair(skewed, p1, p2, interpret=interpret), 0, 1)
            total = total + _deskew(agg, sign, w)
    return total
