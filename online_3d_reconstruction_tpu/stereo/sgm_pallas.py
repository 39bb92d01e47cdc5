"""Pallas TPU kernel for SGM path aggregation.

The north star mandates "cost-volume SGM -> Pallas scan kernel" (SURVEY.md
§2.2). The recurrence is sequential along the scan direction, but each step
is an elementwise min-tree over an (L, D) line — pure VPU work. This kernel
keeps a (S, TILE_L, D) cost block VMEM-resident and runs the forward *and*
backward directional scans in one invocation, writing their sum — the cost
volume is read from HBM once and the output written once per direction-pair.

Layout rule that makes or breaks this kernel: the scan axis must be the
LEADING block axis so each step reads ``cost_ref[x]`` = one contiguous
(TILE_L, D) sublanes-x-lanes tile. With the scan axis in the middle
(``cost_ref[:, x, :]``) every step is a strided single-sublane gather and the
kernel runs ~1000x off roofline (measured on v5e).

Direction mapping (all 4/8 paths reuse this one kernel):
- vertical pair:   cost (H, W, D) scans along H directly;
- horizontal pair: scan the (W, H, D) transpose;
- diagonal pairs:  scan the skewed volume (sgm._skew) along H — a sheared
  image turns diagonals into columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9  # python float: jnp constants would be captured consts in the kernel
# Per-buffer VMEM budget. The scoped limit is ~16 MB and Mosaic
# double-buffers both grid blocks, so keep in+out under ~4 MB each.
_VMEM_BYTES = 4 * 1024 * 1024


def _step(carry: jnp.ndarray, cost_slice: jnp.ndarray, p1: float, p2: float) -> jnp.ndarray:
    """One SGM step on an (L, D) line (identical math to sgm._sgm_step)."""
    min_prev = jnp.min(carry, axis=-1, keepdims=True)
    edge = jnp.full_like(carry[:, :1], _BIG)
    d_minus = jnp.concatenate([edge, carry[:, :-1]], axis=1) + p1
    d_plus = jnp.concatenate([carry[:, 1:], edge], axis=1) + p1
    best = jnp.minimum(jnp.minimum(carry, min_prev + p2), jnp.minimum(d_minus, d_plus))
    return cost_slice + best - min_prev


def _scan_pair_kernel(cost_ref, out_ref, *, p1: float, p2: float):
    """Forward + backward scan along axis 0 of an (S, TL, D) block.

    Storage dtype (HBM traffic) follows the refs; the recurrence itself runs
    in f32. With bf16 storage the per-path values stay exact (integers <= 56
    when P1/P2 are integral); the fwd+bwd sum <= 112 is also exact in bf16.
    """
    s, tl, d = cost_ref.shape
    out_dtype = out_ref.dtype
    carry0 = jnp.zeros((tl, d), dtype=jnp.float32)

    def fwd(x, carry):
        new = _step(carry, cost_ref[x].astype(jnp.float32), p1, p2)
        out_ref[x] = new.astype(out_dtype)
        return new

    jax.lax.fori_loop(0, s, fwd, carry0)

    def bwd(i, carry):
        x = s - 1 - i
        new = _step(carry, cost_ref[x].astype(jnp.float32), p1, p2)
        out_ref[x] = (out_ref[x].astype(jnp.float32) + new).astype(out_dtype)
        return new

    jax.lax.fori_loop(0, s, bwd, carry0)


def _pick_tile(s: int, l: int, d: int) -> int:
    """Largest line-tile whose in+out blocks fit the VMEM budget (>=8)."""
    per_line = 2 * s * d * 4  # in + out, float32, full scan extent resident
    tile = max(8, _VMEM_BYTES // max(per_line, 1))
    tile = 1 << (tile.bit_length() - 1)  # round down to a power of two
    return min(tile, max(l, 1))


@functools.partial(jax.jit, static_argnames=("p1", "p2", "interpret"))
def scan_pair(cost: jnp.ndarray, p1: float, p2: float,
              interpret: bool = False) -> jnp.ndarray:
    """Sum of forward+backward SGM aggregation along axis 0 of (S, L, D).

    Output dtype == input dtype (the storage/HBM-traffic dtype).
    """
    s, l, d = cost.shape
    tile = _pick_tile(s, l, d)
    pad = (-l) % tile
    if pad:
        cost = jnp.pad(cost, ((0, 0), (0, pad), (0, 0)))
    l_pad = l + pad

    out = pl.pallas_call(
        functools.partial(_scan_pair_kernel, p1=float(p1), p2=float(p2)),
        out_shape=jax.ShapeDtypeStruct((s, l_pad, d), cost.dtype),
        grid=(l_pad // tile,),
        in_specs=[
            pl.BlockSpec((s, tile, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, tile, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cost)
    return out[:, :l]


def aggregate_pallas(cost: jnp.ndarray, p1: float, p2: float, num_paths: int = 4,
                     interpret: bool = False,
                     dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Drop-in replacement for sgm.aggregate_scan built on the Pallas kernel.

    ``dtype`` is the storage dtype of the volumes the kernels stream through
    HBM (StereoConfig.cost_dtype); the inter-pair accumulation and the
    returned total are f32 regardless.
    """
    from online_3d_reconstruction_tpu.stereo.sgm import _deskew, _skew

    if num_paths not in (2, 4, 8):
        raise ValueError(f"num_paths must be 2, 4, or 8, got {num_paths}")
    h, w, _ = cost.shape
    cost = cost.astype(dtype)

    # Horizontal pair: scan along W of the (W, H, D) transpose.
    agg_h = scan_pair(jnp.swapaxes(cost, 0, 1), p1, p2, interpret=interpret)
    total = jnp.swapaxes(agg_h, 0, 1).astype(jnp.float32)
    if num_paths >= 4:
        # Vertical pair: (H, W, D) scans along H directly.
        total = total + scan_pair(cost, p1, p2, interpret=interpret).astype(jnp.float32)
    if num_paths == 8:
        for sign in (1, -1):
            skewed = _skew(cost, sign)  # (H, W+H-1, D); diagonals -> columns
            agg = scan_pair(skewed, p1, p2, interpret=interpret)
            total = total + _deskew(agg.astype(jnp.float32), sign, w)
    return total
