"""Pallas TPU kernel for SGM path aggregation.

The north star mandates "cost-volume SGM -> Pallas scan kernel" (SURVEY.md
§2.2). The recurrence is sequential along the scan direction, but each step
is an elementwise min-tree over an (L, D) line — pure VPU work.

Kernel design (v2 — streaming scan):

- The scan axis S is a *grid* dimension in blocks of ``_S_BLK`` lines; Mosaic
  double-buffers the HBM->VMEM DMA of the next (S_BLK, TL, D) cost block
  behind the compute of the current one, so the cost volume streams through
  VMEM at HBM bandwidth instead of having to fit in it.
- The per-line-tile recurrence carry (TL, D) lives in VMEM *scratch*, which
  persists across sequential grid steps; it is re-zeroed whenever a new line
  tile starts (program_id(1) == 0).
- Each inner step is a (TL, D) VPU min-tree with TL up to 512 lines — big
  enough to amortize loop and DMA-turnaround overhead (the v1 kernel kept the
  whole scan extent resident, was forced to 16-line tiles, and measured
  ~1.1 s/volume on v5e; this layout is the fix).
- Forward and backward directions are two ``pallas_call``s: the forward pass
  writes its aggregation, the backward pass revisits the blocks in reverse
  grid order and accumulates into the forward output via
  ``input_output_aliases`` (one extra read of the output volume, no copy).

Layout rule that makes or breaks this kernel: the scan axis must be the
LEADING block axis so each step reads ``cost_ref[s]`` = one contiguous
(TL, D) sublanes-x-lanes tile. With the scan axis in the middle
(``cost_ref[:, s, :]``) every step is a strided single-sublane gather and the
kernel runs ~1000x off roofline (measured on v5e).

Direction mapping (all 4/8 paths reuse this one kernel):
- vertical pair:   cost (H, W, D) scans along H directly;
- horizontal pair: scan the (W, H, D) transpose;
- diagonal pairs:  scan the skewed volume (sgm._skew) along H — a sheared
  image turns diagonals into columns.

Zero-padding along S is exactly neutral: a zero carry stepped over a
zero-cost line stays zero, which is the fresh-edge initial condition, so the
backward scan can start inside the padding without changing any real output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9  # python float: jnp constants would be captured consts in the kernel
# Per-buffer VMEM budget. The backward pass holds 3 grid blocks (cost, acc,
# out) and Mosaic double-buffers each, so 6 live buffers must fit the ~16 MB
# scoped limit together with the carry scratch.
_VMEM_BYTES = 1024 * 1024
_S_BLK = 16      # scan lines per grid step (inner unrolled loop)
_TL_MAX = 512    # max line-tile width (VPU op per step is (TL, D))


def _step(carry: jnp.ndarray, cost_slice: jnp.ndarray, p1: float, p2: float) -> jnp.ndarray:
    """One SGM step on an (L, D) line (identical math to sgm._sgm_step)."""
    min_prev = jnp.min(carry, axis=-1, keepdims=True)
    edge = jnp.full_like(carry[:, :1], _BIG)
    d_minus = jnp.concatenate([edge, carry[:, :-1]], axis=1) + p1
    d_plus = jnp.concatenate([carry[:, 1:], edge], axis=1) + p1
    best = jnp.minimum(jnp.minimum(carry, min_prev + p2), jnp.minimum(d_minus, d_plus))
    return cost_slice + best - min_prev


def _fwd_kernel(cost_ref, out_ref, carry_ref, *, p1: float, p2: float):
    """Forward scan over one (S_BLK, TL, D) block; carry persists in scratch."""
    s_blk = cost_ref.shape[0]
    out_dtype = out_ref.dtype

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    c = carry_ref[...]
    for s in range(s_blk):
        c = _step(c, cost_ref[s].astype(jnp.float32), p1, p2)
        out_ref[s] = c.astype(out_dtype)
    carry_ref[...] = c


def _bwd_kernel(acc_ref, cost_ref, out_ref, carry_ref, *, p1: float, p2: float):
    """Backward scan; adds into the forward aggregation (acc aliased to out)."""
    s_blk = cost_ref.shape[0]
    out_dtype = out_ref.dtype

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    c = carry_ref[...]
    for s in reversed(range(s_blk)):
        c = _step(c, cost_ref[s].astype(jnp.float32), p1, p2)
        out_ref[s] = (acc_ref[s].astype(jnp.float32) + c).astype(out_dtype)
    carry_ref[...] = c


def _pick_tl(l: int, d: int) -> int:
    """Line-tile width: whole extent if it fits the budget, else the largest
    multiple of 8 sublanes under both the budget and _TL_MAX."""
    budget = max(8, _VMEM_BYTES // (_S_BLK * d * 4))
    tl = min(l, _TL_MAX, budget)
    return max(8, (tl // 8) * 8)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "interpret"))
def scan_pair(cost: jnp.ndarray, p1: float, p2: float,
              interpret: bool = False) -> jnp.ndarray:
    """Sum of forward+backward SGM aggregation along axis 0 of (S, L, D).

    Output dtype == input dtype (the storage/HBM-traffic dtype).
    """
    s, l, d = cost.shape
    tl = _pick_tl(l, d)
    pad_l = (-l) % tl
    pad_s = (-s) % _S_BLK
    if pad_l or pad_s:
        cost = jnp.pad(cost, ((0, pad_s), (0, pad_l), (0, 0)))
    s_pad, l_pad = s + pad_s, l + pad_l
    n_sb = s_pad // _S_BLK
    n_lt = l_pad // tl
    grid = (n_lt, n_sb)  # scan-axis blocks innermost: carry runs per line tile

    kw = dict(p1=float(p1), p2=float(p2))
    block = (_S_BLK, tl, d)
    out_shape = jax.ShapeDtypeStruct((s_pad, l_pad, d), cost.dtype)
    scratch = [pltpu.VMEM((tl, d), jnp.float32)]

    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, lambda i, j: (j, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(cost)

    total = pl.pallas_call(
        functools.partial(_bwd_kernel, **kw),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda i, j: (n_sb - 1 - j, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j: (n_sb - 1 - j, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, lambda i, j: (n_sb - 1 - j, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        input_output_aliases={0: 0},
        interpret=interpret,
    )(fwd, cost)
    if pad_l or pad_s:
        total = total[:s, :l]
    return total


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
