"""Pallas TPU kernels for SGM path aggregation.

The north star mandates "cost-volume SGM -> Pallas scan kernel" (SURVEY.md
§2.2). The recurrence is sequential along the scan direction, but each step
is an elementwise min-tree over a line of the volume — pure VPU work.

THE PRODUCTION KERNEL is the fused multi-direction v3 further down
(``aggregate_fused``, see the "v3" banner comment for its design): (S, D, L)
layout with the line axis on the 128 lanes, one pass computing the vertical
AND both diagonal directions via lane-shifted carries, and the horizontal
pair (same kernel on the transpose) seeding the accumulator. 8-path
aggregation measured 0.49 ms at 384x512xD64 bf16 on v5e — 58% of the VPU
roofline bound (BASELINE.md kernel history).

``scan_pair`` below is the earlier v2 per-pair streaming kernel, kept
because it is the general single-direction form (arbitrary pre-skewed
volumes) the tests cross-check against. Shared design rules, measured on
v5e:

- The scan axis S is a *grid* dimension; Mosaic double-buffers the
  HBM->VMEM DMA of the next cost block behind the compute of the current
  one, and the recurrence carry lives in VMEM *scratch* that persists
  across sequential grid steps.
- The scan axis must be the LEADING block axis so each step reads
  ``cost_ref[s]`` = one contiguous sublanes-x-lanes tile; a mid-axis scan
  (``cost_ref[:, s, :]``) degenerates to single-sublane reads, ~1000x off
  roofline.
- Forward and backward passes alias their output (``input_output_aliases``)
  so the backward pass accumulates in place, no extra volume copy.
- Zero-padding along S is exactly neutral: a zero carry stepped over a
  zero-cost line stays zero — the fresh-edge initial condition — so padded
  scans never corrupt real output.
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
    """Drop-in replacement for sgm.aggregate_scan built on the Pallas kernels.

    ``dtype`` is the storage dtype of the volumes the kernels stream through
    HBM (StereoConfig.cost_dtype); the returned total is f32 regardless.

    v3: thin adapter over the fused multi-direction kernel (below), which
    works in the lane-friendly (S, D, L) layout; this keeps the public
    (H, W, D) API for tests and the lax.scan-parity checks.
    """
    if num_paths not in (2, 4, 8):
        raise ValueError(f"num_paths must be 2, 4, or 8, got {num_paths}")
    cost_dl = jnp.swapaxes(cost, 1, 2)  # (H, W, D) -> (H, D, W)
    total = aggregate_fused(cost_dl, p1, p2, num_paths, interpret=interpret,
                            dtype=dtype)
    return jnp.swapaxes(total, 1, 2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# v3: fused multi-direction kernel in (S, D, L) layout
# ---------------------------------------------------------------------------
#
# Two structural wins over the per-pair scan_pair kernels above:
#
# 1. Layout (S, D, L): the disparity axis D (64) is the *sublane* axis and
#    the line axis L (512) the *lane* axis, so every (D, L) slice maps to
#    full (8,128)/(16,128) native tiles with no lane padding — the (..., D)
#    layout pads D=64 up to 128 lanes and doubles every DMA.
# 2. Direction fusion: while scanning along S with FULL-width lines, the
#    diagonal recurrences only differ from the vertical one by a +-1 lane
#    shift of the carry (predecessor of (y, x) on the (1,+-1) diagonal is
#    (y-1, x-+1)); a zero-filled shift is exactly the fresh-edge initial
#    condition. One forward pass therefore aggregates v + d+ + d- (3
#    directions) in registers, writing only their SUM — the skewed volumes,
#    their 5-pass scans, and the inter-pair adds of v2 all disappear.
#    The horizontal pair is the same kernel (shifts=(0,)) on the (W, D, H)
#    transpose, and its result seeds the fused pass's accumulator, saving
#    the final add pass as well.
#
# 8-path HBM traffic: transpose (2) + h fwd (2) + h bwd (3) + transpose (2)
# + tri fwd (3) + tri bwd (3) = 15 volume passes vs ~28 larger ones in v2;
# with bf16 storage each pass is 25 MB at 384x512x64.


def _step_dl(carry: jnp.ndarray, cost_slice: jnp.ndarray,
             p1: float, p2: float) -> jnp.ndarray:
    """One SGM step on a (D, L) line (disparity on sublanes, line on lanes)."""
    min_prev = jnp.min(carry, axis=0, keepdims=True)
    edge = jnp.full_like(carry[:1], _BIG)
    d_minus = jnp.concatenate([edge, carry[:-1]], axis=0) + p1
    d_plus = jnp.concatenate([carry[1:], edge], axis=0) + p1
    best = jnp.minimum(jnp.minimum(carry, min_prev + p2),
                       jnp.minimum(d_minus, d_plus))
    return cost_slice + best - min_prev


def _shift_lanes(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Shift a (D, L) tile along lanes with zero fill (zero = fresh path)."""
    if shift == 0:
        return x
    zero = jnp.zeros_like(x[:, :1])
    if shift > 0:   # value at lane l comes from lane l-1
        return jnp.concatenate([zero, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], zero], axis=1)


def _multi_kernel(*refs, p1: float, p2: float, shifts: tuple,
                  reverse: bool, has_init: bool, s_blk: int):
    """Scan s_blk lines for len(shifts) directions at once, accumulating
    their sum (plus optional init volume) into out. Carries persist in
    scratch across sequential grid steps along the scan axis."""
    if has_init:
        init_ref, cost_ref, out_ref, carry_ref = refs
    else:
        cost_ref, out_ref, carry_ref = refs
        init_ref = None
    out_dtype = out_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    cs = [carry_ref[k] for k in range(len(shifts))]
    order = range(s_blk - 1, -1, -1) if reverse else range(s_blk)
    for s in order:
        cost_s = cost_ref[s].astype(jnp.float32)
        total = init_ref[s].astype(jnp.float32) if has_init else None
        for k, sh in enumerate(shifts):
            # reverse traversal of a diagonal flips the lane shift too
            cs[k] = _step_dl(_shift_lanes(cs[k], -sh if reverse else sh),
                             cost_s, p1, p2)
            total = cs[k] if total is None else total + cs[k]
        out_ref[s] = total.astype(out_dtype)
    for k in range(len(shifts)):
        carry_ref[k] = cs[k]


def _pick_s_blk(d: int, l: int, itemsize: int) -> int:
    """Scan-lines per grid block: keep each (s_blk, D, L) buffer near 1 MB
    (the bwd call holds 3 double-buffered blocks inside the 16 MB scoped
    VMEM limit, plus the carry scratch)."""
    budget = max(1, _VMEM_BYTES // (d * l * itemsize))
    blk = 1
    while blk * 2 <= min(budget, 32):
        blk *= 2
    return blk


def _one_call(cost, init, p1, p2, shifts, reverse, interpret, n_sb, s_blk):
    s_pad, d, l = cost.shape
    block = (s_blk, d, l)
    idx = (lambda j: (n_sb - 1 - j, 0, 0)) if reverse else (lambda j: (j, 0, 0))
    spec = pl.BlockSpec(block, idx, memory_space=pltpu.VMEM)
    kw = dict(p1=float(p1), p2=float(p2), shifts=shifts, reverse=reverse,
              has_init=init is not None, s_blk=s_blk)
    operands = [cost] if init is None else [init, cost]
    return pl.pallas_call(
        functools.partial(_multi_kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((s_pad, d, l), cost.dtype),
        grid=(n_sb,),
        in_specs=[spec] * len(operands),
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((len(shifts), d, l), jnp.float32)],
        input_output_aliases={0: 0} if init is not None else {},
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "diag", "interpret"))
def scan_multi(cost: jnp.ndarray, p1: float, p2: float, diag: bool,
               init: jnp.ndarray = None, interpret: bool = False) -> jnp.ndarray:
    """Fwd+bwd SGM aggregation along axis 0 of (S, D, L), summed over the
    vertical direction plus (``diag=True``) both diagonals; ``init`` (same
    shape) seeds the accumulator. Zero padding along S is neutral (a zero
    carry over zero cost stays zero = fresh edge), so the reverse pass can
    start inside padding."""
    s, d, l = cost.shape
    shifts = (0, 1, -1) if diag else (0,)
    s_blk = _pick_s_blk(d, l, cost.dtype.itemsize)
    pad_s = (-s) % s_blk
    if pad_s:
        cost = jnp.pad(cost, ((0, pad_s), (0, 0), (0, 0)))
        if init is not None:
            init = jnp.pad(init, ((0, pad_s), (0, 0), (0, 0)))
    n_sb = (s + pad_s) // s_blk

    fwd = _one_call(cost, init, p1, p2, shifts, False, interpret, n_sb, s_blk)
    total = _one_call(cost, fwd, p1, p2, shifts, True, interpret, n_sb, s_blk)
    return total[:s] if pad_s else total


def aggregate_fused(cost: jnp.ndarray, p1: float, p2: float,
                    num_paths: int = 4, interpret: bool = False,
                    dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """SGM path aggregation over 2/4/8 paths on an (H, D, W) cost volume.

    The production TPU path (sgm.sgm_disparity uses it with the DL-layout
    cost volume from census.cost_volume_dl). Returns (H, D, W) in the
    storage ``dtype`` — downstream WTA reductions cast per-pixel results to
    f32, which XLA fuses, so materializing an f32 volume here would only
    add an extra 2x-sized pass.
    """
    if num_paths not in (2, 4, 8):
        raise ValueError(f"num_paths must be 2, 4, or 8, got {num_paths}")
    cost = cost.astype(dtype)

    # Horizontal pair: vertical scan of the (W, D, H) transpose.
    h_sum_t = scan_multi(jnp.swapaxes(cost, 0, 2), p1, p2, diag=False,
                         interpret=interpret)
    h_sum = jnp.swapaxes(h_sum_t, 0, 2)
    if num_paths == 2:
        return h_sum
    return scan_multi(cost, p1, p2, diag=(num_paths == 8), init=h_sum,
                      interpret=interpret)


# ---------------------------------------------------------------------------
# Speckle filter: all 8 segmented scans fused into ONE kernel launch
# ---------------------------------------------------------------------------
#
# The XLA form (sgm.speckle_filter) is the identical "run-cross mass"
# algorithm, but its 8 ``associative_scan``s lower to ~150 log-depth sweep
# KERNELS and run launch-latency-bound: 1.16 ms/frame at 384x512 on v5e with
# int16 values moving the needle not at all (BASELINE.md). Here the whole
# image lives in VMEM (384x512 f32 = 0.79 MB/buffer) and every scan is an
# unrolled segmented Hillis-Steele — 9 full-block VPU steps per scan, ~90M
# vector ops total, one launch. Flags and masks ride as f32 0/1 (Mosaic's
# preferred vector dtype); run sums <= H*W stay exact in f32.


def _shift_fill(x: jnp.ndarray, k: int, axis: int, reverse: bool,
                fill: float) -> jnp.ndarray:
    """x shifted k toward higher index (reverse: lower), fill at the edge."""
    h, w = x.shape
    if axis == 0:
        pad = jnp.full((k, w), fill, dtype=x.dtype)
        return (jnp.concatenate([pad, x[:-k]], axis=0) if not reverse
                else jnp.concatenate([x[k:], pad], axis=0))
    pad = jnp.full((h, k), fill, dtype=x.dtype)
    return (jnp.concatenate([pad, x[:, :-k]], axis=1) if not reverse
            else jnp.concatenate([x[:, k:], pad], axis=1))


def _seg_scan(v: jnp.ndarray, f: jnp.ndarray, axis: int,
              reverse: bool) -> jnp.ndarray:
    """Inclusive segmented sum-scan (f = 0/1 segment-start flags; for
    ``reverse`` the flags must mark segment ENDS). Unrolled Hillis-Steele:
    shifted-in flags are 1 (hard boundary), values 0."""
    n = v.shape[axis]
    k = 1
    while k < n:
        vs = _shift_fill(v, k, axis, reverse, 0.0)
        fs = _shift_fill(f, k, axis, reverse, 1.0)
        v = jnp.where(f > 0.5, v, v + vs)
        f = jnp.maximum(f, fs)
        k *= 2
    return v


def _run_total(v: jnp.ndarray, start: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Sum of v over each pixel's maximal run along ``axis``: forward scan
    from the start flags + backward scan from the end flags - self."""
    fwd = _seg_scan(v, start, axis, reverse=False)
    end = _shift_fill(start, 1, axis, reverse=True, fill=1.0)
    bwd = _seg_scan(v, end, axis, reverse=True)
    return fwd + bwd - v


def _run_total_kernel(v_ref, start_ref, out_ref, *, axis: int):
    out_ref[...] = _run_total(v_ref[...], start_ref[...], axis=axis)


def _run_total_call(v, start, axis, interpret):
    """One launch computing a full run_total: a single fused kernel holding
    every (H, W) f32 temporary of all 8 scans at once exceeds the 16 MB
    scoped-VMEM stack (measured 27.9 MB), so the filter runs as four of
    these (~6 MB live each) — 4 launches instead of the ~150 sweep kernels
    the XLA associative_scan form costs."""
    h, w = v.shape
    return pl.pallas_call(
        functools.partial(_run_total_kernel, axis=axis),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        interpret=interpret,
    )(v, start)


@functools.partial(jax.jit,
                   static_argnames=("max_size", "max_diff", "interpret"))
def speckle_filter_pallas(disparity: jnp.ndarray, valid: jnp.ndarray,
                          max_size: int, max_diff: float,
                          interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas form of sgm.speckle_filter (same run-cross-mass
    semantics, asserted equivalent in tests). Returns the updated (H, W)
    bool validity mask."""
    if max_size <= 0:
        return valid
    d = disparity.astype(jnp.float32)
    val = valid.astype(jnp.float32)

    def start_flags(axis):
        dz = _shift_fill(d, 1, axis, reverse=False, fill=0.0)
        vz = _shift_fill(val, 1, axis, reverse=False, fill=0.0)
        conn = val * vz * (jnp.abs(d - dz) <= max_diff).astype(jnp.float32)
        return 1.0 - conn                      # row/col 0 starts by fill

    f0 = start_flags(0)
    f1 = start_flags(1)
    colrun = _run_total_call(val, f0, axis=0, interpret=interpret)
    rowrun = _run_total_call(val, f1, axis=1, interpret=interpret)
    mass = jnp.maximum(_run_total_call(colrun, f1, axis=1,
                                       interpret=interpret),
                       _run_total_call(rowrun, f0, axis=0,
                                       interpret=interpret))
    return valid & (mass > float(max_size))
