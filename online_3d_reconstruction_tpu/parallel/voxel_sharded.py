"""Point-sharded voxel reduction (P3): distributed map downsampling.

The reference's PCL voxel filter is single-machine; the TPU-native global map
shards its point pool across devices. Downsampling then runs in two stages
(SURVEY.md §2.3 P3):

1. local: each device sort+segment-reduces its own point shard
   (mapping/voxel.py) — removes intra-shard duplicates;
2. merge: the compacted survivors are all-gathered (they are far smaller
   than the raw pool after stage 1) and reduced once more, replicated.

Exactness: centroid-of-centroids is not centroid-of-points, so stage 1
carries per-voxel *sums and counts* rather than means; stage 2 finishes the
division. Result is bit-comparable (up to fp reduction order) to the
single-device filter — asserted on the CPU-simulated mesh in
tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from online_3d_reconstruction_tpu.geometry.backproject import PointCloud
from online_3d_reconstruction_tpu.mapping.voxel import _SENTINEL, voxel_coords


def _local_reduce(points, colors, valid, voxel_size, bounds, per_axis):
    """Segment-reduce a shard, carrying (sum, count) instead of means."""
    n = points.shape[0]
    idx = voxel_coords(points, voxel_size, bounds)
    in_bounds = jnp.all((idx >= 0) & (idx < per_axis), axis=1) & valid
    key_hi = jnp.where(in_bounds, idx[:, 0], _SENTINEL)
    key_lo = jnp.where(in_bounds, idx[:, 1] * per_axis + idx[:, 2], _SENTINEL)

    order = jnp.argsort(key_lo, stable=True)
    order = order[jnp.argsort(key_hi[order], stable=True)]
    hi_s, lo_s = key_hi[order], key_lo[order]
    pts_s, col_s, val_s = points[order], colors[order], in_bounds[order]

    new_seg = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         ((hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])).astype(jnp.int32)]
    )
    seg_id = jnp.cumsum(new_seg) - 1
    valf = val_s.astype(jnp.float32)[:, None]
    sum_pts = jax.ops.segment_sum(pts_s * valf, seg_id, num_segments=n)
    sum_col = jax.ops.segment_sum(col_s * valf, seg_id, num_segments=n)
    counts = jax.ops.segment_sum(valf[:, 0], seg_id, num_segments=n)
    # representative keys per segment (first element of each segment)
    rep_hi = jax.ops.segment_min(hi_s, seg_id, num_segments=n)
    rep_lo = jax.ops.segment_min(lo_s, seg_id, num_segments=n)
    return sum_pts, sum_col, counts, rep_hi, rep_lo


@partial(jax.jit, static_argnames=("voxel_size", "bounds", "mesh", "bucket_capacity"))
def voxel_route_merge(points: jnp.ndarray, colors: jnp.ndarray,
                      valid: jnp.ndarray, mesh: Mesh, voxel_size: float,
                      bounds: float = 2048.0,
                      bucket_capacity: int = 0):
    """Owner-routed voxel merge: the "streaming voxel-merge over ICI" (P3).

    Each voxel key hashes to one owner device; every device packs its points
    into fixed-capacity per-destination buckets, one ``all_to_all`` ships
    them over ICI, and the owner segment-reduces — each voxel is reduced on
    exactly one device, so centroids are exact (no centroid-of-centroids)
    and traffic is 1/n of an all-gather.

    points: (N, 3) sharded over the mesh axis (N divisible by device count).
    bucket_capacity: per-destination slot count (default: local shard size —
    lossless; smaller trades memory/traffic for counted overflow).

    Returns (PointCloud sharded over the axis with per-device capacity
    n_dev * bucket_capacity, dropped_count () replicated).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    per_axis = int(2.0 * bounds / voxel_size) + 2
    if per_axis * per_axis >= 2**31:
        raise ValueError("voxel grid too fine for two-word keys")
    n_local = points.shape[0] // n_dev
    cap = bucket_capacity or n_local

    def stage(pts, cols, val):
        pts, cols, val = pts, cols, val
        m = pts.shape[0]
        idx = voxel_coords(pts, voxel_size, bounds)
        ok = jnp.all((idx >= 0) & (idx < per_axis), axis=1) & val
        key_hi = idx[:, 0]
        key_lo = idx[:, 1] * per_axis + idx[:, 2]
        # owner = hash of the voxel key -> device id
        mix = (key_hi.astype(jnp.uint32) * jnp.uint32(2654435761)
               ^ key_lo.astype(jnp.uint32) * jnp.uint32(40503))
        owner = (mix % jnp.uint32(n_dev)).astype(jnp.int32)
        owner = jnp.where(ok, owner, n_dev)  # invalid -> overflow bin

        # pack into (n_dev, cap) buckets: position within destination via
        # stable sort by owner + per-segment rank
        order = jnp.argsort(owner, stable=True)
        owner_s = owner[order]
        seg_start = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (owner_s[1:] != owner_s[:-1]).astype(jnp.int32)]
        )
        pos_in_seg = jnp.arange(m, dtype=jnp.int32) - jnp.maximum.accumulate(
            jnp.where(seg_start == 1, jnp.arange(m, dtype=jnp.int32), 0)
        )
        slot = owner_s * cap + pos_in_seg
        keep = (owner_s < n_dev) & (pos_in_seg < cap)
        dropped = jnp.sum((owner_s < n_dev) & (pos_in_seg >= cap))

        buf_pts = jnp.zeros((n_dev * cap, 3), jnp.float32)
        buf_cols = jnp.zeros((n_dev * cap, 3), jnp.float32)
        buf_ok = jnp.zeros((n_dev * cap,), bool)
        # rejected entries target index n_dev*cap == out of range -> dropped
        # by the scatter, so they can never clobber a kept slot
        tgt = jnp.where(keep, slot, n_dev * cap)
        buf_pts = buf_pts.at[tgt].set(pts[order], mode="drop")
        buf_cols = buf_cols.at[tgt].set(cols[order], mode="drop")
        buf_ok = buf_ok.at[tgt].set(keep, mode="drop")

        # ship bucket d to device d
        buf_pts = buf_pts.reshape(n_dev, cap, 3)
        buf_cols = buf_cols.reshape(n_dev, cap, 3)
        buf_ok = buf_ok.reshape(n_dev, cap)
        rx_pts = jax.lax.all_to_all(buf_pts, axis, 0, 0, tiled=True)
        rx_cols = jax.lax.all_to_all(buf_cols, axis, 0, 0, tiled=True)
        rx_ok = jax.lax.all_to_all(buf_ok, axis, 0, 0, tiled=True)

        # owner-side exact reduction over its n_dev*cap candidates
        sum_pts, sum_col, counts, rep_hi, rep_lo = _local_reduce(
            rx_pts.reshape(-1, 3), rx_cols.reshape(-1, 3), rx_ok.reshape(-1),
            voxel_size, bounds, per_axis,
        )
        occupied = (counts > 0) & (rep_hi != _SENTINEL)
        denom = jnp.maximum(counts, 1.0)[:, None]
        out_pts = jnp.where(occupied[:, None], sum_pts / denom, 0.0)
        out_col = jnp.where(occupied[:, None], sum_col / denom, 0.0)
        return out_pts, out_col, occupied, jax.lax.psum(dropped, axis)

    spec = P(axis)
    out_pts, out_col, occupied, dropped = shard_map(
        stage, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec, P()),
    )(points, colors, valid)
    return PointCloud(points=out_pts, colors=out_col, valid=occupied), dropped


@partial(jax.jit, static_argnames=("voxel_size", "bounds", "mesh"))
def sharded_voxel_downsample(points: jnp.ndarray, colors: jnp.ndarray,
                             valid: jnp.ndarray, mesh: Mesh,
                             voxel_size: float, bounds: float = 2048.0
                             ) -> PointCloud:
    """Voxel-downsample a (N, 3) pool sharded over the mesh's first axis.

    N must divide by the device count. Returns a replicated compacted cloud
    of capacity N (same semantics as mapping.voxel.voxel_downsample).
    """
    axis = mesh.axis_names[0]
    per_axis = int(2.0 * bounds / voxel_size) + 2
    if per_axis * per_axis >= 2**31:
        raise ValueError("voxel grid too fine for two-word keys")

    def stage(points, colors, valid):
        # local dedup only; outputs stay sharded (out_specs concatenates the
        # logical value — XLA inserts the all-gather where the merge needs it)
        return _local_reduce(points, colors, valid, voxel_size, bounds, per_axis)

    spec = P(axis)
    sum_pts, sum_col, counts, rep_hi, rep_lo = shard_map(
        stage, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec, spec, spec),
    )(points, colors, valid)

    # final merge (replicated): second segment reduction over gathered voxels
    n = sum_pts.shape[0]
    order = jnp.argsort(rep_lo, stable=True)
    order = order[jnp.argsort(rep_hi[order], stable=True)]
    hi_s, lo_s = rep_hi[order], rep_lo[order]
    sp, sc, ct = sum_pts[order], sum_col[order], counts[order]
    new_seg = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         ((hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])).astype(jnp.int32)]
    )
    seg_id = jnp.cumsum(new_seg) - 1
    tot_pts = jax.ops.segment_sum(sp, seg_id, num_segments=n)
    tot_col = jax.ops.segment_sum(sc, seg_id, num_segments=n)
    tot_cnt = jax.ops.segment_sum(ct, seg_id, num_segments=n)
    seg_hi = jax.ops.segment_min(hi_s, seg_id, num_segments=n)
    occupied = (tot_cnt > 0) & (seg_hi != _SENTINEL)
    denom = jnp.maximum(tot_cnt, 1.0)[:, None]
    return PointCloud(points=tot_pts / denom, colors=tot_col / denom,
                      valid=occupied)
