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
