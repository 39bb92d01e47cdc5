"""Multi-host / multi-chip reconstruction — the ``o3r.distributed.run`` path.

The reference is strictly single-machine (SURVEY.md §2.4); this module is the
new framework's scale-out entry point (config [B:11]):

- ``initialize(...)`` wraps ``jax.distributed.initialize`` for multi-host
  process groups (call once per process before any jax op; no-op for
  single-host multi-chip).
- ``reconstruct_distributed(dataset, config, rig, mesh)`` runs the online
  loop with the sharded stages swapped in: row-slab SGM with halo exchange
  (P4), observation-sharded BA with psum Schur reduction (P2). Every process
  must iterate the same dataset (SPMD: all processes execute each global
  collective); results are identical on every process.

The map pool stays process-local in v1 (the sharded voxel merge op,
parallel/voxel_sharded.py, is used for the final global reduction).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh

from online_3d_reconstruction_tpu.ba.window import WindowBA
from online_3d_reconstruction_tpu.config import PipelineConfig
from online_3d_reconstruction_tpu.geometry.backproject import backproject_disparity
from online_3d_reconstruction_tpu.io.calibration import RectifiedRig
from online_3d_reconstruction_tpu.odometry.frontend import extract_frame_features
from online_3d_reconstruction_tpu.parallel.ba_sharded import solve_ba_sharded
from online_3d_reconstruction_tpu.parallel.sgm_sharded import sharded_disparity
from online_3d_reconstruction_tpu.runtime.pipeline import (
    OnlineReconstructor,
    ReconstructionResult,
)
from online_3d_reconstruction_tpu.stereo.rectify import rectify_pair, remap_bilinear


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host process group (before any other jax call)."""
    if coordinator_address is None:
        return  # single host: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


class DistributedReconstructor(OnlineReconstructor):
    """Online loop whose stereo + BA stages run sharded over a device mesh."""

    def __init__(self, config: PipelineConfig, rig: RectifiedRig, mesh: Mesh,
                 sgm_halo: int = 32):
        if config.runtime.ba_every_keyframe:
            # the observation-sharded Schur solver plugs into the host
            # track-table packer; force that BA backend
            import dataclasses

            config = config.replace(
                runtime=dataclasses.replace(config.runtime, host_ba=True)
            )
        super().__init__(config, rig)
        self.mesh = mesh
        self.sgm_halo = sgm_halo
        if self._ba is not None:
            self._ba = WindowBA(
                config.ba,
                solver=functools.partial(solve_ba_sharded, mesh=mesh),
            )

    def _run_steady_step(self, packed, hostvec, kf, fuse,
                         precomputed_disp: bool = False):
        """Sharded stages can't fuse into the single-dispatch steady step
        (the SGM slabs and BA shards are separate shard_map programs), so the
        distributed loop keeps the 3-stage structure."""
        import jax.numpy as jnp

        from online_3d_reconstruction_tpu.odometry.frontend import tracking_step
        from online_3d_reconstruction_tpu.runtime.pipeline import _fusion_stage

        cfg = self.cfg
        disp, feats, cloud = self._compute_frame(
            jnp.asarray(packed[..., 0]), jnp.asarray(packed[..., 1]),
            jnp.asarray(packed[..., 2:5]),
            disp_in=(jnp.asarray(packed[..., 5]) if precomputed_disp else None),
        )
        prior = jnp.asarray(hostvec[:16].reshape(4, 4))
        pose, used_vo, count, matches = tracking_step(
            feats, kf.features, kf.pose, kf.prior_pose, prior,
            self._key, jnp.int32(int(hostvec[16])),
            cfg.matching, cfg.odometry,
        )
        staging = self._staging
        if fuse:
            staging = _fusion_stage(staging, cloud, pose)
        return staging, pose, feats, used_vo, count, matches

    def _compute_frame(self, left, right, color, disp_in=None):
        cfg = self.cfg
        left_r, right_r = rectify_pair(left, right, self.map_left, self.map_right)
        color_r = remap_bilinear(color, self.map_left)
        if disp_in is None:
            disp, valid = sharded_disparity(left_r, right_r, cfg.stereo,
                                            self.mesh, halo=self.sgm_halo)
        else:
            disp = disp_in
        feats = extract_frame_features(left_r, disp, self.q,
                                       cfg.features, cfg.odometry)
        cloud = backproject_disparity(
            disp, color_r, self.q,
            stride=cfg.mapping.frame_point_stride,
            min_depth=cfg.mapping.min_depth,
            max_depth=cfg.mapping.max_depth,
            invalid_value=cfg.stereo.invalid_value,
        )
        return disp, feats, cloud

def reconstruct_distributed(dataset, config: PipelineConfig, rig: RectifiedRig,
                            mesh: Mesh, sgm_halo: int = 32) -> ReconstructionResult:
    """Multi-device `reconstruct`: same API, sharded stereo + BA stages."""
    engine = DistributedReconstructor(config, rig, mesh, sgm_halo=sgm_halo)
    for frame in dataset:
        engine.process(frame)
    return engine.finish()
