"""DistributedReconstructor on the simulated 8-device mesh: the full online
loop with sharded stereo + BA must track as well as the single-device loop."""

import numpy as np
import pytest

import jax

from online_3d_reconstruction_tpu.io.dataset import SyntheticSequence
from online_3d_reconstruction_tpu.io.synthetic import nadir_pose
from online_3d_reconstruction_tpu.parallel import make_mesh
from online_3d_reconstruction_tpu.runtime.distributed import (
    reconstruct_distributed,
)
from online_3d_reconstruction_tpu.runtime.pipeline import reconstruct
from online_3d_reconstruction_tpu.utils.metrics import ate_rmse

from tests.test_odometry import _test_config, vo_rig, vo_scene  # noqa: F401


@pytest.fixture(scope="module")
def mesh4():
    # 4 replicas, not 8: the distributed loop's donated shard_map keyframe
    # step is the one program that can deadlock XLA:CPU's collective
    # rendezvous on an oversubscribed small host (observed at 8 replicas on
    # 2 cores under load, even in a fresh process); halving the replica
    # count halves the threads that must assemble each rendezvous while
    # testing exactly the same sharded code paths.
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    return make_mesh(4)


def test_distributed_loop_tracks(vo_scene, vo_rig, mesh4):
    cfg = _test_config()
    poses = [nadir_pose(0.8 * i, 0.1 * i, 12.0) for i in range(6)]
    dataset = SyntheticSequence(scene=vo_scene, rig=vo_rig, poses=poses)
    frames = [dataset[i] for i in range(6)]

    res_1 = reconstruct(frames, cfg, vo_rig)
    res_8 = reconstruct_distributed(frames, cfg, vo_rig, mesh4, sgm_halo=16)

    gt = np.stack(poses)
    ate_1 = ate_rmse(res_1.trajectory, gt)
    ate_8 = ate_rmse(res_8.trajectory, gt)
    # sharded SGM's halo truncation perturbs a handful of disparities; the
    # trajectories should agree closely and both track ground truth
    assert ate_8 < max(2.0 * ate_1, 0.4), (ate_1, ate_8)
    assert len(res_8.map_points) > 500
    assert res_8.metrics["keyframes"] == res_1.metrics["keyframes"]
