"""Trajectory regression (SURVEY.md §4.5): a multi-row survey flight through
the full online loop — keyframes, window BA, voxel map — with drift bounds."""

import numpy as np

from online_3d_reconstruction_tpu.io.dataset import SyntheticSequence
from online_3d_reconstruction_tpu.io.synthetic import make_survey_trajectory
from online_3d_reconstruction_tpu.runtime.pipeline import reconstruct
from online_3d_reconstruction_tpu.utils.metrics import ate_rmse, rpe_stats

from tests.test_odometry import _test_config, vo_rig, vo_scene  # noqa: F401


def test_survey_sequence_regression(vo_scene, vo_rig):
    """24-frame lawnmower survey: two rows + a turn (yaw and direction flip)."""
    cfg = _test_config()
    poses = make_survey_trajectory(
        24, altitude=12.0, speed=0.7, row_length=7.0, row_spacing=2.5, seed=2
    )
    dataset = SyntheticSequence(
        scene=vo_scene, rig=vo_rig, poses=poses,
        prior_translation_sigma=0.25, prior_rotation_sigma=0.015,
    )
    result = reconstruct(dataset, cfg, vo_rig)

    gt = np.stack(poses)
    ate = ate_rmse(result.trajectory, gt)
    rpe_t, rpe_r = rpe_stats(result.trajectory, gt)
    assert result.metrics["frames"] == 24
    assert result.metrics["keyframes"] >= 10
    # regression bounds: chained VO + BA over a 16 m track with noisy priors
    # (frames travel as uint8 — what a real camera delivers — so the VO sees
    # 8-bit-quantized images; the bound allows for that)
    assert ate < 0.6, f"ATE {ate:.3f} m"
    assert rpe_t < 0.17, f"RPE-t {rpe_t:.3f} m"
    assert rpe_r < 0.02, f"RPE-r {rpe_r:.4f} rad"
    # the map covers both survey rows
    assert len(result.map_points) > 2_000
    y_extent = result.map_points[:, 1].max() - result.map_points[:, 1].min()
    assert y_extent > 4.0, f"map y-extent {y_extent:.1f} (expected both rows)"


def test_precomputed_disparity_bypasses_sgm(vo_scene, vo_rig, monkeypatch):
    """Offline mode (SURVEY.md §2.1 C5 'precomputed disparity'): with
    runtime.use_precomputed_disparity the SGM stage must never run — the
    supplied (ground-truth) maps feed features + backprojection directly."""
    import dataclasses

    from online_3d_reconstruction_tpu.runtime import pipeline as pl

    def _boom(*a, **k):
        raise AssertionError("sgm_disparity ran in precomputed mode")

    monkeypatch.setattr(pl, "sgm_disparity", _boom)

    cfg = _test_config()
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime,
                                    use_precomputed_disparity=True),
    )
    poses = make_survey_trajectory(8, altitude=12.0, speed=0.7,
                                   row_length=7.0, seed=3)
    dataset = SyntheticSequence(scene=vo_scene, rig=vo_rig, poses=poses,
                                prior_translation_sigma=0.15)
    assert dataset[0].disparity is not None  # the oracle supplies GT maps
    result = reconstruct(dataset, cfg, vo_rig)

    # GT disparity -> exact lifts: the trajectory should beat noisy priors
    ate = ate_rmse(result.trajectory, np.stack(poses))
    assert ate < 0.35, f"ATE {ate:.3f} m with GT disparity"
    # 8 frames over one ~7 m row at 0.5 m leaves -> a few hundred voxels
    assert len(result.map_points) > 400


def test_profile_flag_writes_trace(vo_scene, vo_rig, tmp_path):
    """runtime.profile wraps the run in a jax.profiler trace (SURVEY.md §5)."""
    import dataclasses
    import os

    from online_3d_reconstruction_tpu.io.dataset import SyntheticSequence
    from online_3d_reconstruction_tpu.io.synthetic import nadir_pose

    cfg = _test_config()
    cfg = dataclasses.replace(
        cfg,
        runtime=dataclasses.replace(cfg.runtime, profile=True,
                                    checkpoint_dir=str(tmp_path)),
    )
    ds = SyntheticSequence(scene=vo_scene, rig=vo_rig,
                           poses=[nadir_pose(0, 0, 12.0)])
    reconstruct(ds, cfg, vo_rig)
    trace_dir = tmp_path / "profile"
    assert trace_dir.exists()
    found = [f for _, _, fs in os.walk(trace_dir) for f in fs]
    assert found, "no trace files written"
