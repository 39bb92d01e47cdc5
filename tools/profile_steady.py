"""Amortized timing of every piece of the steady-state frame dispatch on the
real TPU: unpack+rectify, SGM, features, tracking, BA keyframe core, fusion.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_steady.py
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from online_3d_reconstruction_tpu.ba.device_tracks import (
    build_problem,
    create_window,
    keyframe_core,
)
from online_3d_reconstruction_tpu.config import (
    BAConfig, FeatureConfig, MappingConfig, MatchConfig, OdometryConfig,
    StereoConfig)
from online_3d_reconstruction_tpu.features.brief import (
    describe_keypoints,
    detect_and_describe,
)
from online_3d_reconstruction_tpu.features.fast import detect_keypoints
from online_3d_reconstruction_tpu.features.match import match_descriptors
from online_3d_reconstruction_tpu.geometry.backproject import backproject_disparity
from online_3d_reconstruction_tpu.io.calibration import identity_rig
from online_3d_reconstruction_tpu.io.synthetic import (
    Plateau, SyntheticScene, nadir_pose)
from online_3d_reconstruction_tpu.mapping.global_map import create_map, insert_cloud
from online_3d_reconstruction_tpu.odometry.frontend import (
    extract_frame_features, tracking_step)
from online_3d_reconstruction_tpu.stereo.rectify import rectify_pair
from online_3d_reconstruction_tpu.stereo.sgm import sgm_disparity
from online_3d_reconstruction_tpu.utils.roofline import measure_amortized


def t(label, fn, args, inner=8):
    sec = measure_amortized(fn, args, inner=inner)
    print(f"{label}: {sec*1e3:.3f} ms", flush=True)
    return sec


def main():
    print("backend:", jax.default_backend(), flush=True)
    h, w, d = 384, 512, 64
    rig = identity_rig(fx=400.0, fy=400.0, cx=w / 2, cy=h / 2, baseline=0.5,
                       width=w, height=h)
    scene = SyntheticScene(seed=5, plateaus=[Plateau(-6.0, 6.0, -4.0, 8.0, 8.0)])
    fr = scene.render_stereo(nadir_pose(0, 0, 30.0), rig)
    q = jnp.asarray(rig.q, dtype=jnp.float32)
    map_l = jnp.asarray(rig.map_left)
    map_r = jnp.asarray(rig.map_right)

    stereo = StereoConfig(height=h, width=w, max_disparity=d, num_paths=8,
                          use_pallas=True)
    feat = FeatureConfig(max_keypoints=512, fast_threshold=5.0)
    odo = OdometryConfig(ransac_threshold=0.5, max_point_depth=60.0)
    match_cfg = MatchConfig()
    mapping = MappingConfig(voxel_size=0.25, frame_point_stride=2,
                            min_depth=1.0, max_depth=60.0)
    ba_cfg = BAConfig(prior_position_weight=1 / 0.15**2,
                      prior_rotation_weight=1e4)

    left = jnp.asarray(fr.left)
    right = jnp.asarray(fr.right)

    t("rectify_pair", lambda eps, l: rectify_pair(l + eps, right, map_l, map_r),
      (jnp.float32(0.0), left))
    t("sgm_disparity 8p", lambda eps, l: sgm_disparity(l + eps, right, stereo)[0],
      (jnp.float32(0.0), left))

    disp, _ = sgm_disparity(left, right, stereo)

    kw = dict(max_keypoints=feat.max_keypoints,
              threshold=feat.fast_threshold / 255.0, arc=feat.fast_arc,
              nms_radius=feat.nms_radius, border=feat.border,
              grid_tiles=feat.grid_tiles)
    t("detect_keypoints (FAST+topk)",
      lambda eps, l: detect_keypoints(l + eps, **kw),
      (jnp.float32(0.0), left))
    xy, score, kvalid = detect_keypoints(left, **kw)
    t("describe_keypoints (BRIEF)",
      lambda eps, l: describe_keypoints(l + eps, xy, score, kvalid, feat),
      (jnp.float32(0.0), left))
    t("detect_and_describe",
      lambda eps, l: detect_and_describe(l + eps, feat),
      (jnp.float32(0.0), left))
    t("extract_frame_features (all)",
      lambda eps, l: extract_frame_features(l + eps, disp, q, feat, odo),
      (jnp.float32(0.0), left))

    feats = extract_frame_features(left, disp, q, feat, odo)
    t("match_descriptors",
      lambda eps: match_descriptors(feats.keypoints.descriptors,
                                    feats.keypoints.descriptors,
                                    feats.valid3d & (eps < 1e9), feats.valid3d),
      (jnp.float32(0.0),))

    key = jax.random.PRNGKey(0)
    eye = jnp.eye(4)
    t("tracking_step (match+RANSAC+IRLS)",
      lambda eps: tracking_step(feats, feats, eye, eye, eye + eps * 0,
                                key, jnp.int32(1), match_cfg, odo),
      (jnp.float32(0.0),))

    t("backproject_disparity",
      lambda eps, dd: backproject_disparity(dd + eps, left, q, stride=2,
                                            min_depth=1.0, max_depth=60.0),
      (jnp.float32(0.0), disp))
    cloud = backproject_disparity(disp, left, q, stride=2, min_depth=1.0,
                                  max_depth=60.0)

    gmap = create_map(8 * 49152)
    t("insert_cloud (staging append)",
      lambda eps: insert_cloud(gmap, cloud._replace(
          points=cloud.points + eps)),
      (jnp.float32(0.0),))

    # BA keyframe core: append + track build + dense Schur solve
    state = create_window(ba_cfg.window, feat.max_keypoints)
    for i in range(ba_cfg.window):
        state, _, _ = keyframe_core(
            state, feats.points3d, feats.valid3d,
            jnp.arange(feat.max_keypoints, dtype=jnp.int32),
            feats.valid3d, eye, eye, ba_cfg)
    t("ba keyframe_core (full window)",
      lambda eps: keyframe_core(state, feats.points3d + eps, feats.valid3d,
                                jnp.arange(feat.max_keypoints, dtype=jnp.int32),
                                feats.valid3d, eye, eye, ba_cfg)[1],
      (jnp.float32(0.0),), inner=6)
    t("ba build_problem only",
      lambda eps: build_problem(state._replace(
          points3d=state.points3d + eps), ba_cfg.max_landmarks)[0].landmarks,
      (jnp.float32(0.0),), inner=6)


if __name__ == "__main__":
    main()
