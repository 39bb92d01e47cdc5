"""Per-frame dispatch/transfer overhead of the online loop on the relay TPU.

The steady-state frame period (66 ms in an earlier device-resident run)
vastly exceeded the summed kernel times (~5 ms, tools/profile_steady.py);
the culprit was two tiny synchronous host->device uploads per frame (80
bytes each costs a full ~28 ms relay round trip). This tool isolates where
the non-compute time goes:

  a) chained dispatches of the REAL fused steady step with all-device args
     (the pure enqueue+compute throughput the loop could reach);
  b) the same loop but re-uploading the packed frame from numpy per call
     (the wire-on-critical-path behavior);
  c) small/large host->device transfer latency in isolation;
  d) the full engine.process loop (bench device-resident config).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_dispatch.py
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(label, fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dt:.2f} ms/iter", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- c) raw transfer latency -------------------------------------------
    small = np.zeros(20, np.float32)
    big = np.zeros(384 * 512 * 2 + 192 * 256 * 3 + 80, np.uint8)

    t0 = time.perf_counter()
    outs = [jax.device_put(small) for _ in range(20)]
    jax.block_until_ready(outs)
    sync(outs[-1])
    print(f"device_put 80B x20 (async batch): "
          f"{(time.perf_counter()-t0)/20*1e3:.2f} ms/put", flush=True)

    t0 = time.perf_counter()
    for _ in range(20):
        x = jax.device_put(small)
        sync(x)
    print(f"device_put 80B x20 (synced each): "
          f"{(time.perf_counter()-t0)/20*1e3:.2f} ms/put", flush=True)

    t0 = time.perf_counter()
    outs = [jax.device_put(big) for _ in range(8)]
    jax.block_until_ready(outs)
    sync(outs[-1][0].astype(jnp.float32))
    print(f"device_put {big.nbytes/1e6:.2f}MB x8 (async batch): "
          f"{(time.perf_counter()-t0)/8*1e3:.2f} ms/put", flush=True)

    # --- a/b) the real fused steady step ------------------------------------
    from online_3d_reconstruction_tpu.config import (
        BAConfig, FeatureConfig, MappingConfig, MatchConfig, OdometryConfig,
        RuntimeConfig, StereoConfig, PipelineConfig)
    from online_3d_reconstruction_tpu.io.calibration import identity_rig
    from online_3d_reconstruction_tpu.io.dataset import SyntheticSequence
    from online_3d_reconstruction_tpu.io.synthetic import (
        Plateau, SyntheticScene, make_survey_trajectory)
    from online_3d_reconstruction_tpu.runtime.pipeline import (
        OnlineReconstructor)

    h, w, d = 384, 512, 64
    rig = identity_rig(fx=400.0, fy=400.0, cx=w / 2, cy=h / 2, baseline=0.5,
                       width=w, height=h)
    scene = SyntheticScene(seed=5,
                           plateaus=[Plateau(-6.0, 6.0, -4.0, 8.0, 8.0)])
    poses = make_survey_trajectory(32, altitude=30.0, speed=1.2)
    dataset = SyntheticSequence(scene=scene, rig=rig, poses=poses,
                                prior_translation_sigma=0.15,
                                prior_rotation_sigma=0.01)
    cfg = PipelineConfig(
        stereo=StereoConfig(height=h, width=w, max_disparity=d, num_paths=8,
                            use_pallas=True),
        features=FeatureConfig(max_keypoints=512, fast_threshold=5.0),
        odometry=OdometryConfig(ransac_threshold=0.5, max_point_depth=60.0),
        ba=BAConfig(prior_position_weight=1.0 / 0.15**2,
                    prior_rotation_weight=1.0 / 0.01**2),
        mapping=MappingConfig(voxel_size=0.25, map_capacity=2_000_000,
                              frame_point_stride=2, min_depth=1.0,
                              max_depth=60.0),
        runtime=RuntimeConfig(keyframe_translation=0.5, sync_metrics=False),
    )
    frames = [dataset[i] for i in range(len(dataset))]
    engine = OnlineReconstructor(cfg, rig)
    for f in frames[:12]:
        engine.process(f)
    jax.block_until_ready(engine.gmap.points)
    sync(engine._staging.cursor)

    packed_np = engine.pack(frames[12], frame_index=12)
    packed_dev = jax.device_put(packed_np)
    jax.block_until_ready(packed_dev)

    from online_3d_reconstruction_tpu.runtime.pipeline import _steady_step_kf

    kf = engine.keyframes[-1]

    state = {"gmap": engine._staging, "ba": engine._ba_state}

    def step_devbuf():
        out = _steady_step_kf(
            state["gmap"], state["ba"], packed_dev,
            engine.map_left, engine.map_right, engine.q,
            kf.features, kf.pose, kf.prior_pose, engine._key,
            cfg.stereo, cfg.features, cfg.odometry, cfg.mapping,
            cfg.matching, cfg.ba, True, False, True, engine._noise_model)
        state["gmap"], state["ba"] = out[0], out[6]
        return out[1]

    def step_hostbuf():
        out = _steady_step_kf(
            state["gmap"], state["ba"], jnp.asarray(packed_np),
            engine.map_left, engine.map_right, engine.q,
            kf.features, kf.pose, kf.prior_pose, engine._key,
            cfg.stereo, cfg.features, cfg.odometry, cfg.mapping,
            cfg.matching, cfg.ba, True, False, True, engine._noise_model)
        state["gmap"], state["ba"] = out[0], out[6]
        return out[1]

    timeit("steady_step_kf, all-device args (chained)", step_devbuf)
    timeit("steady_step_kf, packed numpy per call", step_hostbuf)

    # --- d) the actual engine loop ------------------------------------------
    engine2 = OnlineReconstructor(cfg, rig)
    for f in frames[:12]:
        engine2.process(f)
    jax.block_until_ready(engine2.gmap.points)
    sync(engine2._staging.cursor)
    packed_list = [jax.device_put(engine2.pack(f, frame_index=12 + i))
                   for i, f in enumerate(frames[12:])]
    jax.block_until_ready(packed_list)
    t0 = time.perf_counter()
    for f, p in zip(frames[12:], packed_list):
        engine2.process(f, packed=p)
    jax.block_until_ready(engine2.gmap.points)
    sync(engine2._staging.cursor)
    n = len(packed_list)
    print(f"engine.process loop, device-resident packed: "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms/frame", flush=True)

    # streamed: numpy packed buffers on the critical path
    engine3 = OnlineReconstructor(cfg, rig)
    for f in frames[:12]:
        engine3.process(f)
    jax.block_until_ready(engine3.gmap.points)
    sync(engine3._staging.cursor)
    np_list = [engine3.pack(f, frame_index=12 + i)
               for i, f in enumerate(frames[12:])]
    t0 = time.perf_counter()
    for f, p in zip(frames[12:], np_list):
        engine3.process(f, packed=p)
    jax.block_until_ready(engine3.gmap.points)
    sync(engine3._staging.cursor)
    print(f"engine.process loop, streamed packed (pre-packed numpy): "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
