"""Measure where the steady-state frame's wall clock goes on the relay TPU.

Breaks the ~92 ms/frame of BENCH_r01 into: host packing, host->device upload,
dispatch-enqueue round trip, and device compute — to decide between async
overlap and frame micro-batching. Timing uses forced host fetches (CLAUDE.md:
block_until_ready can return early through the tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_relay.py
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
    return float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[0])


def main():
    print("backend:", jax.default_backend(), flush=True)

    # 1. null dispatch round trip (tiny jitted fn)
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    sync(f(x))
    for name, reps in (("enqueue", 20), ("synced", 10)):
        t0 = time.perf_counter()
        if name == "enqueue":
            y = x
            for _ in range(reps):
                y = f(y)
            dt_unsynced = (time.perf_counter() - t0) / reps
            sync(y)
            dt_total = (time.perf_counter() - t0) / reps
            print(f"null dispatch: enqueue {dt_unsynced*1e3:.2f} ms, "
                  f"chained+sync {dt_total*1e3:.2f} ms", flush=True)
        else:
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(f(x))
                ts.append(time.perf_counter() - t0)
            print(f"null dispatch synced each: {np.median(ts)*1e3:.2f} ms", flush=True)

    # 2. upload 3.9 MB (the packed frame) — enqueue vs synced
    packed = np.random.rand(384, 512, 5).astype(np.float32)
    g = jax.jit(lambda p: p.sum())
    sync(g(jnp.asarray(packed)))
    ts_up, ts_upsync = [], []
    for _ in range(10):
        t0 = time.perf_counter()
        d = jnp.asarray(packed)
        ts_up.append(time.perf_counter() - t0)
        sync(g(d))
        ts_upsync.append(time.perf_counter() - t0)
    print(f"upload 3.9MB: jnp.asarray {np.median(ts_up)*1e3:.2f} ms, "
          f"+reduce+sync {np.median(ts_upsync)*1e3:.2f} ms", flush=True)

    # 3. the real steady step, enqueued back-to-back vs synced each frame
    from online_3d_reconstruction_tpu.config import (
        FeatureConfig, MappingConfig, OdometryConfig, PipelineConfig,
        RuntimeConfig, StereoConfig)
    from online_3d_reconstruction_tpu.io.calibration import identity_rig
    from online_3d_reconstruction_tpu.io.dataset import SyntheticSequence
    from online_3d_reconstruction_tpu.io.synthetic import (
        Plateau, SyntheticScene, make_survey_trajectory)
    from online_3d_reconstruction_tpu.runtime.pipeline import (
        OnlineReconstructor, pack_frame)

    h, w, d = 384, 512, 64
    rig = identity_rig(fx=400.0, fy=400.0, cx=w / 2, cy=h / 2, baseline=0.5,
                       width=w, height=h)
    scene = SyntheticScene(seed=5, plateaus=[Plateau(-6.0, 6.0, -4.0, 8.0, 8.0)])
    n = 40
    poses = make_survey_trajectory(n, altitude=30.0, speed=1.2)
    dataset = SyntheticSequence(scene=scene, rig=rig, poses=poses)
    cfg = PipelineConfig(
        stereo=StereoConfig(height=h, width=w, max_disparity=d, num_paths=8,
                            use_pallas=True),
        features=FeatureConfig(max_keypoints=512, fast_threshold=5.0),
        odometry=OdometryConfig(ransac_threshold=0.5, max_point_depth=60.0),
        mapping=MappingConfig(voxel_size=0.25, map_capacity=2_000_000,
                              frame_point_stride=2, min_depth=1.0,
                              max_depth=60.0),
        runtime=RuntimeConfig(keyframe_translation=0.5, sync_metrics=False),
    )
    frames = [dataset[i] for i in range(n)]
    engine = OnlineReconstructor(cfg, rig)
    t0 = time.perf_counter()
    for f_ in frames[:12]:
        engine.process(f_)
    jax.block_until_ready(engine.gmap.points)
    sync(engine._staging.cursor)
    print(f"warmup 12 frames: {time.perf_counter()-t0:.1f} s", flush=True)

    # per-frame enqueue time (host-side blocking part of process())
    host_ts = []
    t_all0 = time.perf_counter()
    for f_ in frames[12:32]:
        t0 = time.perf_counter()
        engine.process(f_)
        host_ts.append(time.perf_counter() - t0)
    t_enq = time.perf_counter() - t_all0
    sync(engine._staging.cursor)
    t_all = time.perf_counter() - t_all0
    print(f"20 steady frames: host-side process() total {t_enq*1e3:.1f} ms "
          f"(median {np.median(host_ts)*1e3:.2f} ms/frame, "
          f"max {np.max(host_ts)*1e3:.2f}), wall incl final sync "
          f"{t_all*1e3:.1f} ms -> {t_all/20*1e3:.2f} ms/frame", flush=True)

    # host pack cost alone
    t0 = time.perf_counter()
    for f_ in frames[12:32]:
        pack_frame(f_)
    print(f"pack_frame: {(time.perf_counter()-t0)/20*1e3:.2f} ms/frame", flush=True)

    # per-frame synced (upper bound: every dispatch waited for)
    ts = []
    for f_ in frames[32:40]:
        t0 = time.perf_counter()
        engine.process(f_)
        sync(engine._staging.cursor)
        ts.append(time.perf_counter() - t0)
    print(f"synced-each-frame: median {np.median(ts)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
