"""Benchmark harness: end-to-end frames/s/chip on the full online pipeline.

Headline metric (BASELINE.json:2): frames/s/chip for stereo -> fused cloud —
the complete per-frame path (rectify, census+SGM disparity, FAST/BRIEF
features, matmul matching, RANSAC pose correction, window BA, voxel fusion)
on a synthetic 512x384 survey sequence with GT-checked output quality.

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Detailed breakdown goes to stderr and BENCH_DETAIL.json, including:
- ATE ablations: full stack vs VO-only (no BA) vs prior-only dead reckoning.
- Frame-time attribution: streamed (honest online, host->device wire on the
  critical path) vs device-resident frames (pure compute+dispatch), so the
  wire share of the frame period is explicit.
- Per-kernel rooflines that REFUSE to publish impossible numbers: any
  measurement the relay noise floor can't resolve is reported as
  {"invalid": ...} (see roofline.measure_amortized / RooflinePoint.report).

vs_baseline: the reference publishes no numbers (BASELINE.md; driver's
"published": {}), so the denominator is the documented proxy of 10 frames/s
for the reference OpenCV SGBM+ORB pipeline at this resolution on a
CPU+CUDA workstation — see BASELINE.md for the derivation and caveats.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

# persistent compilation cache: repeat bench runs skip the 30-40s compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REFERENCE_PROXY_FPS = 10.0


def _progress(msg: str) -> None:
    """Stderr-only heartbeat (never touches the stdout JSON contract): with a
    relay-attached chip a run spends minutes in opaque device waits, and the
    round-4 postmortem could not tell a slow stage from a wedged tunnel."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()

# the synthetic flight log's declared sensor noise — the estimator is
# configured with the TRUE information weights (1/sigma^2), as any fielded
# GPS-aided system would be
PRIOR_T_SIGMA = 0.15   # m
PRIOR_R_SIGMA = 0.01   # rad


def _no_nan(x):
    return None if (isinstance(x, float) and not math.isfinite(x)) else x


def _kernel_benchmarks() -> dict:
    """Roofline-instrumented microbenches of the mandated kernels
    (BASELINE.json:5: disparity + BA rooflines, BA iters/s)."""
    import jax
    import jax.numpy as jnp

    from online_3d_reconstruction_tpu.ba.schur import solve_ba
    from online_3d_reconstruction_tpu.ba.testing import make_synthetic_bundle
    from online_3d_reconstruction_tpu.features.match import match_descriptors
    from online_3d_reconstruction_tpu.stereo.sgm_pallas import aggregate_fused
    from online_3d_reconstruction_tpu.utils import roofline

    rng = np.random.default_rng(0)
    out = {}
    on_tpu = jax.default_backend() == "tpu"
    _progress("kernel microbenches: start")

    # Kernel times are amortized over an in-jit scan so the relay's
    # per-dispatch round trip (tens of ms here) doesn't masquerade as kernel
    # time; measure_amortized raises the repeat count until the N-x run
    # clears the noise floor, else returns nan (reported as invalid).

    # SGM aggregation (the #1 roofline target) — production config: fused
    # multi-direction kernel, (H, D, W) layout, bf16 storage, 8 paths
    h, w, d = 384, 512, 64
    cost = jnp.asarray(
        np.swapaxes(rng.integers(0, 24, (h, w, d)), 1, 2).astype(np.float32)
    )
    if on_tpu:
        sec = roofline.measure_amortized(
            lambda c: aggregate_fused(c.astype(jnp.bfloat16), 8.0, 32.0, 8,
                                      dtype=jnp.bfloat16),
            (cost,), inner=64,
        )
        out["sgm_aggregation"] = roofline.sgm_aggregation_model(
            h, w, d, 8, sec, itemsize=2).report()
        _progress("kernel microbenches: sgm_aggregation done")

    # descriptor matching matmul
    ka = kb = 512
    desc_a = jnp.asarray(rng.integers(0, 2**32, (ka, 8), dtype=np.uint32))
    desc_b = jnp.asarray(rng.integers(0, 2**32, (kb, 8), dtype=np.uint32))
    va = jnp.ones(ka, bool)
    sec = roofline.measure_amortized(
        lambda eps, a, b: match_descriptors(a, b, va & (eps < 1e9), va),
        (jnp.float32(0.0), desc_a, desc_b), inner=64,
    )
    out["matching"] = roofline.matching_model(ka, kb, 256, sec).report()
    _progress("kernel microbenches: matching done")

    # BA: dense-Schur GN iterations/s at the sliding-window size ...
    problem, _, _ = make_synthetic_bundle(np.random.default_rng(1), w=8, l=256,
                                          obs_noise=0.02, n_cap=2048)
    gn_iters = 5
    sec = roofline.measure_amortized(
        lambda eps, p: solve_ba(p._replace(obs_point=p.obs_point + eps),
                                iters=gn_iters, damping=1e-4, huber_delta=0.5),
        (jnp.float32(0.0), problem), inner=6,
    )
    rep = roofline.ba_schur_model(8, 256, 2048, gn_iters, sec).report()
    rep["ba_iters_per_s"] = _no_nan(gn_iters / sec)
    out["ba_schur"] = rep
    _progress("kernel microbenches: ba_schur w8 done")

    # ... and at blueprint scale (SURVEY.md:424 "sliding 100-keyframe
    # window"): W=64, L=2048, 512 obs/frame, slot-major accumulation
    w64, l64, k64 = 64, 2048, 512
    problem64, _, _ = make_synthetic_bundle(
        np.random.default_rng(2), w=w64, l=l64, obs_noise=0.02,
        n_cap=w64 * k64, obs_per_kf=k64)
    sec = roofline.measure_amortized(
        lambda eps, p: solve_ba(p._replace(obs_point=p.obs_point + eps),
                                iters=gn_iters, damping=1e-4, huber_delta=0.5,
                                slot_major=k64),
        (jnp.float32(0.0), problem64), inner=4, max_inner=32,
    )
    rep = roofline.ba_schur_model(w64, l64, w64 * k64, gn_iters, sec).report()
    rep["ba_iters_per_s"] = _no_nan(gn_iters / sec)
    out["ba_schur_w64"] = rep
    _progress("kernel microbenches: ba_schur w64 done")
    return out


def _make_bench_setup():
    from online_3d_reconstruction_tpu.config import (
        BAConfig,
        FeatureConfig,
        MappingConfig,
        OdometryConfig,
        PipelineConfig,
        RuntimeConfig,
        StereoConfig,
    )
    from online_3d_reconstruction_tpu.io.calibration import (
        CameraIntrinsics,
        StereoCalibration,
        stereo_rectify,
    )
    from online_3d_reconstruction_tpu.io.dataset import SyntheticSequence
    from online_3d_reconstruction_tpu.io.synthetic import (
        Plateau,
        SyntheticScene,
        make_survey_trajectory,
    )
    import numpy as np
    import jax

    backend = jax.default_backend()
    h, w, d = 384, 512, 64
    # DISTORTED stereo rig: the reference's per-frame loop rectifies raw
    # camera input (SURVEY.md:228), so the headline must include remap. The
    # radial/tangential terms put ~8-15 px of warp at the image boundary —
    # inside the feature border (20 px), so the fill region never spawns
    # static fake corners.
    cam = CameraIntrinsics(fx=400.0, fy=400.0, cx=w / 2, cy=h / 2,
                           width=w, height=h,
                           dist=(-0.08, 0.01, 3e-4, -3e-4, 0.0))
    calib = StereoCalibration(left=cam, right=cam,
                              translation=np.array([-0.5, 0.0, 0.0]))
    rig = stereo_rectify(calib)
    # supersample=2: box pixel-footprint anti-aliasing (a real sensor
    # integrates over the pixel) — required for subpixel feature
    # localization to be physically observable in the oracle
    scene = SyntheticScene(seed=5, plateaus=[Plateau(-6.0, 6.0, -4.0, 8.0, 8.0)],
                           supersample=2)
    # warmup must traverse every compiled path: keyframes, a full BA window
    # (static width ba.window), and one periodic map downsample
    n_warmup, n_timed = 12, 20
    poses = make_survey_trajectory(n_warmup + n_timed, altitude=30.0, speed=1.2)
    dataset = SyntheticSequence(scene=scene, rig=rig, poses=poses,
                                prior_translation_sigma=PRIOR_T_SIGMA,
                                prior_rotation_sigma=PRIOR_R_SIGMA,
                                calib=calib)

    cfg = PipelineConfig(
        stereo=StereoConfig(height=h, width=w, max_disparity=d, num_paths=8,
                            use_pallas=(backend == "tpu")),
        features=FeatureConfig(max_keypoints=512, fast_threshold=5.0),
        odometry=OdometryConfig(ransac_threshold=0.5, max_point_depth=60.0),
        # measured-optimal estimator config (tools/ate_lab.py r5 sweeps on
        # cached real-SGM disparity): W=24 window with landmark capacity
        # scaled to the track count (L=512 silently dropped most multi-frame
        # tracks and made W>8 WORSE), sigma_disparity=1.0 absorbing the
        # frame-correlated SGM bias (tools/sgm_cache_tpu.py: rms 0.27 px but
        # per-frame mean bias +0.02..+0.12 px), sigma_pixel=0.5 for the
        # subpixel features, full 3x3 ray-coupled information, huber at 3
        # sigma. Cached-SGM ATE: 0.47x prior-only (target <= 0.5x).
        # L=2048 and gn_iters=3 are ATE-IDENTICAL to L=4096/gn5 at W=24 on
        # the cached-SGM sweeps (0.47x all three) at ~40% of the solve cost
        ba=BAConfig(obs_weighting=True, sigma_pixel=0.5, sigma_disparity=1.0,
                    huber_delta=3.0, window=24, max_landmarks=2048,
                    gn_iters=3,
                    prior_position_weight=1.0 / PRIOR_T_SIGMA**2,
                    prior_rotation_weight=1.0 / PRIOR_R_SIGMA**2),
        # color at stride 4 (points at 2): color is ~27% of the upload and
        # purely cosmetic after voxel averaging; the relay wire's ~20-25 MB/s
        # caps the streamed rate at BW/frame_bytes, so fewer bytes = fps
        mapping=MappingConfig(voxel_size=0.25, map_capacity=2_000_000,
                              frame_point_stride=2, color_stride=4,
                              min_depth=1.0, max_depth=60.0),
        runtime=RuntimeConfig(keyframe_translation=0.5, sync_metrics=False),
    )
    return backend, (h, w, d), rig, dataset, cfg, n_warmup, n_timed


def _run_engine(cfg, rig, frames, n_warmup, n_timed, pre_upload: bool):
    """Warm up, then time n_timed frames. ``pre_upload`` stages the packed
    uint8 frames on the device first, removing the host->device wire from
    the critical path (the compute+dispatch bound)."""
    import jax
    import jax.numpy as jnp

    from online_3d_reconstruction_tpu.runtime.pipeline import (
        OnlineReconstructor,
        pack_frame,
    )

    engine = OnlineReconstructor(cfg, rig)
    _progress(f"engine run (pre_upload={pre_upload}): warmup "
              f"{n_warmup} frames")
    for i, f in enumerate(frames[:n_warmup]):
        engine.process(f)
        if i % 4 == 3:
            _progress(f"  warmup frame {i + 1}/{n_warmup} dispatched")
    jax.block_until_ready(engine.gmap.points)
    float(jnp.asarray(engine._staging.cursor))  # forced fetch: true barrier
    _progress("  warmup complete; timing")

    timed = frames[n_warmup:n_warmup + n_timed]
    packed_list = None
    if pre_upload:
        packed_list = [
            jax.device_put(engine.pack(f, frame_index=n_warmup + i))
            for i, f in enumerate(timed)
        ]
        jax.block_until_ready(packed_list)

    t0 = time.perf_counter()
    if packed_list is not None:
        for f, p in zip(timed, packed_list):
            engine.process(f, packed=p)
    else:
        # honest online path: the P5 worker thread packs + uploads ahead
        # while the device crunches the current frame (runtime/prefetch.py)
        from online_3d_reconstruction_tpu.runtime.prefetch import device_prefetch

        for f, p in device_prefetch(iter(timed), engine, depth=2):
            engine.process(f, packed=p)
    jax.block_until_ready(engine.gmap.points)
    float(jnp.asarray(engine._staging.cursor))
    elapsed = time.perf_counter() - t0
    _progress(f"  timed {n_timed} frames in {elapsed:.2f}s")
    result = engine.finish(warmup_frames=n_warmup)
    return elapsed, result


def main() -> None:
    import jax

    from online_3d_reconstruction_tpu.utils.metrics import ate_rmse

    backend, (h, w, d), rig, dataset, cfg, n_warmup, n_timed = _make_bench_setup()

    # pre-render all frames so host rendering doesn't pollute device timing
    _progress(f"rendering {len(dataset)} synthetic frames on host")
    frames = [dataset[i] for i in range(len(dataset))]
    _progress("render done")
    gt = np.stack([f.gt_pose for f in frames])
    priors = np.stack([f.prior_pose for f in frames])

    # --- headline: streamed frames (honest online: wire on critical path) ---
    elapsed, result = _run_engine(cfg, rig, frames, n_warmup, n_timed,
                                  pre_upload=False)
    fps = n_timed / elapsed
    ate_full = ate_rmse(result.trajectory, gt)

    # --- attribution: device-resident frames (compute + dispatch only) ------
    elapsed_dev, _ = _run_engine(cfg, rig, frames, n_warmup, n_timed,
                                 pre_upload=True)
    fps_dev = n_timed / elapsed_dev
    frame_ms, frame_dev_ms = 1e3 * elapsed / n_timed, 1e3 * elapsed_dev / n_timed

    # --- ATE ablations (VERDICT r2 #3b): the vision stack must actually earn
    # its keep over dead-reckoning on the raw flight-log priors ---------------
    import dataclasses
    ate_prior_only = ate_rmse(priors, gt)
    cfg_vo = cfg.replace(runtime=dataclasses.replace(
        cfg.runtime, ba_every_keyframe=False))
    _progress("VO-only ablation run")
    _, res_vo = _run_engine(cfg_vo, rig, frames, n_warmup, n_timed,
                            pre_upload=True)
    ate_vo_only = ate_rmse(res_vo.trajectory, gt)
    # aligned ATE is the standard odometry protocol: the VO chain anchors at
    # the (noisy) first prior, so even PERFECT vision has unaligned ATE equal
    # to |that anchor error| ~ the prior noise itself — the unaligned number
    # measures the anchor gauge, not the vision (see BASELINE.md ATE section)
    ate_vo_aligned = ate_rmse(res_vo.trajectory, gt, align=True)
    ate_prior_aligned = ate_rmse(priors, gt, align=True)

    kernels = _kernel_benchmarks()

    from online_3d_reconstruction_tpu.runtime.pipeline import pack_frame
    from online_3d_reconstruction_tpu.runtime.pipeline import _color_stride
    cs = _color_stride(cfg.mapping)
    t0 = time.perf_counter()
    for f in frames[n_warmup:n_warmup + n_timed]:
        pack_frame(f, color_stride=cs)
    pack_ms = (time.perf_counter() - t0) / n_timed * 1e3
    upload_bytes = pack_frame(frames[0], color_stride=cs).nbytes

    detail = {
        "kernels": kernels,
        "backend": backend,
        "frames_timed": n_timed,
        "elapsed_s": elapsed,
        "frames_per_s_per_chip": fps,
        "frame_attribution_ms": {
            "frame_period_streamed": frame_ms,
            "frame_period_device_resident": frame_dev_ms,
            "host_to_device_wire": frame_ms - frame_dev_ms,
            "host_pack": pack_ms,
            "upload_bytes_per_frame": upload_bytes,
        },
        "frames_per_s_device_resident": fps_dev,
        "ate_m": {
            "full_stack": ate_full,
            "vo_only_no_ba": ate_vo_only,
            "vo_only_no_ba_aligned": ate_vo_aligned,
            "prior_only_dead_reckoning": ate_prior_only,
            "prior_only_aligned": ate_prior_aligned,
            "prior_noise_sigma_t": PRIOR_T_SIGMA,
        },
        "map_points": int(len(result.map_points)),
        "stage_means_ms": {
            k: v for k, v in result.metrics.items() if k.startswith("t_")
        },
        "resolution": f"{w}x{h}x{d}",
        "vs_baseline_denominator": REFERENCE_PROXY_FPS,
    }
    print(json.dumps(detail), file=sys.stderr)
    with open("BENCH_DETAIL.json", "w") as fh:
        json.dump(detail, fh, indent=2)

    print(json.dumps({
        "metric": "frames/s/chip (stereo->fused cloud, 512x384xD64, 8-path SGM)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_PROXY_FPS, 3),
    }))


def _emergency_exit(reason: str) -> None:
    """The driver must always get its one JSON line, even if the TPU tunnel
    hangs or a stage dies: report a zero measurement rather than nothing."""
    print(json.dumps({"error": reason}), file=sys.stderr)
    print(json.dumps({
        "metric": "frames/s/chip (stereo->fused cloud, 512x384xD64, 8-path SGM)",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
    }))
    os._exit(1)


if __name__ == "__main__":
    import signal

    signal.signal(signal.SIGALRM, lambda *_: _emergency_exit("watchdog timeout"))
    signal.alarm(int(os.environ.get("O3R_BENCH_TIMEOUT_S", "1500")))
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        _emergency_exit(f"{type(e).__name__}: {e}")
