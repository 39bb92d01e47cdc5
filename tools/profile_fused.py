"""Measure the v3 fused multi-direction SGM kernel on the real TPU.

Reports: scan_multi per call (h pair, tri), full aggregate_fused 4/8-path,
full sgm_disparity stage, at f32 and bf16 storage — against the v2 numbers
in BASELINE.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fused.py
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from online_3d_reconstruction_tpu.config import StereoConfig
from online_3d_reconstruction_tpu.stereo.sgm import sgm_disparity
from online_3d_reconstruction_tpu.stereo.sgm_pallas import aggregate_fused, scan_multi
from online_3d_reconstruction_tpu.utils.roofline import measure_amortized


def main():
    print("backend:", jax.default_backend(), flush=True)
    h, w, d = 384, 512, 64
    rng = np.random.default_rng(0)
    cost_f32 = jnp.asarray(rng.integers(0, 24, (h, w, d)).astype(np.float32))
    cost_dl_f32 = jnp.swapaxes(cost_f32, 1, 2)  # (H, D, W)

    for dt in (jnp.bfloat16, jnp.float32):
        name = "bf16" if dt == jnp.bfloat16 else "f32"
        cost = cost_dl_f32.astype(dt)

        sec = measure_amortized(
            lambda eps, c: scan_multi((c.astype(jnp.float32) + eps).astype(dt),
                                      8.0, 32.0, diag=False),
            (jnp.float32(0.0), cost), inner=8)
        print(f"[{name}] scan_multi v-pair (no diag): {sec*1e3:.3f} ms", flush=True)

        sec = measure_amortized(
            lambda eps, c: scan_multi((c.astype(jnp.float32) + eps).astype(dt),
                                      8.0, 32.0, diag=True),
            (jnp.float32(0.0), cost), inner=8)
        print(f"[{name}] scan_multi tri (v+2 diag): {sec*1e3:.3f} ms", flush=True)

        for paths in (4, 8):
            sec = measure_amortized(
                lambda eps, c: aggregate_fused(
                    (c.astype(jnp.float32) + eps).astype(dt),
                    8.0, 32.0, paths, dtype=dt),
                (jnp.float32(0.0), cost), inner=8)
            print(f"[{name}] aggregate_fused {paths}-path: {sec*1e3:.3f} ms",
                  flush=True)

    # full disparity stage (census + cost + agg + WTA + LR + speckle)
    left = jnp.asarray(rng.random((h, w), dtype=np.float32))
    right = jnp.asarray(rng.random((h, w), dtype=np.float32))
    for paths in (4, 8):
        cfg = StereoConfig(height=h, width=w, max_disparity=d,
                           num_paths=paths, use_pallas=True)
        sec = measure_amortized(
            lambda eps, l, r: sgm_disparity(l + eps, r, cfg)[0],
            (jnp.float32(0.0), left, right), inner=8)
        print(f"[stage] sgm_disparity {paths}-path bf16: {sec*1e3:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
