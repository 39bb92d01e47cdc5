"""Piecewise timing of the sgm_disparity stage on the real TPU: census,
cost volume build, aggregation, WTA, right/LR, speckle.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stage_parts.py
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from online_3d_reconstruction_tpu.stereo.census import (
    census_transform,
    cost_volume_dl,
)
from online_3d_reconstruction_tpu.stereo.sgm import (
    lr_consistency_mask_volume,
    right_disparity_dl,
    sgm_disparity,
    speckle_filter,
    wta_disparity,
)
from online_3d_reconstruction_tpu.config import StereoConfig
from online_3d_reconstruction_tpu.stereo.sgm_pallas import aggregate_fused
from online_3d_reconstruction_tpu.utils.roofline import measure_amortized


def main():
    print("backend:", jax.default_backend(), flush=True)
    h, w, d = 384, 512, 64
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((h, w), dtype=np.float32))
    right = jnp.asarray(rng.random((h, w), dtype=np.float32))

    sec = measure_amortized(
        lambda eps, l: census_transform(l + eps, (5, 5)),
        (jnp.float32(0.0), left), inner=32)
    print(f"census x1: {sec*1e3:.3f} ms", flush=True)

    cen_l = census_transform(left, (5, 5))
    cen_r = census_transform(right, (5, 5))

    def cost_fn(eps, l):
        cl = census_transform(l + eps, (5, 5))
        return cost_volume_dl(cl, cen_r, d).astype(jnp.bfloat16)

    sec = measure_amortized(cost_fn, (jnp.float32(0.0), left), inner=16)
    print(f"census+cost_volume_dl->bf16: {sec*1e3:.3f} ms", flush=True)

    cost = cost_volume_dl(cen_l, cen_r, d).astype(jnp.bfloat16)
    costf = cost.astype(jnp.float32)

    sec = measure_amortized(
        lambda eps, c: aggregate_fused((c + eps).astype(jnp.bfloat16),
                                       8.0, 32.0, 8, dtype=jnp.bfloat16),
        (jnp.float32(0.0), costf), inner=16)
    print(f"aggregate_fused 8p bf16 (incl f32->bf16 cast in): {sec*1e3:.3f} ms",
          flush=True)

    agg = aggregate_fused(cost, 8.0, 32.0, 8, dtype=jnp.bfloat16)
    aggf = agg.astype(jnp.float32)

    sec = measure_amortized(
        lambda eps, a: wta_disparity((a + eps).astype(jnp.bfloat16), 0.95,
                                     True, d_axis=1),
        (jnp.float32(0.0), aggf), inner=16)
    print(f"wta (d_axis=1): {sec*1e3:.3f} ms", flush=True)

    sec = measure_amortized(
        lambda eps, a: right_disparity_dl((a + eps).astype(jnp.bfloat16)),
        (jnp.float32(0.0), aggf), inner=16)
    print(f"right_disparity_dl: {sec*1e3:.3f} ms", flush=True)

    disp, valid = wta_disparity(agg, 0.95, True, d_axis=1)
    disp_r = right_disparity_dl(agg)

    sec = measure_amortized(
        lambda eps, dd: lr_consistency_mask_volume(dd + eps, disp_r, d, 1),
        (jnp.float32(0.0), disp), inner=32)
    print(f"lr_consistency (volume form): {sec*1e3:.3f} ms", flush=True)

    sec = measure_amortized(
        lambda eps, dd: speckle_filter(dd + eps, valid, 50, 1.0),
        (jnp.float32(0.0), disp), inner=8)
    print(f"speckle_filter (run-cross mass): {sec*1e3:.3f} ms", flush=True)

    cfg = StereoConfig(height=h, width=w, max_disparity=d,
                       num_paths=8, use_pallas=True)
    sec = measure_amortized(
        lambda eps, l, r: sgm_disparity(l + eps, r, cfg)[0],
        (jnp.float32(0.0), left, right), inner=8)
    print(f"FULL sgm_disparity 8-path bf16: {sec*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
