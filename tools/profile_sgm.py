"""Break down aggregate_pallas time on the real TPU: per-pair scans vs
skew/deskew vs inter-pair sums, at f32 vs bf16 storage.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_sgm.py
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from online_3d_reconstruction_tpu.stereo.sgm_pallas import aggregate_pallas, scan_pair
from online_3d_reconstruction_tpu.stereo.sgm import _skew, _deskew
from online_3d_reconstruction_tpu.utils.roofline import measure_amortized


def bw(bytes_, sec):
    return bytes_ / sec / 1e9


def main():
    print("backend:", jax.default_backend(), flush=True)
    h, w, d = 384, 512, 64
    rng = np.random.default_rng(0)
    cost_f32 = jnp.asarray(rng.integers(0, 24, (h, w, d)).astype(np.float32))

    for dt, nb in ((jnp.float32, 4), (jnp.bfloat16, 2)):
        cost = cost_f32.astype(dt)
        name = np.dtype(dt).name if dt != jnp.bfloat16 else "bf16"
        # vertical pair: (H, W, D) scan along H. 5 volume passes of S*L*D.
        sec = measure_amortized(
            lambda eps, c: scan_pair((c.astype(jnp.float32) + eps).astype(dt), 8.0, 32.0),
            (jnp.float32(0.0), cost), inner=8)
        vol = h * w * d * nb
        print(f"[{name}] vertical scan_pair: {sec*1e3:.3f} ms "
              f"(5 passes -> {bw(5*vol, sec):.0f} GB/s eff)", flush=True)

        # horizontal pair: transpose + scan + transpose back
        sec = measure_amortized(
            lambda eps, c: jnp.swapaxes(
                scan_pair(jnp.swapaxes((c.astype(jnp.float32) + eps).astype(dt), 0, 1),
                          8.0, 32.0), 0, 1),
            (jnp.float32(0.0), cost), inner=8)
        print(f"[{name}] horizontal (swap+scan+swap): {sec*1e3:.3f} ms", flush=True)

        # one diagonal: skew + scan + deskew
        sec = measure_amortized(
            lambda eps, c: _deskew(
                scan_pair(_skew((c.astype(jnp.float32) + eps).astype(dt), 1),
                          8.0, 32.0).astype(jnp.float32), 1, w),
            (jnp.float32(0.0), cost), inner=8)
        print(f"[{name}] diagonal (skew+scan+deskew): {sec*1e3:.3f} ms", flush=True)

        # skew alone
        sec = measure_amortized(
            lambda eps, c: _skew((c.astype(jnp.float32) + eps).astype(dt), 1),
            (jnp.float32(0.0), cost), inner=8)
        print(f"[{name}] skew alone: {sec*1e3:.3f} ms", flush=True)

        # full 8-path
        sec = measure_amortized(
            lambda eps, c: aggregate_pallas((c.astype(jnp.float32) + eps).astype(dt),
                                            8.0, 32.0, 8, dtype=dt),
            (jnp.float32(0.0), cost), inner=8)
        print(f"[{name}] FULL aggregate_pallas 8-path: {sec*1e3:.3f} ms", flush=True)

        # full 4-path
        sec = measure_amortized(
            lambda eps, c: aggregate_pallas((c.astype(jnp.float32) + eps).astype(dt),
                                            8.0, 32.0, 4, dtype=dt),
            (jnp.float32(0.0), cost), inner=8)
        print(f"[{name}] FULL aggregate_pallas 4-path: {sec*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
