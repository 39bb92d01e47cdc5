"""TPU-gated Mosaic compile tests for the production Pallas kernels.

The rest of the suite forces the CPU backend (conftest) and exercises the
Pallas kernels only with ``interpret=True``, which validates semantics but
NOT Mosaic lowering of the shipped kernel. These tests compile the real
kernel on the real chip and compare against the portable ``lax.scan``
aggregation — closing the gap where the driver's bench run was the only
Mosaic evidence.

Run explicitly (the normal suite auto-skips these on CPU):

    O3R_TEST_TPU=1 python -m pytest tests/test_tpu_pallas.py -q
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic compile test needs the real TPU backend (O3R_TEST_TPU=1)",
)


@pytest.mark.parametrize("num_paths", [2, 4, 8])
def test_aggregate_fused_compiles_and_matches_scan(num_paths):
    from online_3d_reconstruction_tpu.stereo.sgm import aggregate_scan
    from online_3d_reconstruction_tpu.stereo.sgm_pallas import aggregate_fused

    rng = np.random.default_rng(0)
    h, w, d = 96, 256, 32
    cost_hwd = rng.integers(0, 24, size=(h, w, d)).astype(np.float32)
    cost_hdw = jnp.asarray(np.swapaxes(cost_hwd, 1, 2))

    got = np.swapaxes(
        np.asarray(aggregate_fused(cost_hdw, 8.0, 32.0, num_paths,
                                   dtype=jnp.float32)), 1, 2)
    want = np.asarray(aggregate_scan(jnp.asarray(cost_hwd), 8.0, 32.0,
                                     num_paths))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_aggregate_fused_bf16_wta_agreement():
    """bf16 storage rounds path sums; WTA argmins must still agree almost
    everywhere (the documented <0.5% tie-flip tolerance, config.cost_dtype)."""
    from online_3d_reconstruction_tpu.stereo.sgm import aggregate_scan
    from online_3d_reconstruction_tpu.stereo.sgm_pallas import aggregate_fused

    rng = np.random.default_rng(1)
    h, w, d = 96, 256, 32
    cost_hwd = rng.integers(0, 24, size=(h, w, d)).astype(np.float32)
    cost_hdw = jnp.asarray(np.swapaxes(cost_hwd, 1, 2).astype(np.float32))

    got = np.asarray(aggregate_fused(cost_hdw.astype(jnp.bfloat16), 8.0, 32.0,
                                     8, dtype=jnp.bfloat16).astype(jnp.float32))
    want = np.asarray(aggregate_scan(jnp.asarray(cost_hwd), 8.0, 32.0, 8))
    wta_got = got.argmin(axis=1)           # (H, W) over D (HDW layout)
    wta_want = np.swapaxes(want, 1, 2).argmin(axis=1)
    mismatch = float((wta_got != wta_want).mean())
    assert mismatch < 0.005


def test_sgm_disparity_tpu_pipeline_quality():
    """Whole C5 stage (census -> fused Pallas -> WTA/LR/speckle) compiled on
    TPU against the synthetic GT oracle."""
    from online_3d_reconstruction_tpu.config import StereoConfig
    from online_3d_reconstruction_tpu.io.calibration import identity_rig
    from online_3d_reconstruction_tpu.io.synthetic import SyntheticScene, nadir_pose
    from online_3d_reconstruction_tpu.stereo.sgm import sgm_disparity

    h, w = 192, 256
    rig = identity_rig(fx=200.0, fy=200.0, cx=w / 2, cy=h / 2, baseline=0.5,
                       width=w, height=h)
    frame = SyntheticScene(seed=3).render_stereo(nadir_pose(0.0, 0.0, 24.0), rig)
    cfg = StereoConfig(height=h, width=w, max_disparity=32, num_paths=8,
                       use_pallas=True)
    disp, valid = sgm_disparity(jnp.asarray(frame.left),
                                jnp.asarray(frame.right), cfg)
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    gt = frame.gt_disparity
    ok = valid & (gt > 0)
    density = ok.mean()
    bad1 = (np.abs(disp[ok] - gt[ok]) > 1.0).mean()
    assert density > 0.9
    assert bad1 < 0.02


def test_speckle_pallas_compiles_and_matches_on_chip():
    """Mosaic-compile the fused speckle kernel on the real chip and assert
    it matches the XLA associative-scan form exactly at the bench shape."""
    import numpy as np
    import jax.numpy as jnp

    from online_3d_reconstruction_tpu.stereo.sgm import speckle_filter
    from online_3d_reconstruction_tpu.stereo.sgm_pallas import (
        speckle_filter_pallas,
    )

    rng = np.random.default_rng(3)
    h, w = 384, 512
    disp = np.round(rng.uniform(0, 60, (h, w)) / 8) * 8
    disp = (disp + rng.normal(0, 0.2, (h, w))).astype(np.float32)
    valid = rng.random((h, w)) > 0.2
    a = np.asarray(speckle_filter(jnp.asarray(disp), jnp.asarray(valid),
                                  50, 1.0))
    b = np.asarray(speckle_filter_pallas(jnp.asarray(disp),
                                         jnp.asarray(valid), 50, 1.0))
    np.testing.assert_array_equal(a, b)
