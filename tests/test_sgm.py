"""SGM disparity: scan vs ground truth, Pallas vs scan, cv2 cross-check.

The reference's disparity comes from cv::StereoSGBM (SURVEY.md §2.1 C5); it
ships no tests, so the oracles here are (a) the synthetic scene's analytic
disparity and (b) cv2.StereoSGBM agreement (§4.1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from online_3d_reconstruction_tpu.config import StereoConfig
from online_3d_reconstruction_tpu.stereo.sgm import (
    aggregate_scan,
    right_disparity_from_aggregated,
    sgm_disparity,
    speckle_filter,
    wta_disparity,
)
from online_3d_reconstruction_tpu.stereo.sgm_pallas import aggregate_pallas
from online_3d_reconstruction_tpu.utils.imaging import to_uint8


def _cfg(**kw):
    base = dict(
        height=192, width=256, max_disparity=32, num_paths=4,
        use_pallas=False, speckle_window=50,
    )
    base.update(kw)
    return StereoConfig(**base)


def _bad_fraction(disp, valid, gt, tol=1.0):
    disp = np.asarray(disp)
    valid = np.asarray(valid)
    gt = np.asarray(gt)
    mask = valid & np.isfinite(gt)
    assert mask.sum() > 0
    return np.mean(np.abs(disp[mask] - gt[mask]) > tol), mask.mean()


class TestAggregation:
    def test_scan_matches_bruteforce_1d(self):
        """One row, tiny D: compare against a literal python SGM recurrence."""
        rng = np.random.default_rng(0)
        cost = rng.integers(0, 20, size=(1, 7, 4)).astype(np.float32)
        p1, p2 = 2.0, 8.0
        agg = np.asarray(aggregate_scan(jnp.asarray(cost), p1, p2, num_paths=2))

        # forward direction, hand-rolled
        fwd = np.zeros_like(cost[0])
        prev = np.zeros(4)
        for x in range(7):
            mp = prev.min()
            for d in range(4):
                cands = [prev[d], mp + p2]
                if d > 0:
                    cands.append(prev[d - 1] + p1)
                if d < 3:
                    cands.append(prev[d + 1] + p1)
                fwd[x, d] = cost[0, x, d] + min(cands) - mp
            prev = fwd[x].copy()
        bwd = np.zeros_like(cost[0])
        prev = np.zeros(4)
        for x in range(6, -1, -1):
            mp = prev.min()
            for d in range(4):
                cands = [prev[d], mp + p2]
                if d > 0:
                    cands.append(prev[d - 1] + p1)
                if d < 3:
                    cands.append(prev[d + 1] + p1)
                bwd[x, d] = cost[0, x, d] + min(cands) - mp
            prev = bwd[x].copy()
        np.testing.assert_allclose(agg[0], fwd + bwd, rtol=1e-5)

    @pytest.mark.parametrize("num_paths", [2, 4, 8])
    def test_pallas_matches_scan(self, num_paths):
        rng = np.random.default_rng(1)
        cost = jnp.asarray(rng.integers(0, 24, size=(24, 40, 16)).astype(np.float32))
        ref = aggregate_scan(cost, 8.0, 32.0, num_paths)
        out = aggregate_pallas(cost, 8.0, 32.0, num_paths, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_diagonals_match_bruteforce(self):
        """8-path aggregation vs a literal per-pixel SGM recurrence over all
        8 directions — in particular the diagonal fresh-start borders, which
        the earlier skew-the-volume formulation got subtly wrong (pad cells
        leaked a d-dependent residual into restarts)."""
        rng = np.random.default_rng(3)
        h, w, d = 10, 12, 4
        cost = rng.integers(0, 24, size=(h, w, d)).astype(np.float32)
        p1, p2 = 8.0, 32.0

        def brute(dy, dx):
            out = np.zeros_like(cost)
            ys = range(h) if dy >= 0 else range(h - 1, -1, -1)
            xs = range(w) if dx >= 0 else range(w - 1, -1, -1)
            for y in ys:
                for x in xs:
                    py, px = y - dy, x - dx
                    if 0 <= py < h and 0 <= px < w:
                        prev = out[py, px]
                        mp = prev.min()
                        for dd in range(d):
                            c = [prev[dd], mp + p2]
                            if dd > 0:
                                c.append(prev[dd - 1] + p1)
                            if dd < d - 1:
                                c.append(prev[dd + 1] + p1)
                            out[y, x, dd] = cost[y, x, dd] + min(c) - mp
                    else:
                        out[y, x] = cost[y, x]
            return out

        dirs = [(0, 1), (0, -1), (1, 0), (-1, 0),
                (1, 1), (-1, -1), (1, -1), (-1, 1)]
        gt = sum(brute(dy, dx) for dy, dx in dirs)
        agg = np.asarray(aggregate_scan(jnp.asarray(cost), p1, p2, 8))
        np.testing.assert_allclose(agg, gt, rtol=1e-5)
        pal = np.asarray(aggregate_pallas(jnp.asarray(cost), p1, p2, 8,
                                          interpret=True))
        np.testing.assert_allclose(pal, gt, rtol=1e-5)


class TestWTA:
    def test_wta_picks_min_and_subpixel_in_range(self):
        rng = np.random.default_rng(2)
        agg = jnp.asarray(rng.uniform(1, 100, size=(8, 8, 16)).astype(np.float32))
        disp, valid = wta_disparity(agg, uniqueness_ratio=1.0, subpixel=True)
        idx = np.argmin(np.asarray(agg), axis=-1)
        assert np.all(np.abs(np.asarray(disp) - idx) <= 0.5)

    def test_uniqueness_kills_flat_cost(self):
        agg = jnp.ones((4, 4, 16), dtype=jnp.float32)
        _, valid = wta_disparity(agg, uniqueness_ratio=0.95, subpixel=False)
        assert not np.asarray(valid).any()

    def test_right_disparity_shift(self):
        """A volume whose min is at d0 everywhere maps right-view min to d0."""
        h, w, d = 6, 32, 8
        agg = np.full((h, w, d), 50.0, dtype=np.float32)
        agg[:, :, 3] = 1.0
        d_r = np.asarray(right_disparity_from_aggregated(jnp.asarray(agg)))
        assert np.all(d_r[:, : w - d] == 3)


class TestSpeckle:
    def test_small_blob_removed_large_kept(self):
        disp = np.zeros((32, 32), dtype=np.float32)
        disp[:, :16] = 10.0      # big region, half the image
        disp[2:4, 20:22] = 10.0  # 4-pixel speckle in a sea of zeros
        valid = np.ones_like(disp, dtype=bool)
        out = np.asarray(
            speckle_filter(jnp.asarray(disp), jnp.asarray(valid), 20, 1.0)
        )
        assert out[:, :16].all()          # 512-pixel blob survives
        assert not out[2:4, 20:22].any()  # 4-pixel blob dies
        assert out[:, 16:].sum() + 4 == (32 * 16)  # zero-region blob survives

    def test_pallas_kernel_matches_xla_exactly(self):
        """The fused one-launch Pallas speckle (sgm_pallas.
        speckle_filter_pallas, the use_pallas=True production path) must
        reproduce the XLA associative-scan form bit for bit — both are the
        same run-cross-mass algorithm; only the scan fusion differs."""
        from online_3d_reconstruction_tpu.stereo.sgm_pallas import (
            speckle_filter_pallas,
        )

        rng = np.random.default_rng(7)
        for h, w in ((64, 128), (96, 256)):
            disp = np.round(rng.uniform(0, 30, (h, w)) / 6) * 6
            disp = (disp + rng.normal(0, 0.2, (h, w))).astype(np.float32)
            valid = rng.random((h, w)) > 0.15
            a = speckle_filter(jnp.asarray(disp), jnp.asarray(valid), 50, 1.0)
            b = speckle_filter_pallas(jnp.asarray(disp), jnp.asarray(valid),
                                      50, 1.0, interpret=True)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_disabled(self):
        disp = jnp.zeros((8, 8))
        valid = jnp.ones((8, 8), dtype=bool)
        out = speckle_filter(disp, valid, 0, 1.0)
        assert np.asarray(out).all()

    def test_agreement_with_cv2_filter_speckles(self, stereo_frame):
        """Oracle: cv2.filterSpeckles (exact connected components) on a real
        disparity map. The run-cross mass is a LOWER bound on blob size, so
        every pixel exact CC removes must be removed here too (no surviving
        speckles); only rare thin shapes may be over-removed."""
        cv2 = pytest.importorskip("cv2")
        cfg = _cfg(speckle_window=0)
        disp, valid = sgm_disparity(
            jnp.asarray(stereo_frame.left), jnp.asarray(stereo_frame.right), cfg
        )
        disp = np.asarray(disp)
        valid = np.asarray(valid)
        ours = np.asarray(
            speckle_filter(jnp.asarray(disp), jnp.asarray(valid), 50, 1.0)
        )
        fx = np.where(valid, np.round(disp * 16), -256).astype(np.int16)
        cv2.filterSpeckles(fx, -256, 50, 16)  # max_diff 1.0 px == 16 units
        ref = (fx != -256) & valid
        missed = (~ref & ours).mean()        # speckle survived: must be ~0
        over_removed = (ref & ~ours).mean()  # lower-bound over-removal: rare
        assert missed < 0.001, f"surviving speckles {missed:.5f}"
        assert over_removed < 0.005, f"over-removal {over_removed:.5f}"


class TestEndToEnd:
    def test_disparity_vs_ground_truth(self, scene, small_rig, stereo_frame):
        cfg = _cfg()
        disp, valid = sgm_disparity(
            jnp.asarray(stereo_frame.left), jnp.asarray(stereo_frame.right), cfg
        )
        bad, density = _bad_fraction(disp, np.asarray(valid), stereo_frame.gt_disparity)
        assert density > 0.5, f"valid density too low: {density}"
        assert bad < 0.10, f"bad-pixel rate too high: {bad}"

    def test_pallas_path_matches_scan_path(self, stereo_frame):
        left = jnp.asarray(stereo_frame.left)
        right = jnp.asarray(stereo_frame.right)
        d_scan, v_scan = sgm_disparity(left, right, _cfg(use_pallas=False))
        d_pal, v_pal = sgm_disparity(
            left, right, _cfg(use_pallas=True), interpret_pallas=True
        )
        np.testing.assert_array_equal(np.asarray(v_scan), np.asarray(v_pal))
        np.testing.assert_allclose(np.asarray(d_scan), np.asarray(d_pal), atol=1e-4)

    def test_agreement_with_cv2_sgbm(self, stereo_frame):
        """Census-SGM and cv2's BT-SGBM should agree on most valid pixels."""
        cv2 = pytest.importorskip("cv2")
        cfg = _cfg(num_paths=8)
        disp, valid = sgm_disparity(
            jnp.asarray(stereo_frame.left), jnp.asarray(stereo_frame.right), cfg
        )
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=32, blockSize=5,
            P1=8 * 25, P2=32 * 25, uniquenessRatio=5,
            speckleWindowSize=50, speckleRange=2, disp12MaxDiff=1,
            mode=cv2.STEREO_SGBM_MODE_HH,
        )
        ref = sgbm.compute(to_uint8(stereo_frame.left), to_uint8(stereo_frame.right))
        ref = ref.astype(np.float32) / 16.0
        both = np.asarray(valid) & (ref > 0)
        assert both.mean() > 0.4
        agree = np.abs(np.asarray(disp)[both] - ref[both]) <= 1.0
        assert agree.mean() > 0.85, f"cv2 agreement {agree.mean()}"


class TestCostDtype:
    def test_bf16_storage_matches_f32(self, stereo_frame):
        """bf16 cost-volume storage: integral SGM values stay exact per pair;
        only inter-path rounding may flip rare WTA ties."""
        left = jnp.asarray(stereo_frame.left)
        right = jnp.asarray(stereo_frame.right)
        d32, v32 = sgm_disparity(left, right,
                                 _cfg(use_pallas=True, cost_dtype="float32"),
                                 interpret_pallas=True)
        d16, v16 = sgm_disparity(left, right,
                                 _cfg(use_pallas=True, cost_dtype="bfloat16"),
                                 interpret_pallas=True)
        both = np.asarray(v32) & np.asarray(v16)
        assert both.mean() > 0.5
        close = np.abs(np.asarray(d32)[both] - np.asarray(d16)[both]) <= 1.0
        assert close.mean() > 0.995, f"bf16 agreement {close.mean():.4f}"
        flipped = np.asarray(v32) != np.asarray(v16)
        assert flipped.mean() < 0.02, f"validity flips {flipped.mean():.4f}"
