"""Damped Gauss-Newton with a dense-block Schur complement — the BA solver.

North star mandate: "sparse CPU BA -> dense-block distributed Schur solve".
The normal equations H = [[B, E], [E^T, C]] are assembled *densely in the
block structure*: per-landmark 3x3 blocks C_j inverted in parallel, the
pose-landmark coupling E held as a dense (W, L, 6, 3) tensor (W ~ 8-128
keyframes, L <= max_landmarks: small), and the reduced camera system

    S = B - E C^{-1} E^T        (6W x 6W, dense)
    S dp = -g_p + E C^{-1} g_x
    dx_j = C_j^{-1} (-g_x_j - E_{.j}^T dp)

solved by Cholesky. Every accumulation is a ``segment_sum``/scatter-add and
every contraction an einsum — the shape the MXU wants and the shape that
distributes: shard the observation list across devices, ``psum`` the
accumulated (B, C, E, g), solve the tiny reduced system replicated
(parallel/ba_sharded.py wires exactly that).

Gauge: the first pose's rows/columns of S are replaced by identity (exact
anchor), matching the reference's fixed-first-keyframe convention.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from online_3d_reconstruction_tpu.ba.problem import (
    BAProblem,
    huber_weights,
    jacobians,
    prior_jacobians,
    prior_residuals,
    residuals,
    total_cost,
)
from online_3d_reconstruction_tpu.geometry import se3


def accumulate_normal_blocks(poses, landmarks, problem: BAProblem,
                             huber_delta: float,
                             prior_position_weight: float = 0.0,
                             prior_rotation_weight: float = 0.0,
                             slot_major: int = 0):
    """One pass over the observation list -> (B, C, E, g_p, g_x).

    This is the part a multi-device solve shards: each device accumulates
    over its observation shard, then psums the outputs (they are plain sums).
    Absolute pose-prior terms (unary, dense in the pose blocks) are added
    directly to B and g_p when the problem carries priors and a weight is
    positive.

    ``slot_major`` (static) declares the observation list layout: when > 0,
    obs n belongs to pose slot n // slot_major (exactly ``slot_major`` obs
    per slot, the device-window layout of ba/device_tracks.py). That makes
    the per-pose accumulations plain reshaped sums and lets the landmark
    accumulations run as a ``lax.scan`` over slots with per-slot one-hots —
    O(N*L) FLOPs and O(slot_major*L) memory instead of the generic path's
    O(N*W*L) einsum, which is what makes W = 64-100 windows (SURVEY.md:424)
    tractable: at W=100/K=512/L=2048 the generic E-assembly alone would be
    ~47 GFLOP and a >400 MB one-hot; the slot-major path is ~2 GFLOP.
    """
    w_count = poses.shape[0]
    l_count = landmarks.shape[0]
    r = residuals(poses, landmarks, problem)              # (N, 3)
    j_pose, j_point = jacobians(poses, landmarks, problem)
    w = problem.obs_valid.astype(jnp.float32)
    if huber_delta > 0:
        w = w * huber_weights(r, huber_delta, problem)
    # total row weight = validity * IRLS scalar * observation information:
    # J^T W J with W = w * W_obs, where W_obs is diagonal (N, 3) or the full
    # (N, 3, 3) stereo covariance inverse (ray-coupled noise model)
    if problem.obs_weight is not None and problem.obs_weight.ndim == 3:
        w_mat = w[:, None, None] * problem.obs_weight     # (N, 3, 3)
        hi_p = jax.lax.Precision.HIGHEST
        jp_w = jnp.einsum("nij,njk->nik", w_mat, j_pose,
                          precision=hi_p)                 # (N, 3, 6) = W J
        jx_w = jnp.einsum("nij,njk->nik", w_mat, j_point, precision=hi_p)
    else:
        wc = w[:, None]
        if problem.obs_weight is not None:
            wc = wc * problem.obs_weight                  # (N, 3)
        wj = wc[:, :, None]
        jp_w = j_pose * wj                                # (N, 3, 6)
        jx_w = j_point * wj                               # (N, 3, 3)
    # HIGHEST throughout: pose-math contractions quantized by the TPU's
    # default bf16 einsum corrupt the GN normal equations enough that the
    # cost-decrease guard rejects every step (observed on-chip: the whole
    # window BA silently became a no-op)
    hi = jax.lax.Precision.HIGHEST
    hp = jnp.einsum("nij,nik->njk", jp_w, j_pose, precision=hi)   # (N, 6, 6)
    hx = jnp.einsum("nij,nik->njk", jx_w, j_point, precision=hi)  # (N, 3, 3)
    e_obs = jnp.einsum("nij,nik->njk", jp_w, j_point, precision=hi)  # (N, 6, 3)
    gp_obs = jnp.einsum("nij,ni->nj", jp_w, r, precision=hi)      # (N, 6)
    gx_obs = jnp.einsum("nij,ni->nj", jx_w, r, precision=hi)      # (N, 3)
    if slot_major > 0:
        # slot-major layout: per-pose sums are contiguous reshaped
        # reductions; per-landmark sums scan over slots with per-slot
        # one-hots (built inside the scan — never a full (N, L) buffer)
        k = slot_major
        b_blocks = hp.reshape(w_count, k, 6, 6).sum(axis=1)
        g_p = gp_obs.reshape(w_count, k, 6).sum(axis=1)
        lm_ids = jnp.arange(l_count, dtype=jnp.int32)

        def slot_body(_, inp):
            # stacked per-slot outputs + post-scan sum (instead of a carry
            # accumulator) keep this scan legal inside shard_map, where a
            # replicated-zero carry fed by varying inputs trips the
            # varying-manual-axes check
            olm_w, hx_w, gx_w, e_w = inp
            oh = (olm_w[:, None] == lm_ids[None, :]).astype(jnp.float32)
            c_slot = jnp.einsum("kl,kab->lab", oh, hx_w, precision=hi)
            gx_slot = jnp.einsum("kl,ka->la", oh, gx_w, precision=hi)
            e_slot = jnp.einsum("kl,kab->lab", oh, e_w, precision=hi)
            return None, (c_slot, gx_slot, e_slot)

        _, (c_all, gx_all, e_dense) = jax.lax.scan(
            slot_body, None,
            (problem.obs_lm.reshape(w_count, k),
             hx.reshape(w_count, k, 3, 3),
             gx_obs.reshape(w_count, k, 3),
             e_obs.reshape(w_count, k, 6, 3)),
        )
        c_blocks = c_all.sum(axis=0)
        g_x = gx_all.sum(axis=0)
    else:
        # All index-based accumulations as one-hot MXU contractions: TPU
        # scatter (what segment_sum lowers to) serializes per update and
        # measured ~10x slower than these matmuls for the whole solve. Sums
        # accumulate in f32, bit-identical to segment_sum.
        onehot_kf = (problem.obs_kf[:, None]
                     == jnp.arange(w_count, dtype=jnp.int32)[None, :]
                     ).astype(jnp.float32)                    # (N, W)
        onehot_lm = (problem.obs_lm[:, None]
                     == jnp.arange(l_count, dtype=jnp.int32)[None, :]
                     ).astype(jnp.float32)                    # (N, L)
        b_blocks = jnp.einsum("nw,njk->wjk", onehot_kf, hp, precision=hi)
        c_blocks = jnp.einsum("nl,njk->ljk", onehot_lm, hx, precision=hi)
        g_p = jnp.einsum("nw,nj->wj", onehot_kf, gp_obs, precision=hi)
        g_x = jnp.einsum("nl,nj->lj", onehot_lm, gx_obs, precision=hi)

    use_priors = problem.priors is not None and (
        prior_position_weight > 0 or prior_rotation_weight > 0
    )
    if use_priors:
        r_pos, r_rot = prior_residuals(poses, problem)
        j_pos, j_rot = prior_jacobians(poses)
        wv = problem.prior_valid.astype(jnp.float32)
        wp = prior_position_weight * wv
        wr = prior_rotation_weight * wv
        hi_q = jax.lax.Precision.HIGHEST
        b_blocks = b_blocks + (
            wp[:, None, None] * jnp.einsum("wij,wik->wjk", j_pos, j_pos,
                                           precision=hi_q)
            + wr[:, None, None] * jnp.einsum("wij,wik->wjk", j_rot, j_rot,
                                             precision=hi_q)
        )
        g_p = g_p + (
            wp[:, None] * jnp.einsum("wij,wi->wj", j_pos, r_pos,
                                     precision=hi_q)
            + wr[:, None] * jnp.einsum("wij,wi->wj", j_rot, r_rot,
                                       precision=hi_q)
        )
    if slot_major == 0:
        # E is the (kf, lm) pair scatter. The contraction materializes an
        # (N, W, 6, 3) intermediate — fine for sliding windows (W ~ 8-16);
        # fall back to the scatter-add for very large W*N where that would
        # not fit. (Large windows should use slot_major instead.)
        n_obs = problem.obs_kf.shape[0]
        if n_obs * w_count * 18 * 4 <= (256 << 20):
            e_dense = jnp.einsum("nw,nl,njk->wljk", onehot_kf, onehot_lm,
                                 e_obs, precision=hi)
        else:
            e_dense = jnp.zeros((w_count, l_count, 6, 3), dtype=jnp.float32)
            e_dense = e_dense.at[problem.obs_kf, problem.obs_lm].add(e_obs)
    return b_blocks, c_blocks, e_dense, g_p, g_x


def schur_solve(b_blocks, c_blocks, e_dense, g_p, g_x,
                damping: float, anchor_first: bool):
    """Reduced-camera-system solve. Returns (dp (W,6), dx (L,3))."""
    w_count = b_blocks.shape[0]
    l_count = c_blocks.shape[0]
    eye3 = jnp.eye(3, dtype=jnp.float32)
    eye6 = jnp.eye(6, dtype=jnp.float32)

    c_damped = c_blocks + damping * eye3[None] + 1e-8 * eye3[None]
    c_inv = jnp.linalg.inv(c_damped)                       # (L, 3, 3) batch

    hi = jax.lax.Precision.HIGHEST
    ec = jnp.einsum("wlij,ljk->wlik", e_dense, c_inv,
                    precision=hi)                          # (W, L, 6, 3)
    # S[a, j, b, m] = delta_ab (B + lambda I) - sum_l (E C^-1)_{al} E_{bl}^T
    s_coupling = jnp.einsum("aljk,blmk->ajbm", ec, e_dense, precision=hi)
    s_mat = -s_coupling
    diag_idx = jnp.arange(w_count)
    s_mat = s_mat.at[diag_idx, :, diag_idx, :].add(b_blocks + damping * eye6[None])

    rhs = -g_p + jnp.einsum("aljk,lk->aj", ec, g_x, precision=hi)  # (W, 6)

    if anchor_first:
        s_mat = s_mat.at[0, :, :, :].set(0.0)
        s_mat = s_mat.at[:, :, 0, :].set(0.0)
        s_mat = s_mat.at[0, jnp.arange(6), 0, jnp.arange(6)].set(1.0)
        rhs = rhs.at[0].set(0.0)

    s_full = s_mat.reshape(w_count * 6, w_count * 6)
    chol, lower = jax.scipy.linalg.cho_factor(s_full)
    dp = jax.scipy.linalg.cho_solve((chol, lower), rhs.reshape(-1)).reshape(w_count, 6)

    # back-substitute landmarks: dx_j = C_j^{-1} (-g_x - E^T dp)
    et_dp = jnp.einsum("wljk,wj->lk", e_dense, dp, precision=hi)   # (L, 3)
    dx = jnp.einsum("lij,lj->li", c_inv, -g_x - et_dp, precision=hi)
    return dp, dx


@partial(jax.jit, static_argnames=("iters", "damping", "huber_delta",
                                   "anchor_first", "prior_position_weight",
                                   "prior_rotation_weight", "slot_major"))
def solve_ba(problem: BAProblem, iters: int = 5, damping: float = 1e-4,
             huber_delta: float = 0.5, anchor_first: bool = True,
             prior_position_weight: float = 0.0,
             prior_rotation_weight: float = 0.0,
             slot_major: int = 0,
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run ``iters`` damped-GN steps. Returns (poses, landmarks, cost_trace).

    cost_trace has iters+1 entries (cost before each step and after the last)
    — the test suite asserts monotone decrease on synthetic problems.
    ``slot_major``: see accumulate_normal_blocks (large-window fast path).
    """
    use_priors = problem.priors is not None and (
        prior_position_weight > 0 or prior_rotation_weight > 0
    )

    def cost_fn(poses, landmarks):
        c = total_cost(poses, landmarks, problem, huber_delta)
        if use_priors:
            r_pos, r_rot = prior_residuals(poses, problem)
            c = c + 0.5 * (
                prior_position_weight * jnp.sum(r_pos * r_pos)
                + prior_rotation_weight * jnp.sum(r_rot * r_rot)
            )
        return c

    def step(state, _):
        poses, landmarks = state
        cost_before = cost_fn(poses, landmarks)
        b_blocks, c_blocks, e_dense, g_p, g_x = accumulate_normal_blocks(
            poses, landmarks, problem, huber_delta,
            prior_position_weight, prior_rotation_weight,
            slot_major=slot_major,
        )
        dp, dx = schur_solve(b_blocks, c_blocks, e_dense, g_p, g_x,
                             damping, anchor_first)
        new_poses = jax.vmap(se3.retract)(poses, dp)
        new_landmarks = jnp.where(problem.lm_valid[:, None], landmarks + dx,
                                  landmarks)
        # reject a diverging step (cost-increase guard, LM-style)
        cost_after = cost_fn(new_poses, new_landmarks)
        accept = cost_after < cost_before
        poses = jnp.where(accept, new_poses, poses)
        landmarks = jnp.where(accept, new_landmarks, landmarks)
        return (poses, landmarks), cost_before

    (poses, landmarks), trace = jax.lax.scan(
        step, (problem.poses, problem.landmarks), None, length=iters
    )
    final_cost = cost_fn(poses, landmarks)
    return poses, landmarks, jnp.concatenate([trace, final_cost[None]])
