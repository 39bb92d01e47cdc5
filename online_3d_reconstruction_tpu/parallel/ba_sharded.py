"""Distributed bundle adjustment: observation-sharded Schur assembly (P2).

North star: "distributed bundle adjustment via Schur-complement reduction
over psum/all-gather collectives". The normal-equation accumulations in
ba/schur.py are plain sums over the observation list, so the multi-device
form is exact and simple:

- observations are sharded along the mesh axis (``P('d')``);
- each device accumulates (B, C, E, g_p, g_x) over its shard;
- one ``psum`` reduces the blocks (B: W·36, C: L·9, E: W·L·18 floats —
  kilobytes over ICI, not the raw observations);
- the tiny reduced camera system is solved replicated on every device
  (identical result, no broadcast needed).

Bit-equivalence with the single-device solver is asserted by
tests/test_parallel.py on a CPU-simulated 8-device mesh (SURVEY.md §4.4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from online_3d_reconstruction_tpu.ba.problem import (
    BAProblem,
    prior_jacobians,
    prior_residuals,
    total_cost,
)
from online_3d_reconstruction_tpu.ba.schur import (
    accumulate_normal_blocks,
    schur_solve,
)
from online_3d_reconstruction_tpu.geometry import se3
from online_3d_reconstruction_tpu.parallel.mesh import pad_to_multiple


def _pad_observations(problem: BAProblem, n_devices: int) -> BAProblem:
    n = problem.obs_kf.shape[0]
    # the shard_map pytree is static: materialize unit weights when absent
    if problem.obs_weight is None:
        problem = problem._replace(
            obs_weight=jnp.ones((n, 3), jnp.float32)
        )
    target = pad_to_multiple(n, n_devices)
    if target == n:
        return problem
    pad = target - n
    return problem._replace(
        obs_kf=jnp.pad(problem.obs_kf, (0, pad)),
        obs_lm=jnp.pad(problem.obs_lm, (0, pad)),
        obs_point=jnp.pad(problem.obs_point, ((0, pad), (0, 0))),
        obs_valid=jnp.pad(problem.obs_valid, (0, pad)),
        obs_weight=jnp.pad(problem.obs_weight, ((0, pad), (0, 0)),
                           constant_values=1.0),
    )


def solve_ba_sharded(
    problem: BAProblem,
    mesh: Mesh,
    iters: int = 5,
    damping: float = 1e-4,
    huber_delta: float = 0.5,
    anchor_first: bool = True,
    prior_position_weight: float = 0.0,
    prior_rotation_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in distributed version of ba.schur.solve_ba.

    Same signature + a mesh; observations are sharded over the mesh axis and
    the normal blocks psum-reduced. Absolute-prior terms are unary in the
    (replicated) poses, so they are added once after the psum rather than
    inside the observation shards. Returns (poses, landmarks, cost_trace).
    """
    use_priors = problem.priors is not None and (
        prior_position_weight > 0 or prior_rotation_weight > 0
    )
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    problem = _pad_observations(problem, n_dev)

    def _accumulate(poses, landmarks, lm_valid, obs_kf, obs_lm, obs_pt,
                    obs_ok, obs_w):
        local = BAProblem(
            poses=poses, landmarks=landmarks, lm_valid=lm_valid,
            obs_kf=obs_kf, obs_lm=obs_lm, obs_point=obs_pt, obs_valid=obs_ok,
            obs_weight=obs_w,
        )
        blocks = accumulate_normal_blocks(poses, landmarks, local, huber_delta)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), blocks)

    acc = shard_map(
        _accumulate,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
    )

    @jax.jit
    def run(problem: BAProblem):
        def cost_fn(poses, landmarks):
            cost = total_cost(poses, landmarks, problem, huber_delta)
            if use_priors:
                r_pos, r_rot = prior_residuals(poses, problem)
                cost = cost + 0.5 * (
                    prior_position_weight * jnp.sum(r_pos * r_pos)
                    + prior_rotation_weight * jnp.sum(r_rot * r_rot)
                )
            return cost

        def add_prior_blocks(poses, b, g_p):
            if not use_priors:
                return b, g_p
            r_pos, r_rot = prior_residuals(poses, problem)
            j_pos, j_rot = prior_jacobians(poses)
            wv = problem.prior_valid.astype(jnp.float32)
            wp = prior_position_weight * wv
            wr = prior_rotation_weight * wv
            b = b + (wp[:, None, None] * jnp.einsum("wij,wik->wjk", j_pos, j_pos)
                     + wr[:, None, None] * jnp.einsum("wij,wik->wjk", j_rot, j_rot))
            g_p = g_p + (wp[:, None] * jnp.einsum("wij,wi->wj", j_pos, r_pos)
                         + wr[:, None] * jnp.einsum("wij,wi->wj", j_rot, r_rot))
            return b, g_p

        def step(state, _):
            poses, landmarks = state
            cost_before = cost_fn(poses, landmarks)
            b, c, e, g_p, g_x = acc(
                poses, landmarks, problem.lm_valid,
                problem.obs_kf, problem.obs_lm, problem.obs_point,
                problem.obs_valid, problem.obs_weight,
            )
            b, g_p = add_prior_blocks(poses, b, g_p)
            dp, dx = schur_solve(b, c, e, g_p, g_x, damping, anchor_first)
            new_poses = jax.vmap(se3.retract)(poses, dp)
            new_landmarks = jnp.where(
                problem.lm_valid[:, None], landmarks + dx, landmarks
            )
            cost_after = cost_fn(new_poses, new_landmarks)
            accept = cost_after < cost_before
            poses = jnp.where(accept, new_poses, poses)
            landmarks = jnp.where(accept, new_landmarks, landmarks)
            return (poses, landmarks), cost_before

        (poses, landmarks), trace = jax.lax.scan(
            step, (problem.poses, problem.landmarks), None, length=iters
        )
        final = cost_fn(poses, landmarks)
        return poses, landmarks, jnp.concatenate([trace, final[None]])

    return run(problem)
