"""Strong-scaling measurement of the sharded stages on an N-virtual-device
CPU mesh (SURVEY.md §6 / M5: "scaling efficiency @ N hosts").

CAVEAT (printed with the results and recorded in BASELINE.md): there is ONE
TPU chip in this environment, so the mesh is 8 simulated CPU devices sharing
one host's cores. Wall-clock scaling here validates that the sharded
programs distribute WORK correctly and bounds the collective overheads at
zero-latency interconnect; it cannot measure ICI bandwidth effects. The
communicated-bytes table is analytic from the program shapes and is
interconnect-independent.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python tools/scaling_bench.py
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from online_3d_reconstruction_tpu.ba.testing import make_synthetic_bundle
from online_3d_reconstruction_tpu.config import StereoConfig
from online_3d_reconstruction_tpu.parallel.ba_sharded import solve_ba_sharded
from online_3d_reconstruction_tpu.parallel.mesh import make_mesh
from online_3d_reconstruction_tpu.parallel.sgm_sharded import sharded_disparity

NS = (1, 2, 4, 8)


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_p2():
    """Observation-sharded BA: W=64 keyframes, 8192 observations."""
    w_kf, l_lm, n_obs, iters = 64, 512, 8192, 5
    problem, _, _ = make_synthetic_bundle(np.random.default_rng(0), w=w_kf,
                                          l=l_lm, obs_noise=0.02, n_cap=n_obs)
    rows = {}
    for n in NS:
        mesh = make_mesh(n)
        rows[n] = timeit(lambda: solve_ba_sharded(
            problem, mesh, iters=iters, damping=1e-4, huber_delta=0.5)[0])
    # per GN iteration, one psum of the dense normal blocks
    blocks_bytes = 4 * (w_kf * 36 + l_lm * 9 + w_kf * l_lm * 18
                        + w_kf * 6 + l_lm * 3)
    comm = {"collective": "psum(B,C,E,g_p,g_x)",
            "bytes_per_call": blocks_bytes, "calls": iters,
            "note": "ring all-reduce moves 2(n-1)/n x bytes over ICI"}
    return {"name": f"P2 BA W={w_kf} L={l_lm} obs={n_obs} it={iters}",
            "wall_s": rows, "comm": comm}


def bench_p2_slots():
    """Keyframe-sharded BA at blueprint window scale (W=64, 512 obs/frame)."""
    from online_3d_reconstruction_tpu.ba.schur import solve_ba
    from online_3d_reconstruction_tpu.parallel.ba_sharded import (
        solve_ba_slot_sharded,
    )

    w_kf, l_lm, k_obs, iters = 64, 2048, 512, 5
    problem, _, _ = make_synthetic_bundle(np.random.default_rng(3), w=w_kf,
                                          l=l_lm, obs_noise=0.02,
                                          n_cap=w_kf * k_obs,
                                          obs_per_kf=k_obs)
    rows = {}
    for n in NS:
        if n == 1:
            rows[n] = timeit(lambda: solve_ba(
                problem, iters=iters, damping=1e-4, huber_delta=0.5,
                slot_major=k_obs)[0])
        else:
            mesh = make_mesh(n)
            rows[n] = timeit(lambda: solve_ba_slot_sharded(
                problem, mesh, slot_major=k_obs, iters=iters, damping=1e-4,
                huber_delta=0.5)[0])
    gather_bytes = 4 * (w_kf * (36 + 6) + w_kf * l_lm * 18)
    psum_bytes = 4 * (l_lm * 9 + l_lm * 3)
    comm = {"collective": "psum(C,g_x) + all_gather(B,E,g_p)",
            "bytes_per_call": gather_bytes + psum_bytes, "calls": iters,
            "note": "per-device accumulation is O((N/n)*L); the gather's "
                    "bytes are dominated by the (W,L,6,3) E blocks"}
    return {"name": f"P2 slot-sharded BA W={w_kf} L={l_lm} obs={w_kf*k_obs} "
                    f"it={iters}",
            "wall_s": rows, "comm": comm}


def bench_p3():
    """Spatially-sharded voxel merge (owner-routed): 8M points.

    Uses the production P3 path ``voxel_route_merge`` with the O(N/n)
    bucket capacity (1.5x the balanced-hash expectation): per-shard work is
    a local N/n-point pre-reduction plus an owner-side merge over
    1.5 N/n records — both shrink with n, unlike the earlier all-gather
    variant whose replicated final merge re-sorted all N records on every
    device (the round-3 5.2x blow-up at n=8). Overflow (`dropped`) is
    asserted zero so the speedup is never bought with silent loss.
    """
    from online_3d_reconstruction_tpu.parallel.voxel_sharded import (
        voxel_route_merge,
    )

    n_pts = 8_000_000
    rng = np.random.default_rng(1)
    pts = rng.uniform(-512, 512, (n_pts, 3)).astype(np.float32)
    cols = rng.random((n_pts, 3), dtype=np.float32)
    ok = np.ones(n_pts, bool)
    rows = {}
    for n in NS:
        mesh = make_mesh(n)
        n_local = n_pts // n
        cap = min(n_local, -(-3 * n_local // (2 * n)))
        p = jnp.asarray(pts); c = jnp.asarray(cols); v = jnp.asarray(ok)

        def run(p=p, c=c, v=v, mesh=mesh, cap=cap):
            out, dropped = voxel_route_merge(p, c, v, mesh, voxel_size=1.0,
                                             bounds=512.0,
                                             bucket_capacity=cap)
            return out.points, dropped

        out_pts, dropped = run()
        assert int(dropped) == 0, (n, int(dropped))
        rows[n] = timeit(lambda: run()[0])
    comm = {"collective": "all_to_all(pre-reduced voxel records) + psum(dropped)",
            "bytes_per_call": n_pts * (7 * 4 + 2 * 4),
            "calls": 1,
            "note": "upper bound: each locally-unique voxel record (28 B sums"
                    " + 8 B key) crosses the wire at most once; local"
                    " duplication reduces it further"}
    return {"name": f"P3 owner-routed voxel merge {n_pts/1e6:.0f}M pts",
            "wall_s": rows, "comm": comm}


def bench_p4():
    """Row-slab SGM with ppermute halo exchange: 768x1024, D=64, 4 paths."""
    h, w, d = 768, 1024, 64
    halo = 32
    cfg = StereoConfig(height=h, width=w, max_disparity=d, num_paths=4,
                       use_pallas=False, speckle_window=0)
    rng = np.random.default_rng(2)
    left = jnp.asarray(rng.random((h, w), dtype=np.float32))
    right = jnp.asarray(rng.random((h, w), dtype=np.float32))
    rows = {}
    for n in NS:
        mesh = make_mesh(n)
        rows[n] = timeit(lambda: sharded_disparity(
            left, right, cfg, mesh, halo=halo)[0], reps=2)
    cw = 2
    comm = {"collective": "2x ppermute (halo rows, both images)",
            "bytes_per_call": 2 * 2 * (halo + cw) * w * 4,
            "calls": 1,
            "note": "halo rows of the raw images; cost volume stays local"}
    return {"name": f"P4 row-slab SGM {w}x{h} D={d} halo={halo}",
            "wall_s": rows, "comm": comm}


def main():
    assert len(jax.devices()) >= 8, (
        "need XLA_FLAGS=--xla_force_host_platform_device_count=8")
    results = [bench_p2(), bench_p2_slots(), bench_p3(), bench_p4()]
    print("\n## Strong scaling on the 8-virtual-device CPU mesh "
          "(one host's cores — see caveat in file docstring)\n")
    print("| stage | " + " | ".join(f"n={n}" for n in NS)
          + " | speedup@8 | efficiency@8 |")
    print("|---|" + "---|" * (len(NS) + 2))
    for r in results:
        ws = r["wall_s"]
        sp = ws[1] / ws[8]
        print("| " + r["name"] + " | "
              + " | ".join(f"{ws[n]*1e3:.0f} ms" for n in NS)
              + f" | {sp:.2f}x | {100*sp/8:.0f}% |")
    print("\n## Communicated bytes per collective (analytic, "
          "interconnect-independent)\n")
    print("| stage | collective | bytes/call | calls |")
    print("|---|---|---|---|")
    for r in results:
        c = r["comm"]
        print(f"| {r['name']} | {c['collective']} | "
              f"{c['bytes_per_call']/1e6:.2f} MB | {c['calls']} |")
    with open("SCALING.json", "w") as f:
        json.dump(results, f, indent=2)
    print("\nwritten: SCALING.json")


if __name__ == "__main__":
    main()
