#!/usr/bin/env python
"""Bisect the Oxford-scale schur PGO TPU fault (VERDICT r1 item #1).

Builds the bench stage-3 instance (synthetic circuit or the realistic
Oxford-route fixture) at a given node count and times lower/compile/run of
posegraph.optimize for a chosen solver.  Run each size in its own process so
one fault doesn't kill the sweep — and ONE TPU job at a time (the single
tunneled chip serializes compiles):

    python scripts/bisect_schur.py --n 1024 --solver schur
    python scripts/bisect_schur.py --fixture --solver schur
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--solver", default="schur")
    ap.add_argument("--tri", type=int, default=1)
    ap.add_argument("--lago", type=int, default=1)
    ap.add_argument("--fixture", action="store_true",
                    help="use the Oxford 10-12-32 GT route fixture")
    ap.add_argument("--ladder", default=None,
                    help="damping ladder, e.g. 0.1,1,10")
    ap.add_argument("--ftol", type=float, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tbv_slam_public_tpu.core.config import PGOConfig
    from tbv_slam_public_tpu.io import simulate
    from tbv_slam_public_tpu.ops import posegraph

    print(f"[bisect] n={args.n} solver={args.solver} fixture={args.fixture} "
          f"backend={jax.devices()[0].platform}", flush=True)
    if args.fixture:
        gt = np.load(os.path.join(
            REPO, "tests", "fixtures", "oxford_10-12-32_keyframe_gt.npz"))["gt"]
        if args.n and args.n < len(gt):
            gt = gt[:args.n]
        inst = simulate.make_trajectory_pgo_instance(gt, seed=0)
    else:
        inst = simulate.make_pgo_instance(args.n, seed=0)
    n = len(inst.poses)
    ncap = ((n + 31) // 32) * 32
    poses = np.zeros((ncap, 3), np.float32)
    poses[:n] = inst.poses
    nmask = np.zeros((ncap,), bool)
    nmask[:n] = True
    from dataclasses import replace
    pgo_cfg = replace(PGOConfig(), tri_damping=bool(args.tri),
                      lago_init=bool(args.lago))
    if args.ladder:
        pgo_cfg = replace(pgo_cfg, damping_ladder=tuple(
            float(x) for x in args.ladder.split(",")))
    if args.ftol is not None:
        pgo_cfg = replace(pgo_cfg, function_tolerance=args.ftol)
    sqrt_info = np.asarray(posegraph.default_sqrt_info(
        jnp.asarray(inst.etype), pgo_cfg))
    edges = posegraph.make_edges(inst.idx, inst.meas, sqrt_info, inst.etype,
                                 inst.mask)
    jposes = jnp.asarray(poses)
    jnmask = jnp.asarray(nmask)
    loop_cap = inst.loop_cap if args.solver == "schur" else None
    print(f"[bisect] nodes={n} (cap {ncap}) loops={inst.n_loops} "
          f"loop_cap={loop_cap} edges_cap={len(inst.mask)}", flush=True)

    t0 = time.perf_counter()
    lowered = jax.jit(
        lambda p: posegraph.optimize(
            p, jnmask, edges, pgo_cfg, solver=args.solver,
            loop_cap=loop_cap)
    ).lower(jposes)
    print(f"[bisect] lower: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"[bisect] compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    res = compiled(jposes)
    jax.block_until_ready(res.poses)
    print(f"[bisect] run1: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    res = compiled(jposes)
    jax.block_until_ready(res.poses)
    dt = time.perf_counter() - t0
    est = np.asarray(res.poses)[:n]
    gt_n = inst.gt

    def ate(p):
        return float(np.sqrt(np.mean(np.sum((p[:, :2] - gt_n[:, :2])**2, 1))))

    print(f"[bisect] run2: {dt*1e3:.1f}ms cost {float(res.cost0):.4g} -> "
          f"{float(res.cost):.4g} iters={int(res.iterations)} "
          f"ATE {ate(inst.poses):.2f} -> {ate(est):.2f} m", flush=True)


if __name__ == "__main__":
    main()
