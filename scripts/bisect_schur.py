#!/usr/bin/env python
"""Bisect the 4096-node schur PGO TPU fault (VERDICT r1 item #1).

Builds the same double-lap circuit graph as bench.py stage 3 at a given node
count and times compile vs run of posegraph.optimize for a chosen solver.
Run each size in its own process so one fault doesn't kill the sweep:

    python scripts/bisect_schur.py --n 1024 --solver schur
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_graph(n_nodes: int, rng, anchor_gt: bool = True):
    import jax.numpy as jnp

    from tbv_slam_public_tpu.core import se2 as se2_op
    from tbv_slam_public_tpu.core.types import LOOP_APPEARANCE, ODOMETRY
    from tbv_slam_public_tpu.ops import posegraph
    from tbv_slam_public_tpu.core.config import PGOConfig

    pgo_cfg = PGOConfig()
    per_lap = n_nodes // 2
    circ_r = per_lap * 1.5 / (2 * np.pi)
    gt_nodes = np.zeros((n_nodes, 3), np.float32)
    for i in range(n_nodes):
        a = 2 * np.pi * (i % per_lap) / per_lap
        gt_nodes[i] = [circ_r * np.cos(a), circ_r * np.sin(a), a + np.pi / 2]
    odo = []
    for i in range(n_nodes - 1):
        rel = np.asarray(se2_op.relative(jnp.asarray(gt_nodes[i]),
                                         jnp.asarray(gt_nodes[i + 1])))
        odo.append(rel + rng.normal(0, [0.03, 0.03, 0.003]))
    poses = np.zeros((n_nodes, 3), np.float32)
    if anchor_gt:
        poses[0] = gt_nodes[0]  # gauge anchored at GT start (ADVICE r1)
    for i in range(n_nodes - 1):
        poses[i + 1] = np.asarray(se2_op.compose(
            jnp.asarray(poses[i]), jnp.asarray(odo[i], jnp.float32)))
    loop_pairs = [(i, i - per_lap) for i in range(per_lap, n_nodes, 7)]
    e_cap = ((n_nodes - 1 + len(loop_pairs) + 1023) // 1024) * 1024
    idx = np.zeros((e_cap, 2), np.int32)
    meas = np.zeros((e_cap, 3), np.float32)
    etype = np.zeros((e_cap,), np.int32)
    mask = np.zeros((e_cap,), bool)
    for i in range(n_nodes - 1):
        idx[i], meas[i], etype[i], mask[i] = (i, i + 1), odo[i], ODOMETRY, True
    for k, (a, b) in enumerate(loop_pairs):
        j = n_nodes - 1 + k
        rel = np.asarray(se2_op.relative(jnp.asarray(gt_nodes[a]),
                                         jnp.asarray(gt_nodes[b])))
        idx[j], etype[j], mask[j] = (a, b), LOOP_APPEARANCE, True
        meas[j] = rel + rng.normal(0, [0.05, 0.05, 0.005])
    sqrt_info = np.asarray(posegraph.default_sqrt_info(jnp.asarray(etype),
                                                       pgo_cfg))
    edges = posegraph.make_edges(idx, meas, sqrt_info, etype, mask)
    loop_cap = max(((len(loop_pairs) + 63) // 64) * 64, 64)
    return (jnp.asarray(poses), jnp.ones((n_nodes,), bool), edges, pgo_cfg,
            loop_cap, poses, gt_nodes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--solver", default="schur")
    ap.add_argument("--tri", type=int, default=1)
    ap.add_argument("--lago", type=int, default=1)
    args = ap.parse_args()

    import jax

    from tbv_slam_public_tpu.ops import posegraph

    print(f"[bisect] n={args.n} solver={args.solver} "
          f"backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    jposes, nmask, edges, pgo_cfg, loop_cap, poses0, gt = build_graph(
        args.n, rng)
    from dataclasses import replace
    pgo_cfg = replace(pgo_cfg, tri_damping=bool(args.tri),
                      lago_init=bool(args.lago))
    t0 = time.perf_counter()
    lowered = jax.jit(
        lambda p: posegraph.optimize(
            p, nmask, edges, pgo_cfg, solver=args.solver,
            loop_cap=loop_cap if args.solver == "schur" else None)
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
    est = np.asarray(res.poses)
    ate0 = float(np.sqrt(np.mean(np.sum((poses0[:, :2] - gt[:, :2])**2, 1))))
    ate1 = float(np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2])**2, 1))))
    print(f"[bisect] run2: {dt*1e3:.1f}ms cost {float(res.cost0):.4g} -> "
          f"{float(res.cost):.4g} iters={int(res.iterations)} "
          f"ATE {ate0:.2f} -> {ate1:.2f} m", flush=True)


if __name__ == "__main__":
    main()
