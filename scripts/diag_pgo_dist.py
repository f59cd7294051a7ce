#!/usr/bin/env python
"""Break down where the distributed-PGO wall-clock goes (VERDICT r5 #6):
times the full solve vs variants (jacobi precond, halved CG budget, halved
LM budget) on a pinned single CPU device to locate the Amdahl term.

Usage: taskset -c 0 python scripts/diag_pgo_dist.py [n_devices]
"""
import json
import os
import sys
import time

n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 1
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={n_dev}"
                           ).strip()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env alone is too late
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tbv_slam_public_tpu.core.config import PGOConfig  # noqa: E402
from tbv_slam_public_tpu.io import simulate  # noqa: E402
from tbv_slam_public_tpu.ops import posegraph  # noqa: E402
from tbv_slam_public_tpu.parallel import pgo as par_pgo  # noqa: E402

z = np.load(os.path.join(REPO, "tests", "fixtures",
                         "oxford_10-12-32_real_odometry.npz"))
inst = simulate.make_real_odometry_pgo_instance(z["odom"], z["gt"], seed=0)
n = len(inst.poses)
ncap = ((n + 31) // 32) * 32
poses = np.zeros((ncap, 3), np.float32)
poses[:n] = inst.poses
nmask = np.zeros((ncap,), bool)
nmask[:n] = True
mesh = par_pgo.make_mesh()
jposes, jnmask = jnp.asarray(poses), jnp.asarray(nmask)


def run(tag, cfg, precond="chain"):
    sqrt_info = np.asarray(posegraph.default_sqrt_info(
        jnp.asarray(inst.etype), cfg))
    edges = posegraph.make_edges(inst.idx, inst.meas, sqrt_info, inst.etype,
                                 inst.mask)
    f = lambda: par_pgo.optimize_distributed(mesh, jposes, jnmask, edges,
                                             cfg, preconditioner=precond)
    res = f()
    jax.block_until_ready(res.poses)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f()
        jax.block_until_ready(r.poses)
        best = min(best, time.perf_counter() - t0)
    from tbv_slam_public_tpu.eval.trajectory import ate_rmse
    ate = ate_rmse(np.asarray(r.poses)[:n], inst.gt)
    print(json.dumps({"tag": tag, "devices": n_dev,
                      "ms": round(best * 1e3, 1),
                      "ate": round(float(ate), 3)}), flush=True)
    return best


base = run("full(16LM,100CG,chain)", PGOConfig(max_iterations=16))
run("50CG", PGOConfig(max_iterations=16, cg_iterations=50))
run("25CG", PGOConfig(max_iterations=16, cg_iterations=25))
run("8LM", PGOConfig(max_iterations=8))
run("jacobi", PGOConfig(max_iterations=16), precond="jacobi")
run("seg64", PGOConfig(max_iterations=16, schur_seg=64))
