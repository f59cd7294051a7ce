#!/usr/bin/env python
"""1-vs-2-device matrix over distributed-PGO preconditioner configs (pinned
cores, sequential) to pick the strong-scaling winner.  Prints one JSON line
per (config, devices)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEASURE = r"""
import os, sys, json, time
n_dev = int(sys.argv[1]); pre = sys.argv[2]; seg = int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_dev}").strip()
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from tbv_slam_public_tpu.core.config import PGOConfig
from tbv_slam_public_tpu.io import simulate
from tbv_slam_public_tpu.ops import posegraph
from tbv_slam_public_tpu.parallel import pgo as par_pgo
from tbv_slam_public_tpu.eval.trajectory import ate_rmse
assert len(jax.devices()) == n_dev
z = np.load(%r)
inst = simulate.make_real_odometry_pgo_instance(z["odom"], z["gt"], seed=0)
n = len(inst.poses); ncap = ((n + 31) // 32) * 32
poses = np.zeros((ncap, 3), np.float32); poses[:n] = inst.poses
nmask = np.zeros((ncap,), bool); nmask[:n] = True
cfg = PGOConfig(max_iterations=16)
si = np.asarray(posegraph.default_sqrt_info(jnp.asarray(inst.etype), cfg))
edges = posegraph.make_edges(inst.idx, inst.meas, si, inst.etype, inst.mask)
mesh = par_pgo.make_mesh()
jp, jm = jnp.asarray(poses), jnp.asarray(nmask)
kw = dict(preconditioner=pre)
if seg: kw["precond_seg"] = seg
f = lambda: par_pgo.optimize_distributed(mesh, jp, jm, edges, cfg, **kw)
r = f(); jax.block_until_ready(r.poses)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); r = f(); jax.block_until_ready(r.poses)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"pre": pre, "seg": seg, "devices": n_dev,
                  "ms": round(best * 1e3, 1),
                  "ate": round(float(ate_rmse(np.asarray(r.poses)[:n],
                                              inst.gt)), 3)}))
""" % (REPO, os.path.join(REPO, "tests", "fixtures",
                          "oxford_10-12-32_real_odometry.npz"))


def run(n_dev, pre, seg):
    cores = "0" if n_dev == 1 else "0,1"
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "-c", MEASURE,
         str(n_dev), pre, str(seg)],
        capture_output=True, text=True, timeout=2400).stdout
    line = out.strip().splitlines()[-1] if out.strip() else "{}"
    print(line, flush=True)
    return json.loads(line)


if __name__ == "__main__":
    configs = [("chain", 0), ("chain_sharded", 16), ("chain_sharded", 32),
               ("chain_sharded", 64)]
    if len(sys.argv) > 1:  # e.g. "chain:0,chain_sharded:64"
        configs = [(p, int(s)) for p, s in
                   (c.split(":") for c in sys.argv[1].split(","))]
    for pre, seg in configs:
        r1 = run(1, pre, seg)
        r2 = run(2, pre, seg)
        eff = r1["ms"] / (2 * r2["ms"])
        print(json.dumps({"pre": pre, "seg": seg, "eff": round(eff, 3)}),
              flush=True)
