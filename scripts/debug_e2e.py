#!/usr/bin/env python
"""Debug the small e2e stage: why are detected loops rejected?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tbv_slam_public_tpu.core.config import (FeatureConfig, LoopClosureConfig,
                                             OdometryConfig, RadarConfig,
                                             RegistrationConfig,
                                             ScanContextConfig, TBVConfig,
                                             VerificationConfig)
from tbv_slam_public_tpu.eval import loops as loops_eval
from tbv_slam_public_tpu.eval import trajectory as tj
from tbv_slam_public_tpu.io import simulate
from tbv_slam_public_tpu.models.slam import TBVSLAM

n_frames = 80
e2e_cfg = TBVConfig(
    radar=RadarConfig(num_azimuths=160, num_range_bins=320,
                      range_res=0.35, k_strongest=10,
                      min_distance=1.5, max_distance=100.0),
    features=FeatureConfig(resolution=3.0, cell_capacity=256,
                           grid_extent=100.0),
    registration=RegistrationConfig(cost="P2L", weight_option=4),
    odometry=OdometryConfig(submap_scan_size=3, compensate=False),
    scancontext=ScanContextConfig(max_radius=80.0, n_candidates=3,
                                  num_candidates_from_tree=8, db_chunk=256),
    verification=VerificationConfig(model_threshold=0.5, peaks_capacity=1024),
    loopclosure=LoopClosureConfig(n_aggregate=1, local_map_capacity=2048),
)
seq = simulate.make_sequence(
    num_frames=n_frames, seed=7, num_azimuths=160, num_range_bins=320,
    range_res=0.35, traj_kwargs=dict(radius=8.0, step=0.8, laps=3.0))
slam = TBVSLAM(e2e_cfg)
g0 = seq.gt_poses[0]
gt_rels = [np.asarray(simulate._se2_rel(g0, seq.gt_poses[i]))
           for i in range(seq.images.shape[0])]
slam.process_frames_chunked(seq.images,
                            stamps=[i * 0.25 for i in range(n_frames)],
                            gt_poses=gt_rels, chunk=16, search_loops=False)
n_kf = slam.graph.num_nodes
gt = slam.graph.gt_array()
print("keyframes:", n_kf, "odom-only ATE:",
      tj.ate_rmse(slam.graph.poses_array(), gt))

DRIFT = os.environ.get("DRIFT", "1") == "1"
if DRIFT:
    od_idx = np.asarray([e["idx"] for e in slam.graph.edges
                         if e["etype"] == 0], np.int32).reshape(-1, 2)
    od_meas = np.stack([e["meas"] for e in slam.graph.edges
                        if e["etype"] == 0])
    traveled = slam.graph.traveled_distance()
    target = float(os.environ.get("TARGET", 2 * 0.0128 * traveled))
    print("traveled:", traveled, "target ate:", target)
    drift_poses, drift_meas = simulate.inject_odometry_drift(
        slam.graph.poses_array(), od_idx, od_meas, gt,
        target_ate_m=target, seed=3)
    k = 0
    for e in slam.graph.edges:
        if e["etype"] == 0:
            e["meas"] = drift_meas[k]
            k += 1
    for i in range(n_kf):
        slam.graph.poses[i] = drift_poses[i]
        slam.loops.kf_odom[i] = drift_poses[i]
    print("drifted ATE:", tj.ate_rmse(drift_poses, gt))

cons = slam.loops.process_all_batched()
print("accepted loops:", len(cons))
log = slam.loops.candidate_log
print("candidates:", len(log))
if log:
    probs = np.asarray([r["prob"] for r in log])
    sc = np.asarray([r["sc_sim"] for r in log])
    ob = np.asarray([r["odom_bounds"] for r in log])
    aq = np.asarray([r["alignment_quality"] for r in log])
    ok = np.asarray([r["reg_ok"] for r in log])
    print(f"prob: max {probs.max():.3f} p90 {np.percentile(probs, 90):.3f} "
          f"median {np.median(probs):.3f}")
    print(f"sc_sim: median {np.median(sc):.3f} min {sc.min():.3f}")
    print(f"odom_bounds: median {np.median(ob):.3f} min {ob.min():.3f}")
    print(f"align_q: median {np.median(aq):.3f} max {aq.max():.3f}")
    print(f"reg_ok: {ok.mean():.2f}")
    lab = loops_eval.label_candidate_log(log, gt)
    is_loop = np.asarray([r["is_loop"] for r in lab], bool)
    regok_gt = np.asarray([r["reg_ok"] for r in lab], bool)
    print("labels: is_loop", is_loop.sum(), "reg_ok(gt)", regok_gt.sum())
    for i in np.argsort(-probs)[:8]:
        print(f"  cand from={log[i]['id_from']} to={log[i]['id_to']} "
              f"prob={probs[i]:.3f} sc={sc[i]:.3f} ob={ob[i]:.3f} "
              f"aq={aq[i]:.2f} reg_ok={bool(ok[i])} "
              f"is_loop={bool(is_loop[i])} gt_ok={bool(regok_gt[i])} "
              f"t_be={np.round(np.asarray(log[i]['t_be']), 2)}")

for c in cons:
    slam.graph.add_loop_constraint(c)
summary = slam.finish(optimize=True, solver="auto")
print("ate_after:", summary.metrics["ate_rmse"], "loops:", summary.num_loops)

import numpy as np
np.savez("/tmp/e2e_small_graph.npz",
         poses=np.stack([np.asarray(p) for p in slam.graph.poses]),
         gt=gt,
         drift_poses=drift_poses,
         edge_idx=np.asarray([e["idx"] for e in slam.graph.edges]),
         edge_meas=np.stack([e["meas"] for e in slam.graph.edges]),
         edge_type=np.asarray([e["etype"] for e in slam.graph.edges]))
print("saved instance")
