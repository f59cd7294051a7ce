#!/usr/bin/env python
"""Per-query recall accounting for the full-size e2e loop stage (VERDICT r5
item #3): for every keyframe with a GT loop opportunity, classify the outcome
as accepted / below-threshold / reg-failed / retrieved-wrong / not-retrieved.

Run on CPU (JAX_PLATFORMS=cpu) — accuracy diagnosis, not timing.
Env overrides: FRAMES, TREE_K (num_candidates_from_tree), NCAND
(n_candidates), THRESH (model_threshold).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

import numpy as np  # noqa: E402

from tbv_slam_public_tpu.core.config import (  # noqa: E402
    FeatureConfig, LoopClosureConfig, OdometryConfig, PGOConfig, RadarConfig,
    RegistrationConfig, ScanContextConfig, TBVConfig, VerificationConfig)
from tbv_slam_public_tpu.eval import loops as loops_eval  # noqa: E402
from tbv_slam_public_tpu.eval import trajectory as tj  # noqa: E402
from tbv_slam_public_tpu.io import simulate  # noqa: E402
from tbv_slam_public_tpu.models.slam import TBVSLAM  # noqa: E402

n_frames = int(os.environ.get("FRAMES", "520"))
tree_k = int(os.environ.get("TREE_K", "8"))
n_cand = int(os.environ.get("NCAND", "3"))
thresh = float(os.environ.get("THRESH", "0.5"))
e2e_cfg = TBVConfig(
    radar=RadarConfig(num_azimuths=160, num_range_bins=320,
                      range_res=0.35, k_strongest=10,
                      min_distance=1.5, max_distance=100.0),
    features=FeatureConfig(resolution=3.0, cell_capacity=256,
                           grid_extent=100.0),
    registration=RegistrationConfig(cost="P2L", weight_option=4),
    odometry=OdometryConfig(submap_scan_size=3, compensate=False),
    scancontext=ScanContextConfig(max_radius=80.0, n_candidates=n_cand,
                                  num_candidates_from_tree=tree_k,
                                  db_chunk=256),
    verification=VerificationConfig(model_threshold=thresh,
                                    peaks_capacity=1024),
    loopclosure=LoopClosureConfig(n_aggregate=1, local_map_capacity=2048),
    pgo=PGOConfig(loop_scaling=1.0, cauchy_scale=10.0),
)
seq = simulate.make_sequence(
    num_frames=n_frames, seed=7, num_azimuths=160, num_range_bins=320,
    range_res=0.35, traj_kwargs=dict(radius=20.0, step=0.8, laps=3.0))
slam = TBVSLAM(e2e_cfg)
g0 = seq.gt_poses[0]
gt_rels = [np.asarray(simulate._se2_rel(g0, seq.gt_poses[i]))
           for i in range(seq.images.shape[0])]
t0 = time.perf_counter()
slam.process_frames_chunked(seq.images,
                            stamps=[i * 0.25 for i in range(n_frames)],
                            gt_poses=gt_rels, chunk=32, search_loops=False)
print(f"odometry: {time.perf_counter() - t0:.1f}s", flush=True)
n_kf = slam.graph.num_nodes
gt = slam.graph.gt_array()

od_idx = np.asarray([e["idx"] for e in slam.graph.edges
                     if e["etype"] == 0], np.int32).reshape(-1, 2)
od_meas = np.stack([e["meas"] for e in slam.graph.edges
                    if e["etype"] == 0])
traveled = slam.graph.traveled_distance()
target = max(3.2, 0.0128 * traveled)
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
print("keyframes:", n_kf, "drifted ATE:", tj.ate_rmse(drift_poses, gt))

if os.environ.get("TRAIN", "0") == "1":
    # In-run self-supervised alignment training (tbv_slam_online.cpp:185-188)
    # BEFORE the loop phase: the published alignment coefficients were fitted
    # on real Oxford feature statistics and mis-score the sim world's
    # (median align_q -6.96 on correctly-registered true loops).
    from tbv_slam_public_tpu.models.verification import AlignmentLearner

    lr = AlignmentLearner(e2e_cfg.verification)
    t0 = time.perf_counter()
    for i in range(n_kf):
        lr.add_training_pair(slam.loops.kf_peaks[i], slam.loops.kf_cells[i],
                             slam.loops.kf_odom[i])
    # held-out eval: fit on the first 80% of pairs, score the rest
    xs, ys = np.concatenate(lr._x), np.concatenate(lr._y)
    cut = int(0.8 * len(ys))
    from tbv_slam_public_tpu.ops import logistic

    m80 = logistic.fit(np.asarray(xs[:cut]), np.asarray(ys[:cut]),
                       balanced=True)
    import jax.numpy as jnp
    pred = np.asarray(logistic.predict_proba(m80, jnp.asarray(xs[cut:]))) > 0.5
    acc = float((pred == ys[cut:].astype(bool)).mean())
    lr.fit()
    slam.loops.align_model = lr.model
    print(f"alignment training: {time.perf_counter()-t0:.1f}s "
          f"{len(ys)} samples, held-out acc {acc:.3f}", flush=True)
    print("  coefs:", np.asarray(lr.model.coef).round(3),
          "intercept:", float(np.asarray(lr.model.intercept).round(3)))

t1 = time.perf_counter()
cons = slam.loops.process_all_batched(pair_chunk=256)
print(f"loop phase: {time.perf_counter() - t1:.1f}s  accepted: {len(cons)}",
      flush=True)
log = slam.loops.candidate_log
lab = loops_eval.label_candidate_log(log, gt)

# GT loop opportunities: queries with any prior kf within 6 m and >= 10 idx
xy = gt[:, :2]
d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
ii, jj = np.meshgrid(np.arange(n_kf), np.arange(n_kf), indexing="ij")
opp = (d < 6.0) & (ii - jj >= 10)
has_gt = opp.any(axis=1)
print("queries with GT loop opportunity:", int(has_gt.sum()), "/", n_kf)

by_q = {}
for r in lab:
    by_q.setdefault(r["id_from"], []).append(r)

cat = dict(accepted=0, below_thresh=0, reg_failed=0, retrieved_wrong=0,
           not_retrieved=0)
below_rows = []
for q in range(n_kf):
    if not has_gt[q]:
        continue
    rows = by_q.get(q, [])
    loops = [r for r in rows if r["is_loop"]]
    acc = [r for r in loops if r["prob"] > thresh and r["reg_ok"]]
    if acc:
        cat["accepted"] += 1
    elif loops:
        ok = [r for r in loops if r["reg_ok"]]
        if ok:
            cat["below_thresh"] += 1
            below_rows.append(max(ok, key=lambda r: r["prob"]))
        else:
            cat["reg_failed"] += 1
    elif rows:
        cat["retrieved_wrong"] += 1
    else:
        cat["not_retrieved"] += 1
print("per-query outcome:", cat)
rec = cat["accepted"] / max(int(has_gt.sum()), 1)
acc_rows = [r for r in lab if r["prob"] > thresh]
tp = sum(1 for r in acc_rows if r["is_loop"] and r["reg_ok"])
prec = tp / max(len(acc_rows), 1)
print(f"recall: {rec:.3f}  precision: {prec:.3f} "
      f"({tp}/{len(acc_rows)} accepted rows)")

if below_rows:
    probs = np.asarray([r["prob"] for r in below_rows])
    sc = np.asarray([r["sc_sim"] for r in below_rows])
    ob = np.asarray([r["odom_bounds"] for r in below_rows])
    aq = np.asarray([r["alignment_quality"] for r in below_rows])
    print(f"below-threshold best-loop rows ({len(below_rows)}): "
          f"prob med {np.median(probs):.3f} p90 {np.percentile(probs,90):.3f}")
    print(f"  sc_sim med {np.median(sc):.3f}  odom_b med {np.median(ob):.3f}"
          f"  align_q med {np.median(aq):.2f}")
    # which feature is costing the prob? show a few
    for r in sorted(below_rows, key=lambda r: -r["prob"])[:10]:
        print(f"  from={r['id_from']} to={r['id_to']} prob={r['prob']:.3f} "
              f"sc={r['sc_sim']:.3f} ob={r['odom_bounds']:.3f} "
              f"aq={r['alignment_quality']:.2f} "
              f"gt_ok={bool(r['reg_ok'] and r['is_loop'])}")

# also: of the not_retrieved/retrieved_wrong queries, what was available?
miss = [q for q in range(n_kf) if has_gt[q] and not any(
    r["is_loop"] for r in by_q.get(q, []))]
print(f"queries whose retrieval missed every GT loop: {len(miss)}")
print("  e.g.", miss[:15])
