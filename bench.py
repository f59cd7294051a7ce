#!/usr/bin/env python
"""Benchmark: loop-candidate register+verify throughput per chip (headline),
odometry frame latency and PGO wall-clock, vs the reference's CPU numbers.

Reference baselines (BASELINE.md, job_0/time_statistics.txt):
- loop candidate registration 8.5 ms + verification 24.4 ms sequential
  => 30.4 candidates/s,
- odometry real-time bound: 4 Hz sensor,
- final pose-graph optimization: 980.8 ms.

Prints ONE JSON line with the headline metric; extra stages are nested under
"extra".  Run with --small for a CPU smoke test.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASE_CANDS_PER_S = 1000.0 / (8.5 + 24.4)  # reference sequential loop pipeline
BASE_PGO_MS = 980.8
BASE_ODOM_MS = 250.0  # 4 Hz sensor period (real-time bound)


def _timeit(fn, iters=10):
    import jax
    jax.block_until_ready(fn())  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _enable_compile_cache():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _stage(msg):
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CPU smoke-test shapes")
    ap.add_argument("--batch", type=int, default=32, help="candidate batch")
    ap.add_argument("--full", action="store_true",
                    help="include the batched-odometry stage")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from tbv_slam_public_tpu.core.config import (FeatureConfig, PGOConfig,
                                                 RadarConfig,
                                                 RegistrationConfig, TBVConfig,
                                                 VerificationConfig)
    from tbv_slam_public_tpu.core.types import LOOP_APPEARANCE, ODOMETRY
    from tbv_slam_public_tpu.io import simulate
    from tbv_slam_public_tpu.models import loopclosure as lc
    from tbv_slam_public_tpu.models import odometry
    from tbv_slam_public_tpu.ops import features, logistic, posegraph, radar

    if args.small:
        cfg = TBVConfig(
            radar=RadarConfig(num_azimuths=100, num_range_bins=256,
                              range_res=0.4, k_strongest=8, min_distance=1.0,
                              max_distance=90.0),
            features=FeatureConfig(cell_capacity=256, grid_extent=100.0),
            registration=RegistrationConfig(cost="P2L", weight_option=4),
            verification=VerificationConfig(peaks_capacity=512),
        )
        batch = min(args.batch, 8)
        n_nodes = 128
    else:
        # Oxford CTS350-X scale (radar_driver.h:41-43)
        cfg = TBVConfig(
            radar=RadarConfig(),  # 400 x 3768, k=12
            features=FeatureConfig(cell_capacity=512),
            registration=RegistrationConfig(cost="P2L", weight_option=4),
            verification=VerificationConfig(peaks_capacity=1024),
        )
        batch = args.batch
        n_nodes = 4096  # the reference's Oxford run optimizes ~4471 keyframes

    rng = np.random.default_rng(0)
    world = simulate.make_world(rng, num_walls=80,
                                extent=60.0 if args.small else 120.0)

    def scan_at(pose):
        img = simulate.render_scan(
            world, np.asarray(pose), num_azimuths=cfg.radar.num_azimuths,
            num_range_bins=cfg.radar.num_range_bins,
            range_res=cfg.radar.range_res, rng=rng)
        cloud, peaks = radar.kstrongest_filter(jnp.asarray(img), cfg.radar)
        cells = features.compute_cells(cloud, cfg.features)
        cap = cfg.verification.peaks_capacity
        peaks_v = jax.tree.map(lambda x: x[:cap], peaks)
        return img, cloud, peaks_v, cells

    # ---- stage 1: odometry frame step ------------------------------------
    _stage("stage 1: odometry step")
    state = odometry.init_state(cfg)
    img0, *_ = scan_at([0.0, 0.0, 0.0])
    img1, *_ = scan_at([1.0, 0.1, 0.01])
    state, _ = odometry.first_frame(state, jnp.asarray(img0), cfg)
    image = jnp.asarray(img1)
    odom_ms = _timeit(
        lambda: odometry.odometry_step(state, image, cfg)[1].pose) * 1e3

    # ---- stage 1b (--full): batched multi-sequence odometry --------------
    odom_fps_batched = None
    b_seq = 8 if args.small else 16
    if args.full:
        _stage("stage 1b: batched odometry")
        bstate = jax.tree.map(lambda x: jnp.stack([x] * b_seq), state)
        bimage = jnp.stack([image] * b_seq)
        bodom_ms = _timeit(
            lambda: odometry.batched_odometry_step(bstate, bimage, cfg)[1].pose
        ) * 1e3
        odom_fps_batched = b_seq / (bodom_ms / 1e3)

    # ---- stage 2: batched loop candidate register+verify -----------------
    _stage("stage 2: candidate wave")
    _, _, q_peaks, q_cells = scan_at([0.0, 0.0, 0.0])
    cands = [scan_at([2.0 * (i % 5), 1.5 * (i % 3), 0.1 * i])
             for i in range(batch)]
    c_peaks = jax.tree.map(lambda *x: jnp.stack(x), *[c[2] for c in cands])
    c_cells = jax.tree.map(lambda *x: jnp.stack(x), *[c[3] for c in cands])
    align_model = logistic.from_values(cfg.verification.alignment_coefs[0],
                                       cfg.verification.alignment_coefs[1:])
    loop_model = logistic.from_values(cfg.verification.loop_coefs[0],
                                      cfg.verification.loop_coefs[1:])
    zeros = jnp.zeros((batch,))

    def cand_wave():
        return lc.register_and_verify(
            q_cells, q_peaks, c_cells, c_peaks, jnp.zeros((batch, 3)), zeros,
            0.2 + zeros, 0.1 + zeros, jnp.ones((batch,), bool),
            align_model, loop_model, cfg).prob

    wave_s = _timeit(cand_wave)
    cands_per_s = batch / wave_s

    # ---- stage 3: pose-graph optimization --------------------------------
    # TBV-like instance at the reference's graph scale (Oxford run: ~4471
    # keyframes, one 980.8 ms Ceres solve): a closed circuit traversed
    # twice, 1.5 m keyframes, drifting odometry, loop edges at revisits.
    _stage("stage 3: pose-graph optimization")
    from tbv_slam_public_tpu.core import se2 as se2_op

    pgo_cfg = PGOConfig()
    per_lap = n_nodes // 2
    circ_r = per_lap * 1.5 / (2 * np.pi)
    gt_nodes = np.zeros((n_nodes, 3), np.float32)
    for i in range(n_nodes):
        a = 2 * np.pi * (i % per_lap) / per_lap
        gt_nodes[i] = [circ_r * np.cos(a), circ_r * np.sin(a),
                       a + np.pi / 2]
    odo = []
    for i in range(n_nodes - 1):
        rel = np.asarray(se2_op.relative(jnp.asarray(gt_nodes[i]),
                                         jnp.asarray(gt_nodes[i + 1])))
        odo.append(rel + rng.normal(0, [0.03, 0.03, 0.003]))
    poses = np.zeros((n_nodes, 3), np.float32)
    for i in range(n_nodes - 1):
        poses[i + 1] = np.asarray(se2_op.compose(jnp.asarray(poses[i]),
                                                 jnp.asarray(odo[i],
                                                             jnp.float32)))
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
    jposes = jnp.asarray(poses)
    nmask = jnp.ones((n_nodes,), bool)
    loop_cap = max(((len(loop_pairs) + 63) // 64) * 64, 64)
    pgo_ms = _timeit(
        lambda: posegraph.optimize(jposes, nmask, edges, pgo_cfg,
                                   solver="schur",
                                   loop_cap=loop_cap).poses, iters=5) * 1e3
    pgo_res = posegraph.optimize(jposes, nmask, edges, pgo_cfg,
                                 solver="schur", loop_cap=loop_cap)
    est_n = np.asarray(pgo_res.poses)
    pgo_ate0 = float(np.sqrt(np.mean(np.sum(
        (poses[:, :2] - gt_nodes[:, :2]) ** 2, 1))))
    pgo_ate = float(np.sqrt(np.mean(np.sum(
        (est_n[:, :2] - gt_nodes[:, :2]) ** 2, 1))))

    result = {
        "metric": "loop_candidates_per_s",
        "value": round(cands_per_s, 2),
        "unit": "candidates/s/chip",
        "vs_baseline": round(cands_per_s / BASE_CANDS_PER_S, 2),
        "extra": {
            "odometry_step_ms": round(odom_ms, 2),
            "odometry_vs_realtime": round(BASE_ODOM_MS / odom_ms, 2),
            **({"odometry_frames_per_s_batched": round(odom_fps_batched, 1),
                "odometry_batch": b_seq} if odom_fps_batched else {}),
            f"pgo_{n_nodes}node_ms": round(pgo_ms, 2),
            "pgo_vs_baseline": round(BASE_PGO_MS / pgo_ms, 2),
            "pgo_ate_before_m": round(pgo_ate0, 2),
            "pgo_ate_after_m": round(pgo_ate, 2),
            "pgo_iterations": int(pgo_res.iterations),
            "candidate_batch": batch,
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
