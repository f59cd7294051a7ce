#!/usr/bin/env python
"""Benchmark: loop-candidate register+verify throughput per chip (headline),
odometry frame latency and PGO wall-clock + loop-closure ATE correction,
vs the reference's CPU numbers.

Reference baselines (BASELINE.md, job_0/time_statistics.txt):
- loop candidate registration 8.5 ms + verification 24.4 ms sequential
  => 30.4 candidates/s,
- odometry real-time bound: 4 Hz sensor,
- final pose-graph optimization: 980.8 ms (one ~4471-keyframe Ceres solve),
- Oxford 10-12-32 ATE: odometry 7.29 m -> SLAM 4.07 m.

Evidence resilience (VERDICT r1 #1): every stage runs under its own
try/except; partial results are flushed to stderr as each stage completes,
and the final JSON line is ALWAYS printed with whatever succeeded.  A stage
crash costs that stage's metrics, not the round's record.

Run with --small for a CPU smoke test.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

BASE_CANDS_PER_S = 1000.0 / (8.5 + 24.4)  # reference sequential loop pipeline
BASE_PGO_MS = 980.8
BASE_ODOM_MS = 250.0  # 4 Hz sensor period (real-time bound)

FIXTURE_GT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "fixtures",
                          "oxford_10-12-32_keyframe_gt.npz")
FIXTURE_REAL_ODOM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tests", "fixtures",
                                 "oxford_10-12-32_real_odometry.npz")


class UnforcedMeasurement(RuntimeError):
    """A timing came out faster than physics allows — the chain was not
    actually forced to execute (the r2/r3 PARITY failure mode)."""


def _slope_time(fn_chained, n_lo, n_hi, reps=3):
    """TRUE per-iteration seconds on a lazily-executing device (r3 fix).

    The tunneled TPU backend used by this environment evaluates lazily:
    futures whose values are never fetched to the host are DROPPED, and
    ``jax.block_until_ready`` returns without forcing execution — so naive
    block_until_ready loop timing (the r1/r2 ``_timeit``, since removed)
    measured Python dispatch only
    (measured: a 4-TFLOP matmul chain "completed" in 0.04 ms; fetching its
    value took 14.7 s).  Methodology here:

    - ``fn_chained(eps) -> eps'`` must thread a scalar through the real
      computation (input perturbation -> output reduction), so ONE host
      fetch of the final eps forces the whole chain to execute;
    - the slope between two chain lengths cancels the constant ~27 ms
      tunnel round trip and any one-off dispatch cost;
    - each chain length is measured ``reps`` times and the MIN taken
      (ADVICE r3: a single noisy pair can invert the slope), and a
      non-positive slope raises instead of silently clamping to 1e-9 s
      (which would fabricate ~1e9 ops/s throughputs).
    """
    import jax.numpy as jnp

    eps = fn_chained(jnp.float32(0))
    np.asarray(eps)  # warmup/compile + sync

    def total(k):
        best = float("inf")
        for _ in range(reps):
            e = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(k):
                e = fn_chained(e)
            np.asarray(e)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = total(n_lo)
    t_hi = total(n_hi)
    slope = (t_hi - t_lo) / (n_hi - n_lo)
    if slope <= 0:
        raise UnforcedMeasurement(
            f"non-positive slope ({t_lo=:.4f}s @ {n_lo}, {t_hi=:.4f}s @ "
            f"{n_hi}): timing noise exceeds the per-iteration cost — "
            "lengthen the chains instead of reporting a fabricated number")
    return slope


def _median_slope_time(fn_chained, n_lo, n_hi, passes=3, **kw):
    """Median of ``passes`` time-separated ``_slope_time`` measurements.

    VERDICT r4 weak #2: the tunneled backend's throughput drifts up to ~3x
    over minutes, so a single slope measurement (stage 1/2b/3 in r4) is
    reproducible only to that factor — which is exactly how the builder's
    12.8 ms and the driver's 49.63 ms odometry step could both be "real".
    The median of three measurements taken minutes apart rejects one
    drift-window outlier in either direction, the same defense the stage-2
    batch sweep got in r4 (median over interleaved passes).
    """
    from statistics import median

    return median(_slope_time(fn_chained, n_lo, n_hi, **kw)
                  for _ in range(passes))


def _calibrate_timing(peak_flops=2.0e15):
    """Execution-forcing guard (VERDICT r3 #1): slope-time a matmul chain of
    KNOWN FLOPs; if the implied FLOP/s exceeds any physically possible rate
    for one chip (default guard: 2e15, ~5x a v5e's bf16 peak), the timing
    harness is NOT forcing execution and every subsequent number would be
    fiction — abort the bench rather than record it.

    Returns the measured matmul TFLOP/s (a useful roofline anchor).
    """
    import jax
    import jax.numpy as jnp

    n = 1024
    # non-degenerate operand passed as a runtime ARGUMENT: an all-ones (or
    # any constant) matrix lets XLA rewrite the matmul algebraically and the
    # "calibration" then measures a reduce, reporting impossible TFLOP/s
    a = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n)) / np.sqrt(n),
        jnp.bfloat16)
    flops_per_iter = 2.0 * n * n * n * 4  # 4 matmuls per link

    @jax.jit
    def link(e, a):
        x = a + e.astype(jnp.bfloat16)
        for _ in range(4):
            x = jnp.matmul(x, a) * 0.5  # keep |x| bounded across the chain
        return jnp.sum(x).astype(jnp.float32) * 1e-30

    sec = _slope_time(lambda e: link(e, a), 8, 32)
    flops = flops_per_iter / sec
    if flops > peak_flops:
        raise UnforcedMeasurement(
            f"calibration matmul implies {flops:.3e} FLOP/s > physical peak "
            f"{peak_flops:.1e} — the timing chain is not forcing execution")
    return flops / 1e12


def _enable_compile_cache():
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
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CPU smoke-test shapes")
    ap.add_argument("--batch", type=int, default=32, help="candidate batch")
    ap.add_argument("--full", action="store_true",
                    help="include the batched-odometry stage")
    ap.add_argument("--pgo-solver", default="schur",
                    choices=["schur", "cholesky", "cg"])
    args = ap.parse_args()

    _enable_compile_cache()
    import jax

    if args.small:
        # CPU smoke MUST NOT touch the (shared, contention-sensitive) TPU.
        # The container's sitecustomize imports jax before any env var set
        # in the launching shell takes effect, so force the platform here.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tbv_slam_public_tpu.core.config import (FeatureConfig, PGOConfig,
                                                 RadarConfig,
                                                 RegistrationConfig, TBVConfig,
                                                 VerificationConfig)
    from tbv_slam_public_tpu.io import simulate
    from tbv_slam_public_tpu.models import loopclosure as lc
    from tbv_slam_public_tpu.models import odometry
    from tbv_slam_public_tpu.ops import features, logistic, posegraph, radar

    extra = {"backend": jax.devices()[0].platform}
    headline = None  # (metric, value, unit, vs_baseline)

    def flush_partial():
        print("[bench] partial: " + json.dumps(extra), file=sys.stderr,
              flush=True)

    def run_stage(name, fn):
        _stage(f"stage: {name}")
        try:
            fn()
        except Exception:
            extra[f"{name}_error"] = traceback.format_exc(limit=3)
            _stage(f"stage {name} FAILED:\n{extra[f'{name}_error']}")
        flush_partial()

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
        pgo_nodes = 512
    else:
        # Oxford CTS350-X scale (radar_driver.h:41-43)
        cfg = TBVConfig(
            radar=RadarConfig(),  # 400 x 3768, k=12
            features=FeatureConfig(cell_capacity=512),
            registration=RegistrationConfig(cost="P2L", weight_option=4),
            verification=VerificationConfig(peaks_capacity=1024),
        )
        batch = args.batch
        pgo_nodes = None  # reference keyframe count (the Oxford GT fixture)

    # ---- stage 0: timing calibration -------------------------------------
    # Every timed metric below is gated on this: if the known-FLOP matmul
    # chain times out faster than hardware allows, the harness is not forcing
    # execution and NO timed number may be recorded (VERDICT r3 #1).
    timing_ok = {"ok": False}

    def stage_calibrate():
        tflops = _calibrate_timing()
        extra["calibration_matmul_tflops"] = round(tflops, 2)
        if tflops > 400.0:
            # beyond ~2x a v5e's bf16 peak: not the unforced-execution
            # failure (that shows up 1e3-1e6x over and aborts), but enough
            # to mark this run's absolute timings as low-confidence
            extra["calibration_suspect"] = True
        timing_ok["ok"] = True

    run_stage("calibrate", stage_calibrate)

    def _checked_slope_time(fn, lo, hi, **kw):
        if not timing_ok["ok"]:
            raise UnforcedMeasurement(
                "timing calibration failed — refusing to record a timed "
                "metric from an unforced harness")
        return _slope_time(fn, lo, hi, **kw)

    def _checked_median_time(fn, lo, hi, **kw):
        if not timing_ok["ok"]:
            raise UnforcedMeasurement(
                "timing calibration failed — refusing to record a timed "
                "metric from an unforced harness")
        return _median_slope_time(fn, lo, hi, **kw)

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
    state = {}

    def _tree_reduce(*trees):
        # nan_to_num + clip (ADVICE r3): a masked sentinel/inf leaf must not
        # poison eps and perturb subsequent chained iterations' inputs.
        acc = jnp.float32(0)
        for t in trees:
            for leaf in jax.tree.leaves(t):
                v = jnp.nan_to_num(jnp.asarray(leaf, jnp.float32),
                                   posinf=1e6, neginf=-1e6)
                acc = acc + jnp.sum(jnp.clip(v, -1e6, 1e6))
        return acc * 1e-30

    def stage_odometry():
        ostate = odometry.init_state(cfg)
        img0, *_ = scan_at([0.0, 0.0, 0.0])
        img1, *_ = scan_at([1.0, 0.1, 0.01])
        ostate, _ = odometry.first_frame(ostate, jnp.asarray(img0), cfg)
        image = jnp.asarray(img1)

        def odo_chained(eps):
            st = ostate.replace(T_prev=ostate.T_prev + eps)
            st2, out = odometry.odometry_step(st, image, cfg)
            return _tree_reduce(out, st2)

        odom_ms = _checked_median_time(odo_chained, 4, 16) * 1e3
        extra["odometry_step_ms"] = round(odom_ms, 2)
        extra["odometry_vs_realtime"] = round(BASE_ODOM_MS / odom_ms, 2)
        state["ostate"], state["image"] = ostate, image

    run_stage("odometry", stage_odometry)

    # ---- stage 1b (--full): batched multi-sequence odometry --------------
    def stage_odometry_batched():
        b_seq = 8 if args.small else 16
        bstate = jax.tree.map(lambda x: jnp.stack([x] * b_seq),
                              state["ostate"])
        bimage = jnp.stack([state["image"]] * b_seq)

        def chained(eps):
            st = bstate.replace(T_prev=bstate.T_prev + eps)
            st2, out = odometry.batched_odometry_step(st, bimage, cfg)
            return _tree_reduce(out, st2)

        bodom_ms = _checked_slope_time(chained, 4, 12) * 1e3
        extra["odometry_frames_per_s_batched"] = round(
            b_seq / (bodom_ms / 1e3), 1)
        extra["odometry_batch"] = b_seq

    if args.full and "ostate" in state:
        run_stage("odometry_batched", stage_odometry_batched)

    # ---- stage 2: batched loop candidate register+verify -----------------
    # Batch sweep (VERDICT r2 weak #7): the headline is the best SUSTAINED
    # throughput over batch sizes, each measured over >= 20 waves after a
    # warmup wave, so the number is reproducible run-to-run (the r2 record
    # showed a 3x swing from a single 10-wave measurement at batch=32).
    def stage_candidates():
        nonlocal headline
        _, _, q_peaks, q_cells = scan_at([0.0, 0.0, 0.0])
        align_model = logistic.from_values(cfg.verification.alignment_coefs[0],
                                           cfg.verification.alignment_coefs[1:])
        loop_model = logistic.from_values(cfg.verification.loop_coefs[0],
                                          cfg.verification.loop_coefs[1:])
        # 512 added r5: the one-hot association rewrite removed the r4 flat
        # ceiling and the sweep now rises through 256 (BENCH validation run:
        # 8.7k @ 128 -> 10.7k @ 256), so the edge moved up
        batches = [batch] if args.small \
            else sorted({batch, 32, 64, 128, 256, 512})
        sweep = {}
        best = (0.0, 0)
        max_b = max(batches)
        cands = [scan_at([2.0 * (i % 5), 1.5 * (i % 3), 0.1 * i])
                 for i in range(max_b)]
        all_peaks = jax.tree.map(lambda *x: jnp.stack(x),
                                 *[c[2] for c in cands])
        all_cells = jax.tree.map(lambda *x: jnp.stack(x),
                                 *[c[3] for c in cands])

        def measure_batch(b):
            c_peaks = jax.tree.map(lambda x: x[:b], all_peaks)
            c_cells = jax.tree.map(lambda x: x[:b], all_cells)
            zeros = jnp.zeros((b,))

            def cand_wave(eps):
                res = lc.register_and_verify(
                    q_cells, q_peaks, c_cells, c_peaks,
                    jnp.zeros((b, 3)) + eps, zeros, 0.2 + zeros,
                    0.1 + zeros, jnp.ones((b,), bool),
                    align_model, loop_model, cfg)
                return _tree_reduce(res)

            return b / _checked_slope_time(cand_wave, 3, 9)

        # Three INTERLEAVED sweep passes, MEDIAN per batch: the tunneled
        # backend's throughput drifts over minutes, which is what made the
        # r3 sweep non-monotonic — a sequential sweep confounds batch size
        # with measurement time.  The median rejects single outlier slopes
        # in BOTH directions (a best-of/max selection amplified a
        # drift-window mismatch into a fabricated-looking 98k/s once; a
        # slope between a slow t_lo window and a fast t_hi window can be
        # arbitrarily small yet positive, passing the monotonicity guard).
        from statistics import median
        vals = {b: [] for b in batches}
        for pass_ in range(3):
            for b in batches:
                vals[b].append(measure_batch(b))
        for b in batches:
            sweep[str(b)] = round(median(vals[b]), 2)
            if sweep[str(b)] > best[0]:
                best = (sweep[str(b)], b)
        extra["candidate_batch"] = best[1]
        extra["candidate_sweep"] = sweep
        extra["loop_candidates_per_s"] = round(best[0], 2)
        headline = ("loop_candidates_per_s", round(best[0], 2),
                    "candidates/s/chip",
                    round(best[0] / BASE_CANDS_PER_S, 2))

    run_stage("candidate_wave", stage_candidates)

    # ---- stage 2b: descriptor retrieval at reference DB scale -------------
    # detect() (odometry-coupled ring-key NN + all-shift SC distance over
    # augmentations, dedup, top-N) against a 4471-keyframe database — the
    # scale of the reference's Oxford run, where its linear OdometryNNSearch
    # + per-candidate column scans cost 29.9 ms/query on CPU
    # (job_0/time_statistics.txt:25-27, "Detect loop").
    def stage_retrieval():
        from tbv_slam_public_tpu.models import loopclosure as lcm

        sc = cfg.scancontext
        n_db = 4471
        cap = ((n_db + sc.db_chunk - 1) // sc.db_chunk) * sc.db_chunk
        db = lcm.make_db(cap, cfg)
        r = np.random.default_rng(1)
        descs = jnp.asarray(r.uniform(0, 2.0, (cap, sc.num_ring,
                                               sc.num_sector)), jnp.float32)
        rings = jax.vmap(lambda d: d.mean(axis=-1))(descs)
        steps = r.uniform(1.0, 2.5, (cap, 2)).astype(np.float32)
        pose = np.concatenate([np.cumsum(steps, 0),
                               np.zeros((cap, 1), np.float32)], 1)
        db = lcm.db_insert_batch(db, jnp.arange(n_db), descs[:n_db],
                                 rings[:n_db], jnp.asarray(pose[:n_db]))
        a = 1 + (len(sc.augment_offsets) if sc.augment_sc else 0)
        qb = 32  # query wave
        qdescs = jnp.stack([jnp.stack([descs[i] + 0.01 * k
                                       for k in range(a)])
                            for i in range(qb)])
        qrings = jax.vmap(jax.vmap(lambda d: d.mean(axis=-1)))(qdescs)
        slots = jnp.arange(n_db - qb, n_db)
        detect_v = jax.jit(jax.vmap(
            lambda d, rg, s: lcm.detect(db, d, rg, s, cfg),
            in_axes=(0, 0, 0)))

        def chained(eps):
            det = detect_v(qdescs + eps, qrings, slots)
            return _tree_reduce((det.dist, det.index))

        per_wave = _checked_median_time(chained, 3, 9)
        extra["retrieval_db_keyframes"] = n_db
        extra["retrieval_queries_per_s"] = round(qb / per_wave, 1)
        extra["retrieval_ms_per_query"] = round(per_wave / qb * 1e3, 3)
        extra["retrieval_vs_baseline"] = round(
            (qb / per_wave) / (1000.0 / 29.9), 2)

    if not args.small:
        run_stage("retrieval", stage_retrieval)

    # ---- stage 3: pose-graph optimization at reference scale -------------
    # The realistic-drift instance: the reference's own published Oxford
    # 10-12-32 keyframe GT route (4470 keyframes, real revisit structure)
    # with calibrated radar-odometry drift and revisit loop edges
    # (tests/fixtures; VERDICT r1 #2).  Reference final PGO: 980.8 ms
    # (job_0/time_statistics.txt:1-3); reference ATE: odom 7.29 -> est
    # 4.07 m (job_0 result.txt).
    def stage_pgo():
        pgo_cfg = PGOConfig()
        if pgo_nodes is None and os.path.exists(FIXTURE_REAL_ODOM):
            # The strongest instance: the reference's OWN published CFEAR
            # odometry for Oxford 10-12-32 as the initial estimate (real
            # measured drift, job_0/odom/01.txt), GT-revisit loop edges.
            # Published SLAM ATE on this sequence: 4.07 m from odometry
            # drift (est/result.txt:4).
            z = np.load(FIXTURE_REAL_ODOM)
            inst = simulate.make_real_odometry_pgo_instance(
                z["odom"], z["gt"], seed=0)
            extra["pgo_instance"] = "real_odometry(job_0)"
        elif pgo_nodes is None and os.path.exists(FIXTURE_GT):
            gt_traj = np.load(FIXTURE_GT)["gt"]
            inst = simulate.make_trajectory_pgo_instance(gt_traj, seed=0)
            extra["pgo_instance"] = "synthetic_drift(gt_route)"
        elif pgo_nodes is None:
            raise FileNotFoundError(
                f"neither PGO fixture exists: {FIXTURE_REAL_ODOM} "
                f"nor {FIXTURE_GT}")
        else:
            # --small: down-sampled synthetic circuit
            inst = simulate.make_pgo_instance(pgo_nodes, seed=0)
        n = len(inst.poses)
        # pad the node axis to a multiple of 32 so the schur solver's
        # partitioned tridiagonal factorization gets its segment size
        ncap = ((n + 31) // 32) * 32
        poses = np.zeros((ncap, 3), np.float32)
        poses[:n] = inst.poses
        gt_pad = np.zeros((ncap, 3), np.float32)
        gt_pad[:n] = inst.gt
        nmask = np.zeros((ncap,), bool)
        nmask[:n] = True
        sqrt_info = np.asarray(posegraph.default_sqrt_info(
            jnp.asarray(inst.etype), pgo_cfg))
        edges = posegraph.make_edges(inst.idx, inst.meas, sqrt_info,
                                     inst.etype, inst.mask)
        jposes = jnp.asarray(poses)
        jnmask = jnp.asarray(nmask)
        solver = args.pgo_solver
        loop_cap = inst.loop_cap if solver == "schur" else None

        def solve_chained(eps):
            res = posegraph.optimize(jposes + eps, jnmask, edges, pgo_cfg,
                                     solver=solver, loop_cap=loop_cap)
            return jnp.sum(res.poses) * 1e-30

        pgo_res = posegraph.optimize(jposes, jnmask, edges, pgo_cfg,
                                     solver=solver, loop_cap=loop_cap)
        est_n = np.asarray(pgo_res.poses)[:n]
        # Umeyama-aligned ATE (kitti_odometry.py:477-506 semantics) so the
        # numbers are directly comparable to the published result.txt rows.
        from tbv_slam_public_tpu.eval import trajectory as tj
        ate0 = tj.ate_rmse(inst.poses, inst.gt)
        ate1 = tj.ate_rmse(est_n, inst.gt)
        extra[f"pgo_{n}node_ate_before_m"] = round(ate0, 2)
        extra[f"pgo_{n}node_ate_after_m"] = round(ate1, 2)
        extra["pgo_iterations"] = int(pgo_res.iterations)
        extra["pgo_solver"] = solver
        extra["pgo_n_loops"] = int(inst.n_loops)
        flush_partial()
        pgo_ms = _checked_median_time(solve_chained, 2, 6) * 1e3
        extra[f"pgo_{n}node_ms"] = round(pgo_ms, 2)
        extra["pgo_vs_baseline"] = round(BASE_PGO_MS / pgo_ms, 2)
        extra["pgo_ms_per_iteration"] = round(
            pgo_ms / max(int(pgo_res.iterations), 1), 2)

    run_stage("pgo", stage_pgo)

    # ---- stage 4: end-to-end SLAM with DETECTED loops ---------------------
    # System-level proof (VERDICT r2 #5, hardened per r3 #5): a long
    # simulated revisiting sequence through the FULL pipeline — chunked
    # odometry -> drift injection calibrated to the reference's 1.28 %
    # translation error (the sim world is too feature-rich to drift on its
    # own) -> ScanContext retrieval -> registration+verification -> PGO —
    # with no oracle edges anywhere.  Reports ATE before/after, detected
    # loop precision/recall vs GT labels, and the itemized loop-phase
    # wall-clock per keyframe (vs the reference's 65.3 ms,
    # job_0/time_statistics.txt:22-24).
    def stage_e2e():
        from tbv_slam_public_tpu.core.config import (LoopClosureConfig,
                                                     OdometryConfig,
                                                     ScanContextConfig)
        from tbv_slam_public_tpu.core.timing import timing
        from tbv_slam_public_tpu.eval import loops as loops_eval
        from tbv_slam_public_tpu.eval import trajectory as tj
        from tbv_slam_public_tpu.models.slam import TBVSLAM

        n_frames = 80 if args.small else 520
        e2e_cfg = TBVConfig(
            radar=RadarConfig(num_azimuths=160, num_range_bins=320,
                              range_res=0.35, k_strongest=10,
                              min_distance=1.5, max_distance=100.0),
            features=FeatureConfig(resolution=3.0, cell_capacity=256,
                                   grid_extent=100.0),
            registration=RegistrationConfig(cost="P2L", weight_option=4),
            odometry=OdometryConfig(submap_scan_size=3, compensate=False),
            scancontext=ScanContextConfig(max_radius=80.0, n_candidates=3,
                                          num_candidates_from_tree=8,
                                          db_chunk=256),
            verification=VerificationConfig(model_threshold=0.5,
                                            peaks_capacity=1024),
            loopclosure=LoopClosureConfig(n_aggregate=1,
                                          local_map_capacity=2048),
            # PGO weights tuned for THIS graph scale (the reference exposes
            # loop_scaling/cov scaling live via dynamic_reconfigure, C36/
            # OptimizationParams.cfg, for exactly this): the published
            # loop_scaling=5e5 assumes ~4500-node chains where the odometry
            # chain between loop endpoints is soft; on a few-hundred-node
            # instance it leaves loops 3 orders weaker than the chain.
            # Cauchy stays on (outlier robustness).
            pgo=PGOConfig(loop_scaling=1.0, cauchy_scale=10.0),
        )
        seq = simulate.make_sequence(
            num_frames=n_frames, seed=7,
            num_azimuths=e2e_cfg.radar.num_azimuths,
            num_range_bins=e2e_cfg.radar.num_range_bins,
            range_res=e2e_cfg.radar.range_res,
            # circuit sized so the frame budget covers > 2 laps (revisits)
            traj_kwargs=dict(radius=8.0 if args.small else 20.0,
                             step=0.8, laps=3.0))
        slam = TBVSLAM(e2e_cfg)
        g0 = seq.gt_poses[0]
        gt_rels = [np.asarray(simulate._se2_rel(g0, seq.gt_poses[i]))
                   for i in range(seq.images.shape[0])]
        t0 = time.perf_counter()
        slam.process_frames_chunked(
            seq.images, stamps=[i * 0.25 for i in range(n_frames)],
            gt_poses=gt_rels, chunk=32, search_loops=False)
        odom_s = time.perf_counter() - t0
        n_kf = slam.graph.num_nodes
        gt = slam.graph.gt_array()

        # WARM odometry replay (programs now loaded): the steady-state
        # frames/s a long-lived process sustains — the number to hold
        # against odometry_step_ms (VERDICT r3 #4); the cold pass above
        # additionally pays the one-off executable loads.
        slam_w = TBVSLAM(e2e_cfg)
        t0w = time.perf_counter()
        slam_w.process_frames_chunked(
            seq.images, stamps=[i * 0.25 for i in range(n_frames)],
            gt_poses=gt_rels, chunk=32, search_loops=False)
        extra["e2e_odometry_frames_per_s_warm"] = round(
            n_frames / (time.perf_counter() - t0w), 1)
        del slam_w

        # Drift injection (r3 #5): replace the near-perfect sim odometry
        # with a 1.28 %-calibrated drifting version (real scan payloads and
        # everything downstream unchanged), so the before-ATE is meters and
        # loop closure has real work to do.
        od_idx = np.asarray([e["idx"] for e in slam.graph.edges
                             if e["etype"] == 0], np.int32).reshape(-1, 2)
        od_meas = np.stack([e["meas"] for e in slam.graph.edges
                            if e["etype"] == 0])
        # ATE target = the reference's drift RATE (1.28 %/m, SURVEY §6.1)
        # times the route length — an absolute target on a short route would
        # be a drift rate far beyond what the retrieval's odometry coupling
        # is designed for (5 m slack, RadarScancontext.cpp:195).
        traveled = slam.graph.traveled_distance()
        target_ate = max(3.2, 0.0128 * traveled) if not args.small \
            else 2 * 0.0128 * traveled
        drift_poses, drift_meas = simulate.inject_odometry_drift(
            slam.graph.poses_array(), od_idx, od_meas, gt,
            target_ate_m=target_ate, seed=3)
        k = 0
        for e in slam.graph.edges:
            if e["etype"] == 0:
                e["meas"] = drift_meas[k]
                k += 1
        for i in range(n_kf):
            slam.graph.poses[i] = drift_poses[i]
            slam.loops.kf_odom[i] = drift_poses[i]
        extra["e2e_ate_before_m"] = round(tj.ate_rmse(drift_poses, gt), 3)

        # In-run self-supervised alignment training (VERDICT r4 next #7 —
        # and the actual fix for next #3: per-query diagnosis showed
        # retrieval missed ZERO queries; the loss was entirely the published
        # alignment coefficients mis-scoring the sim world's feature
        # statistics, median align_q -7 on correctly-registered true loops).
        # The reference trains this model in-run on its own odometry for the
        # same reason (tbv_slam_online.cpp:185-188).  Batched here: 13
        # perturbations x (CorAl + CFEAR) features for chunks of keyframe
        # pairs as single device programs, one IRLS fit.
        from tbv_slam_public_tpu.models import verification as verif_m
        from tbv_slam_public_tpu.ops import logistic as logistic_m

        tt = time.perf_counter()
        perts = jnp.asarray(verif_m.make_perturbations(e2e_cfg.verification))
        st_cells, st_peaks, st_odom = slam.loops._device_store()
        gather = lambda tree, i: jax.tree.map(lambda x: x[i], tree)
        pair_ids = list(range(1, n_kf))
        chunk_p = 64
        xs, ys = [], []
        for lo in range(0, len(pair_ids), chunk_p):
            sel = pair_ids[lo: lo + chunk_p]
            n_real = len(sel)
            sel = sel + [sel[-1]] * (chunk_p - n_real)
            cur = jnp.asarray(sel)
            prev = cur - 1
            x, y = verif_m.batched_training_features(
                gather(st_peaks, cur), gather(st_cells, cur), st_odom[cur],
                gather(st_peaks, prev), gather(st_cells, prev),
                st_odom[prev], perts, e2e_cfg.verification)
            k13 = perts.shape[0]
            xs.append(np.asarray(x)[: n_real * k13])
            ys.append(np.asarray(y)[: n_real * k13])
        xs_a, ys_a = np.concatenate(xs), np.concatenate(ys)
        cut = int(0.8 * len(ys_a))
        m80 = logistic_m.fit(jnp.asarray(xs_a[:cut]), jnp.asarray(ys_a[:cut]),
                             balanced=True)
        pred = np.asarray(logistic_m.predict_proba(
            m80, jnp.asarray(xs_a[cut:]))) > 0.5
        extra["e2e_alignment_train_acc"] = round(
            float((pred == ys_a[cut:].astype(bool)).mean()), 3)
        extra["e2e_alignment_train_samples"] = int(len(ys_a))
        slam.loops.align_model = logistic_m.fit(
            jnp.asarray(xs_a), jnp.asarray(ys_a), balanced=True)
        np.asarray(slam.loops.align_model.coef)  # force on the lazy backend
        extra["e2e_alignment_train_s"] = round(time.perf_counter() - tt, 2)
        # (the payload store staged during training stays resident; the
        # drifted odometry poses refresh automatically — _device_store
        # re-uploads the [N,3] odom vector, ~2 KB, on every call)

        # Pre-warm every loop-phase device program on shape-identical zero
        # data (compiles + persistent-cache executable loads are one-off
        # process costs, not per-run work; the reference's 65.3 ms/keyframe
        # is likewise a steady-state mean over 11,061 calls that excludes
        # its process startup).  Disclosed as its own number.
        tw = time.perf_counter()
        slam.loops.warmup(detect_chunk=256, pair_chunk=256)
        extra["e2e_loop_warmup_s"] = round(time.perf_counter() - tw, 2)

        for name in ("loop_wave_store", "loop_wave_context",
                     "loop_wave_detect", "loop_wave_pairs"):
            timing._samples.pop(name, None)
        t1 = time.perf_counter()
        # pair_chunk 256: wave throughput is flat 64->256 (PARITY roofline)
        # while each wave costs ~3 tunnel round trips -- fewer, larger waves
        for c in slam.loops.process_all_batched(pair_chunk=256):
            slam.graph.add_loop_constraint(c)
        loops_s = time.perf_counter() - t1

        # WARM replay: re-run the identical loop phase on a fresh closer —
        # all device programs are now in-process — for the steady-state
        # per-keyframe cost.  This is the number comparable to the
        # reference's 65.3 ms/keyframe (a mean over 11,061 calls in a
        # long-lived process); the cold number above additionally pays the
        # one-off executable loads of this 174-keyframe instance.
        from tbv_slam_public_tpu.models.loopclosure import LoopCloser
        closer2 = LoopCloser(e2e_cfg)
        closer2.align_model = slam.loops.align_model  # in-run-trained
        closer2.kf_peaks = list(slam.loops.kf_peaks)
        closer2.kf_cells = list(slam.loops.kf_cells)
        closer2.kf_odom = [np.asarray(p) for p in drift_poses[:n_kf]]
        t1w = time.perf_counter()
        warm_out = closer2.process_all_batched(pair_chunk=256)
        loops_warm_s = time.perf_counter() - t1w
        extra["e2e_loop_ms_per_keyframe_warm"] = round(
            loops_warm_s * 1e3 / n_kf, 1)
        extra["e2e_loops_warm_replay"] = len(warm_out)
        t2 = time.perf_counter()
        summary = slam.finish(optimize=True, solver="auto")
        finish_s = time.perf_counter() - t2

        # detected-loop precision/recall vs GT labels (EvaluationManager
        # semantics, eval/loops.py)
        labeled = loops_eval.label_candidate_log(slam.loops.candidate_log, gt)
        accepted = [r for r in labeled
                    if r["prob"] > e2e_cfg.verification.model_threshold]
        tp = sum(1 for r in accepted if r["is_loop"] and r["reg_ok"])
        n_pos = sum(1 for r in labeled if r["is_loop"])
        extra["e2e_loop_precision"] = round(tp / max(len(accepted), 1), 3)
        extra["e2e_loop_candidate_recall"] = round(
            len({(r["id_from"]) for r in accepted if r["is_loop"]})
            / max(len({r["id_from"] for r in labeled if r["is_loop"]}), 1), 3)
        extra["e2e_candidates_evaluated"] = len(labeled)
        extra["e2e_candidates_positive"] = int(n_pos)
        # Comparison: the SAME candidates re-scored with the PUBLISHED
        # alignment coefficients (host-side from the logged x6 — no
        # re-registration), quantifying what in-run training bought.
        ac = np.asarray(e2e_cfg.verification.alignment_coefs)
        lcf = np.asarray(e2e_cfg.verification.loop_coefs)
        x6m = np.asarray([r["x6"] for r in labeled])
        aq_pub = x6m @ ac[1:] + ac[0]
        zc = (lcf[0]
              + lcf[1] * np.asarray([r["odom_bounds"] for r in labeled])
              + lcf[2] * np.asarray([r["sc_sim"] for r in labeled])
              + lcf[3] * aq_pub)
        prob_pub = 1.0 / (1.0 + np.exp(-zc))
        thr = e2e_cfg.verification.model_threshold
        acc_pub = [r for r, p in zip(labeled, prob_pub) if p > thr]
        tp_pub = sum(1 for r in acc_pub if r["is_loop"] and r["reg_ok"])
        extra["e2e_loop_precision_published_coefs"] = round(
            tp_pub / max(len(acc_pub), 1), 3)
        extra["e2e_loop_recall_published_coefs"] = round(
            len({r["id_from"] for r in acc_pub if r["is_loop"]})
            / max(len({r["id_from"] for r in labeled if r["is_loop"]}), 1), 3)

        extra["e2e_frames"] = int(n_frames)
        extra["e2e_keyframes"] = int(summary.num_keyframes)
        extra["e2e_detected_loops"] = int(summary.num_loops)
        extra["e2e_ate_after_m"] = round(summary.metrics["ate_rmse"], 3)
        extra["e2e_odometry_frames_per_s"] = round(n_frames / odom_s, 1)
        extra["e2e_loop_wave_s"] = round(loops_s, 2)
        extra["e2e_loop_ms_per_keyframe"] = round(loops_s * 1e3 / n_kf, 1)
        for name in ("loop_wave_store", "loop_wave_context",
                     "loop_wave_detect", "loop_wave_pairs"):
            mean, _, cnt = timing.get(name)
            extra[f"e2e_{name}_ms"] = round(mean * cnt, 1)  # total ms
        extra["e2e_finish_s"] = round(finish_s, 2)

    run_stage("e2e_slam", stage_e2e)

    # ---- stage 4b: warm odometry at FULL Oxford radar scale ---------------
    # VERDICT r4 next #4: the e2e stage runs at reduced sim shapes; this
    # stage measures the warm steady-state frames/s of the full pipeline
    # (host scheduling + chunked scan + keyframe bookkeeping) at the shapes
    # the reference actually processes — 400 azimuths x 3768 range bins at
    # 4 Hz (radar_driver.h:41-43) — so the number is directly reconcilable
    # with odometry_step_ms.
    def stage_fullscale():
        from tbv_slam_public_tpu.core.config import OdometryConfig
        from tbv_slam_public_tpu.models.slam import TBVSLAM
        import dataclasses

        n_ff = 48
        ff_cfg = dataclasses.replace(
            cfg, odometry=OdometryConfig(submap_scan_size=3,
                                         compensate=False))
        seqf = simulate.make_sequence(
            num_frames=n_ff, seed=11,
            num_azimuths=cfg.radar.num_azimuths,
            num_range_bins=cfg.radar.num_range_bins,
            range_res=cfg.radar.range_res,
            traj_kwargs=dict(radius=30.0, step=0.8, laps=0.4))
        stamps = [i * 0.25 for i in range(n_ff)]
        # cold pass: compiles + executable loads
        slam_c = TBVSLAM(ff_cfg)
        t0 = time.perf_counter()
        slam_c.process_frames_chunked(seqf.images, stamps=stamps, chunk=16,
                                      search_loops=False)
        cold_s = time.perf_counter() - t0
        del slam_c
        # warm passes: median of three (a single 48-frame pass swung 2x
        # between otherwise-identical runs on the drifting tunnel)
        from statistics import median
        warm_times = []
        for _ in range(3):
            slam_w = TBVSLAM(ff_cfg)
            t0 = time.perf_counter()
            slam_w.process_frames_chunked(seqf.images, stamps=stamps,
                                          chunk=16, search_loops=False)
            warm_times.append(time.perf_counter() - t0)
        warm_s = median(warm_times)
        fps = n_ff / warm_s
        extra["e2e_odometry_frames_per_s_warm_fullscale"] = round(fps, 1)
        extra["e2e_fullscale_warm_passes_s"] = [round(t, 2)
                                               for t in warm_times]
        extra["e2e_fullscale_frames"] = n_ff
        extra["e2e_fullscale_cold_s"] = round(cold_s, 2)
        extra["e2e_fullscale_keyframes"] = int(slam_w.graph.num_nodes)
        if extra.get("odometry_step_ms"):
            # consistency vs the stage-1 step latency (within 2x = "Done")
            extra["e2e_fullscale_vs_step_ratio"] = round(
                (1e3 / fps) / extra["odometry_step_ms"], 2)

    if not args.small:
        run_stage("fullscale_odometry", stage_fullscale)

    # ---- stage 5: multi-device scaling efficiency -------------------------
    # Weak-scaling efficiency of the sharded candidate wave on a pinned CPU
    # mesh (BASELINE: >= 0.8 at N >= 2; see scripts/scaling_bench.py for the
    # pinning methodology).  Subprocess so this process keeps its backend.
    def stage_scaling():
        import subprocess

        script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "scaling_bench.py")
        out = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            timeout=2400, check=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"}).stdout
        rec = json.loads(out.strip().splitlines()[-1])
        extra["scaling_devices"] = rec["devices"]
        extra["scaling_pinned_cores"] = rec["pinned"]
        extra["scaling_cands_per_s_1dev"] = rec["cands_per_s_1dev"]
        extra[f"scaling_cands_per_s_{rec['devices']}dev"] = \
            rec[f"cands_per_s_{rec['devices']}dev"]
        extra["scaling_efficiency"] = rec["scaling_efficiency"]
        for k, v in rec.items():
            if k.startswith("pgo_"):
                extra[f"scaling_{k}"] = v

    if not args.small:
        run_stage("scaling", stage_scaling)

    if headline is None:
        # candidate stage failed — fall back to any stage that produced a
        # number so the round still records a metric
        if "odometry_step_ms" in extra:
            headline = ("odometry_step_ms", extra["odometry_step_ms"], "ms",
                        extra["odometry_vs_realtime"])
        else:
            headline = ("bench_failed", 0.0, "n/a", 0.0)

    metric, value, unit, vs = headline
    result = {"metric": metric, "value": value, "unit": unit,
              "vs_baseline": vs, "extra": extra}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
