#!/usr/bin/env python
"""TPU smoke tests at graduated sizes (VERDICT r1 #10).

Exercises, on the real chip, the three stage-level programs whose TPU
regressions would otherwise surface only at bench time:

1. the Pallas CorAl-moments kernel (compiled, not interpret mode),
2. one batched loop-candidate register+verify wave,
3. one schur pose-graph solve at graduated node counts.

Prints one `[smoke] <name>: ok (<ms>)` line per stage and exits non-zero on
the first failure.  Keep each size modest — the point is stage isolation,
not throughput.

Usage: python scripts/tpu_smoke.py [--sizes 512,2048,4480]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — report and fail the run
        print(f"[smoke] {name}: FAIL ({type(e).__name__}: {e})", flush=True)
        raise SystemExit(1)
    print(f"[smoke] {name}: ok ({(time.perf_counter()-t0):.1f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,2048,4480",
                    help="PGO node counts")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"[smoke] backend={jax.devices()[0].platform}", flush=True)

    # ---- 1. Pallas CorAl moments kernel (compiled path) -------------------
    def pallas_kernel():
        from tbv_slam_public_tpu.ops import coral
        from tbv_slam_public_tpu.pallas import coral_moments

        rng = np.random.default_rng(0)
        p = 1024
        xy = jnp.asarray(rng.normal(0, 20, (p, 2)), jnp.float32)
        mask = jnp.asarray(rng.random(p) > 0.1)
        radius = jnp.asarray(1.0, jnp.float32)
        a = jax.jit(coral_moments.neighbor_moments)(xy, mask, xy, mask,
                                                    radius)
        b = jax.jit(coral._neighbor_moments)(xy, mask, xy, mask, radius)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-3, atol=2e-3)

    _stage("pallas_coral_moments", pallas_kernel)

    # ---- 2. one candidate register+verify wave ----------------------------
    def candidate_wave():
        from tbv_slam_public_tpu.core.config import (FeatureConfig,
                                                     RadarConfig,
                                                     RegistrationConfig,
                                                     TBVConfig,
                                                     VerificationConfig)
        from tbv_slam_public_tpu.io import simulate
        from tbv_slam_public_tpu.models import loopclosure as lc
        from tbv_slam_public_tpu.ops import features, logistic, radar

        cfg = TBVConfig(
            radar=RadarConfig(num_azimuths=100, num_range_bins=256,
                              range_res=0.4, k_strongest=8, min_distance=1.0,
                              max_distance=90.0),
            features=FeatureConfig(cell_capacity=256, grid_extent=100.0),
            registration=RegistrationConfig(cost="P2L", weight_option=4),
            verification=VerificationConfig(peaks_capacity=512),
        )
        rng = np.random.default_rng(0)
        world = simulate.make_world(rng, num_walls=40, extent=60.0)
        batch = 8

        def scan_at(pose):
            img = simulate.render_scan(
                world, np.asarray(pose), num_azimuths=cfg.radar.num_azimuths,
                num_range_bins=cfg.radar.num_range_bins,
                range_res=cfg.radar.range_res, rng=rng)
            cloud, peaks = radar.kstrongest_filter(jnp.asarray(img),
                                                   cfg.radar)
            cells = features.compute_cells(cloud, cfg.features)
            cap = cfg.verification.peaks_capacity
            return jax.tree.map(lambda x: x[:cap], peaks), cells

        q_peaks, q_cells = scan_at([0.0, 0.0, 0.0])
        cands = [scan_at([2.0 * (i % 3), 1.5 * (i % 2), 0.1 * i])
                 for i in range(batch)]
        c_peaks = jax.tree.map(lambda *x: jnp.stack(x), *[c[0] for c in cands])
        c_cells = jax.tree.map(lambda *x: jnp.stack(x), *[c[1] for c in cands])
        am = logistic.from_values(cfg.verification.alignment_coefs[0],
                                  cfg.verification.alignment_coefs[1:])
        lm = logistic.from_values(cfg.verification.loop_coefs[0],
                                  cfg.verification.loop_coefs[1:])
        zeros = jnp.zeros((batch,))
        out = lc.register_and_verify(
            q_cells, q_peaks, c_cells, c_peaks, jnp.zeros((batch, 3)), zeros,
            0.2 + zeros, 0.1 + zeros, jnp.ones((batch,), bool), am, lm, cfg)
        jax.block_until_ready(out.prob)
        assert np.all(np.isfinite(np.asarray(out.prob)))

    _stage("candidate_wave", candidate_wave)

    # ---- 3. schur PGO at graduated sizes -----------------------------------
    from tbv_slam_public_tpu.core.config import PGOConfig
    from tbv_slam_public_tpu.io import simulate
    from tbv_slam_public_tpu.ops import posegraph

    for n in [int(s) for s in args.sizes.split(",")]:
        def pgo(n=n):
            inst = simulate.make_pgo_instance(n, seed=0)
            cfg = PGOConfig()
            si = np.asarray(posegraph.default_sqrt_info(
                jnp.asarray(inst.etype), cfg))
            edges = posegraph.make_edges(inst.idx, inst.meas, si,
                                         inst.etype, inst.mask)
            res = posegraph.optimize(
                jnp.asarray(inst.poses), jnp.ones((len(inst.poses),), bool),
                edges, cfg, solver="schur", loop_cap=inst.loop_cap)
            res.poses.block_until_ready()
            assert float(res.cost) < float(res.cost0)

        _stage(f"schur_pgo_{n}", pgo)

    print("[smoke] ALL OK", flush=True)


if __name__ == "__main__":
    main()
