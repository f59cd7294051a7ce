#!/usr/bin/env python
"""Itemize the candidate-wave cost on the real TPU: registration vs sampled
covariance vs CorAl vs CFEAR-eval, via the same slope-timing methodology as
bench.py (forced execution through a scalar chain)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tbv_slam_public_tpu.core.config import (FeatureConfig, RadarConfig,
                                             RegistrationConfig, TBVConfig,
                                             VerificationConfig)
from tbv_slam_public_tpu.io import simulate
from tbv_slam_public_tpu.models import loopclosure as lc
from tbv_slam_public_tpu.models import verification as verif
from tbv_slam_public_tpu.core import se2
from tbv_slam_public_tpu.ops import features, logistic, radar
from tbv_slam_public_tpu.ops import registration as reg_op

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def slope_time(fn_chained, n_lo, n_hi, reps=2):
    eps = fn_chained(jnp.float32(0))
    np.asarray(eps)

    def total(k):
        best = np.inf
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
    return (t_hi - t_lo) / (n_hi - n_lo)


def tree_reduce(*trees):
    acc = jnp.float32(0)
    for t in trees:
        for leaf in jax.tree.leaves(t):
            acc = acc + jnp.sum(jnp.asarray(leaf, jnp.float32))
    return acc * 1e-30


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = TBVConfig(
        radar=RadarConfig(),
        features=FeatureConfig(cell_capacity=512),
        registration=RegistrationConfig(cost="P2L", weight_option=4),
        verification=VerificationConfig(peaks_capacity=1024),
    )
    rng = np.random.default_rng(0)
    world = simulate.make_world(rng, num_walls=80, extent=120.0)

    def scan_at(pose):
        img = simulate.render_scan(
            world, np.asarray(pose), num_azimuths=cfg.radar.num_azimuths,
            num_range_bins=cfg.radar.num_range_bins,
            range_res=cfg.radar.range_res, rng=rng)
        cloud, peaks = radar.kstrongest_filter(jnp.asarray(img), cfg.radar)
        cells = features.compute_cells(cloud, cfg.features)
        cap = cfg.verification.peaks_capacity
        peaks_v = jax.tree.map(lambda x: x[:cap], peaks)
        return cloud, peaks_v, cells

    _, q_peaks, q_cells = scan_at([0.0, 0.0, 0.0])
    align_model = logistic.from_values(cfg.verification.alignment_coefs[0],
                                       cfg.verification.alignment_coefs[1:])
    loop_model = logistic.from_values(cfg.verification.loop_coefs[0],
                                      cfg.verification.loop_coefs[1:])
    import sys as _sys
    n_src = min(b, 8)
    cands = [scan_at([2.0 * (i % 5), 1.5 * (i % 3), 0.1 * i])
             for i in range(n_src)]
    print(f"[profile] {n_src} scans rendered; tiling to {b}", file=_sys.stderr, flush=True)
    reps = (b + n_src - 1) // n_src
    c_peaks = jax.tree.map(lambda *x: jnp.concatenate([jnp.stack(x)] * reps)[:b],
                           *[c[1] for c in cands])
    c_cells = jax.tree.map(lambda *x: jnp.concatenate([jnp.stack(x)] * reps)[:b],
                           *[c[2] for c in cands])
    zeros = jnp.zeros((b,))
    loop_rcfg = lc._loop_registration_cfg(cfg)

    # full wave
    def full_wave(eps):
        res = lc.register_and_verify(
            q_cells, q_peaks, c_cells, c_peaks,
            jnp.zeros((b, 3)) + eps, zeros, 0.2 + zeros,
            0.1 + zeros, jnp.ones((b,), bool),
            align_model, loop_model, cfg)
        return tree_reduce(res)

    print("[profile] compiling full_wave...", file=_sys.stderr, flush=True)
    t = slope_time(full_wave, 3, 9)
    print(f"full_wave      b={b}: {t*1e3:8.2f} ms  -> {b/t:9.1f} cands/s", flush=True)

    # registration only
    @jax.jit
    def reg_only(eps):
        def one(cand_cells, guess):
            tgt = jax.tree.map(lambda x: x[None], cand_cells)
            res = reg_op.register_window(
                q_cells, jnp.zeros(3, jnp.float32), tgt, guess[None],
                jnp.ones(1, bool), loop_rcfg)
            return res.pose, res.score
        p, s = jax.vmap(one)(c_cells, jnp.zeros((b, 3)) + eps)
        return tree_reduce(p, s)

    print("[profile] compiling reg_only...", file=_sys.stderr, flush=True)
    t = slope_time(reg_only, 3, 9)
    print(f"register_only  b={b}: {t*1e3:8.2f} ms  -> {b/t:9.1f} cands/s", flush=True)

    # sampled covariance only
    @jax.jit
    def cov_only(eps):
        def one(cand_cells, guess):
            tgt = jax.tree.map(lambda x: x[None], cand_cells)
            cov, ok = reg_op.sampled_covariance(
                q_cells, guess, tgt, guess[None], jnp.ones(1, bool),
                loop_rcfg, jnp.float32(10.0), jnp.int32(200))
            return cov, ok
        c, o = jax.vmap(one)(c_cells, jnp.zeros((b, 3)) + eps)
        return tree_reduce(c, o)

    print("[profile] compiling cov_only...", file=_sys.stderr, flush=True)
    t = slope_time(cov_only, 3, 9)
    print(f"sampled_cov    b={b}: {t*1e3:8.2f} ms  -> {b/t:9.1f} cands/s", flush=True)

    # alignment features (CorAl + CFEAR eval)
    @jax.jit
    def align_only(eps):
        def one(cand_peaks, cand_cells, rel):
            return verif.alignment_features(
                q_peaks, q_cells, jnp.zeros(3, jnp.float32),
                cand_peaks, cand_cells, rel, cfg.verification)
        x = jax.vmap(one)(c_peaks, c_cells, jnp.zeros((b, 3)) + eps)
        return tree_reduce(x)

    print("[profile] compiling align_only...", file=_sys.stderr, flush=True)
    t = slope_time(align_only, 3, 9)
    print(f"align_feats    b={b}: {t*1e3:8.2f} ms  -> {b/t:9.1f} cands/s", flush=True)

    # ---- finer probes (r5): locate the sink inside registration/alignment
    import math as _math
    from tbv_slam_public_tpu.ops.registration import (
        associate, _cost_grad_hess, _lm_solve, cost_code, loss_code)
    from tbv_slam_public_tpu.core import se2
    from tbv_slam_public_tpu.ops import coral

    cost_c = cost_code(loop_rcfg.cost)
    loss_c = loss_code(loop_rcfg.loss)
    gate_cos = _math.cos(_math.radians(loop_rcfg.angle_gate_deg))

    def make_assoc(src, pose, tgt, radius):
        tmw = jax.vmap(se2.apply)(jnp.zeros((1, 3)), tgt.mean[None])
        tnw = jax.vmap(se2.rotate)(jnp.zeros((1, 3)), tgt.normal[None])
        tcw = tgt.cov[None]
        return associate(src, pose, tmw, tnw, tcw, tgt.nsamples[None],
                         tgt.planarity[None], tgt.valid[None], radius,
                         weight_option=loop_rcfg.weight_option, cost=cost_c,
                         regularization=loop_rcfg.regularization,
                         cov_scale=loop_rcfg.cov_scale,
                         angle_gate_cos=gate_cos)

    # one association pass, vmapped over the batch
    @jax.jit
    def assoc_once(eps):
        def one(cc, guess):
            a = make_assoc(q_cells, guess, cc, loop_rcfg.radius)
            return tree_reduce((a.weight, a.mask))
        return jnp.sum(jax.vmap(one)(c_cells, jnp.zeros((b, 3)) + eps))

    t = slope_time(assoc_once, 3, 9)
    print(f"assoc_x1       b={b}: {t*1e3:8.2f} ms", flush=True)

    # LM inner solve alone (10 iterations on a FIXED association)
    @jax.jit
    def lm_only(eps):
        def one(cc, guess):
            a = make_assoc(q_cells, guess, cc, loop_rcfg.radius)
            th, cst, _ = _lm_solve(
                guess, q_cells, a, cost=cost_c, loss=loss_c,
                delta=loop_rcfg.loss_limit,
                max_iter=loop_rcfg.max_inner_iterations,
                init_lambda=loop_rcfg.init_lambda)
            return tree_reduce((th, cst))
        return jnp.sum(jax.vmap(one)(c_cells, jnp.zeros((b, 3)) + eps))

    t_lm_plus = slope_time(lm_only, 3, 9)
    print(f"assoc+lm10     b={b}: {t_lm_plus*1e3:8.2f} ms", flush=True)

    # CorAl moments alone
    @jax.jit
    def coral_only(eps):
        def one(cp):
            src_w = q_peaks
            ref_w = cp.replace(xy=cp.xy + eps)
            r = coral.coral_quality(src_w, ref_w,
                                    radius=cfg.verification.coral_radius,
                                    eps=cfg.verification.coral_entropy_eps,
                                    mode=cfg.verification.coral_mode)
            return tree_reduce((r.joint, r.sep, r.overlap))
        return jnp.sum(jax.vmap(one)(c_peaks))

    t = slope_time(coral_only, 3, 9)
    print(f"coral_only     b={b}: {t*1e3:8.2f} ms", flush=True)

    # CFEAR evaluate_cost alone
    @jax.jit
    def cfear_eval_only(eps):
        rcfg_eval = verif._cfear_eval_cfg(cfg.verification)
        def one(cc, rel):
            tgt = jax.tree.map(lambda x: x[None], cc)
            c, n = reg_op.evaluate_cost(
                q_cells, rel, tgt, jnp.zeros((1, 3)), jnp.ones(1, bool),
                rcfg_eval)
            return tree_reduce((c, n))
        return jnp.sum(jax.vmap(one)(c_cells, jnp.zeros((b, 3)) + eps))

    t = slope_time(cfear_eval_only, 3, 9)
    print(f"cfear_eval     b={b}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
