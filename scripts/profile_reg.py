#!/usr/bin/env python
"""Decompose register_window cost by (outer, inner) iteration counts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tbv_slam_public_tpu.core.config import (FeatureConfig, RadarConfig,
                                             RegistrationConfig, TBVConfig,
                                             VerificationConfig)
from tbv_slam_public_tpu.io import simulate
from tbv_slam_public_tpu.models import loopclosure as lc
from tbv_slam_public_tpu.ops import features, radar
from tbv_slam_public_tpu.ops import registration as reg_op

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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
    cloud, _ = radar.kstrongest_filter(jnp.asarray(img), cfg.radar)
    return features.compute_cells(cloud, cfg.features)


q_cells = scan_at([0.0, 0.0, 0.0])
cands = [scan_at([2.0 * (i % 5), 1.5 * (i % 3), 0.1 * i]) for i in range(8)]
reps = (B + 7) // 8
c_cells = jax.tree.map(lambda *x: jnp.concatenate([jnp.stack(x)] * reps)[:B],
                       *cands)
base = lc._loop_registration_cfg(cfg)


def slope(fn, lo=3, hi=9, reps_t=2):
    e = fn(jnp.float32(0)); np.asarray(e)
    def tot(k):
        best = np.inf
        for _ in range(reps_t):
            x = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(k):
                x = fn(x)
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        return best
    return (tot(hi) - tot(lo)) / (hi - lo)


import dataclasses
for outer, inner in ((4, 10), (1, 10), (4, 1), (1, 1), (2, 5)):
    rcfg = dataclasses.replace(base, max_outer_iterations=outer,
                               min_outer_iterations=1,
                               max_inner_iterations=inner)

    @jax.jit
    def reg(eps, rcfg=rcfg):
        def one(cc, guess):
            tgt = jax.tree.map(lambda x: x[None], cc)
            res = reg_op.register_window(
                q_cells, jnp.zeros(3, jnp.float32), tgt, guess[None],
                jnp.ones(1, bool), rcfg)
            return res.pose, res.score
        p, s = jax.vmap(one)(c_cells, jnp.zeros((B, 3)) + eps)
        return (jnp.sum(p) + jnp.sum(s)) * 1e-30

    t = slope(reg)
    print(f"outer={outer} inner={inner}: {t*1e3:7.2f} ms", flush=True)
