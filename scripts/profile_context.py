#!/usr/bin/env python
"""Where does the loop-phase context bucket's time go? (r5: 1.35 s for a
256-query chunk whose binning math is ~10 ms of FLOPs.)  Slope-times the
full build_contexts_batched chunk against variants with the suspect pieces
removed (the k=2048 top_k; the descriptor contractions)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from tbv_slam_public_tpu.core import se2
from tbv_slam_public_tpu.core.config import (FeatureConfig, LoopClosureConfig,
                                             OdometryConfig, RadarConfig,
                                             RegistrationConfig,
                                             ScanContextConfig, TBVConfig,
                                             VerificationConfig)
from tbv_slam_public_tpu.core.types import PointCloud
from tbv_slam_public_tpu.models import loopclosure as lc

cfg = TBVConfig(
    radar=RadarConfig(num_azimuths=160, num_range_bins=320, range_res=0.35,
                      k_strongest=10, min_distance=1.5, max_distance=100.0),
    features=FeatureConfig(resolution=3.0, cell_capacity=256,
                           grid_extent=100.0),
    registration=RegistrationConfig(cost="P2L", weight_option=4),
    odometry=OdometryConfig(submap_scan_size=3, compensate=False),
    scancontext=ScanContextConfig(max_radius=80.0, n_candidates=3,
                                  num_candidates_from_tree=8, db_chunk=256),
    verification=VerificationConfig(model_threshold=0.5, peaks_capacity=1024),
    loopclosure=LoopClosureConfig(n_aggregate=1, local_map_capacity=2048),
)
N = 256
rng = np.random.default_rng(0)
store_peaks = PointCloud(
    xy=jnp.asarray(rng.uniform(-60, 60, (N, 1024, 2)), jnp.float32),
    intensity=jnp.asarray(rng.uniform(60, 200, (N, 1024)), jnp.float32),
    mask=jnp.asarray(rng.uniform(size=(N, 1024)) > 0.5))
store_odom = jnp.asarray(
    np.cumsum(rng.uniform(0.5, 2.0, (N, 3)), 0).astype(np.float32))
q = jnp.arange(N, dtype=jnp.int32)
n_total = jnp.asarray(N, jnp.int32)


def slope(fn, lo=2, hi=6, reps=3):
    e = fn(jnp.float32(0)); np.asarray(e)
    def total(k):
        best = float("inf")
        for _ in range(reps):
            ee = jnp.float32(0); t0 = time.perf_counter()
            for _ in range(k):
                ee = fn(ee)
            np.asarray(ee); best = min(best, time.perf_counter() - t0)
        return best
    return (total(hi) - total(lo)) / (hi - lo)


def f_full(eps):
    d, r = lc.build_contexts_batched(
        store_peaks.replace(xy=store_peaks.xy + eps), store_odom, q,
        n_total, cfg)
    return (jnp.sum(d) + jnp.sum(r)) * 1e-20


# variant: aggregation WITHOUT the k=2048 top_k (bin the whole window)
import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def contexts_no_topk(store_peaks, store_odom, q_idx, n_total, cfg):
    n_agg = cfg.loopclosure.n_aggregate

    def one(qq):
        idxs = qq + jnp.arange(-n_agg, n_agg + 1)
        kf_ok = (idxs >= 0) & (idxs < n_total)
        idxs = jnp.clip(idxs, 0, n_total - 1)
        center = store_odom[qq]

        def gather_kf(i, ok):
            xy = store_peaks.xy[i]
            rel = se2.relative(center, store_odom[i])
            return (se2.apply(rel, xy), store_peaks.intensity[i],
                    store_peaks.mask[i] & ok)

        xys, ints, ms = jax.vmap(gather_kf)(idxs, kf_ok)
        local = PointCloud(xy=xys.reshape(-1, 2),
                          intensity=ints.reshape(-1), mask=ms.reshape(-1))
        descs, rings, _ = lc.context_descriptors(local, cfg)
        return descs, rings

    return jax.vmap(one)(q_idx)


def f_no_topk(eps):
    d, r = contexts_no_topk(
        store_peaks.replace(xy=store_peaks.xy + eps), store_odom, q,
        n_total, cfg)
    return (jnp.sum(d) + jnp.sum(r)) * 1e-20


# variant: aggregation + top_k only (no descriptors)
@functools.partial(jax.jit, static_argnames=("cfg",))
def agg_only(store_peaks, store_odom, q_idx, n_total, cfg):
    n_agg = cfg.loopclosure.n_aggregate
    cap = min(cfg.loopclosure.local_map_capacity,
              (2 * n_agg + 1) * store_peaks.xy.shape[1])

    def one(qq):
        idxs = qq + jnp.arange(-n_agg, n_agg + 1)
        kf_ok = (idxs >= 0) & (idxs < n_total)
        idxs = jnp.clip(idxs, 0, n_total - 1)
        center = store_odom[qq]

        def gather_kf(i, ok):
            xy = store_peaks.xy[i]
            rel = se2.relative(center, store_odom[i])
            return (se2.apply(rel, xy), store_peaks.intensity[i],
                    store_peaks.mask[i] & ok)

        xys, ints, ms = jax.vmap(gather_kf)(idxs, kf_ok)
        score = jnp.where(ms.reshape(-1), ints.reshape(-1), -1.0)
        _, top = jax.lax.top_k(score, cap)
        return jnp.sum(xys.reshape(-1, 2)[top]) + jnp.sum(score[top])

    return jax.vmap(one)(q_idx)


def f_agg_topk(eps):
    return jnp.sum(agg_only(
        store_peaks.replace(xy=store_peaks.xy + eps), store_odom, q,
        n_total, cfg)) * 1e-20


from statistics import median
rows = {"full_chunk(topk)": f_full, "no_topk": f_no_topk,
        "agg+topk_only": f_agg_topk}
vals = {k: [] for k in rows}
for _ in range(3):
    for k, fn in rows.items():
        vals[k].append(slope(fn))
for k in rows:
    print(f"{k:18s}: {median(vals[k])*1e3:8.2f} ms/chunk  "
          f"({[round(v*1e3,1) for v in vals[k]]})")
