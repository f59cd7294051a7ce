"""CorAl: entropy-based alignment quality for radar point clouds.

TPU-native re-design of CorAlRadarQuality (reference
AlignmentQuality.cpp:93-229): the per-point kd radius searches become masked
distance-matrix moments, computed in query-centered coordinates so f32 is
safe (neighborhood diameters are ~2 m while world coordinates reach hundreds
of meters).

Semantics reproduced:
- per point of each cloud: neighbors within ``radius`` in its OWN cloud and in
  the JOINT (src+ref) cloud; sample covariances with 1/(n-1) normalization
  (Covariance, AlignmentQuality.cpp:28-48; rejects n <= 2),
- validity requires >= 1 neighbor in the OTHER cloud (overlap_req_,
  AlignmentQuality.cpp:135-137) and both covariances computable,
- per-point differential entropies 0.5*log(2*pi*e*det + 1e-8)
  (ComputeEntropy, AlignmentQuality.cpp:75-92),
- outputs mean joint entropy, mean separate entropy and overlap fraction
  (quality vector, AlignmentQuality.cpp:187-202).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import PointCloud


class CoralResult(NamedTuple):
    joint: jnp.ndarray  # [] mean joint entropy
    sep: jnp.ndarray  # [] mean separate entropy
    overlap: jnp.ndarray  # [] valid fraction of the merged cloud
    valid: jnp.ndarray  # [] bool — overlap >= 0.1


def _neighbor_moments(queries, qmask, points, pmask, radius):
    """Masked radius-neighborhood count/mean/second-moment for each query.

    Returns (count [Q], sum_rel [Q,2], sum_sq [Q,2,2]) where moments are of
    (p - q) in query-centered coordinates.
    """
    rel = points[None, :, :] - queries[:, None, :]  # [Q, P, 2]
    # d2 from the (already materialized) relative coordinates: exact in f32
    # regardless of |coordinate| — the matmul |q|^2+|p|^2-2qp form loses the
    # radius gate to MXU bf16 cancellation at range.
    d2 = jnp.sum(rel * rel, axis=-1)
    m = (d2 <= radius * radius) & pmask[None, :] & qmask[:, None]
    fm = m.astype(queries.dtype)
    count = jnp.sum(fm, axis=1)
    rel = rel * fm[:, :, None]
    sum_rel = jnp.sum(rel, axis=1)
    sum_sq = jnp.einsum("qpi,qpj->qij", rel, rel)
    return count, sum_rel, sum_sq


def _entropy_from_moments(n, s1, s2, eps):
    """Sample covariance (1/(n-1)) entropy from query-centered moments."""
    mean = s1 / jnp.maximum(n, 1.0)[:, None]
    # sum of centered outer products = s2 - n * mean mean^T
    centered = s2 - n[:, None, None] * mean[:, :, None] * mean[:, None, :]
    cov = centered / jnp.maximum(n - 1.0, 1.0)[:, None, None]
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
    ent = 0.5 * jnp.log(2.0 * math.pi * math.e * det + eps)
    return ent, det


def _moments_dispatch(q_xy, q_mask, p_xy, p_mask, radius):
    """Pick the Pallas kernel on TPU (tiled VMEM interaction, no [Q,P,2]
    materialization) and the jnp fallback elsewhere."""
    if jax.default_backend() == "tpu":
        from ..pallas import coral_moments

        return coral_moments.neighbor_moments(q_xy, q_mask, p_xy, p_mask,
                                              radius)
    return _neighbor_moments(q_xy, q_mask, p_xy, p_mask, radius)


@partial(jax.jit, static_argnames=())
def _coral_impl(src_xy, src_mask, ref_xy, ref_mask, radius, eps):
    # src-perspective: own = src, other = ref; then the mirror.
    def side(q_xy, q_mask, own_xy, own_mask, oth_xy, oth_mask):
        n_own, s1_own, s2_own = _moments_dispatch(q_xy, q_mask, own_xy, own_mask, radius)
        n_oth, s1_oth, s2_oth = _moments_dispatch(q_xy, q_mask, oth_xy, oth_mask, radius)
        n_joint = n_own + n_oth
        s1_joint = s1_own + s1_oth
        s2_joint = s2_own + s2_oth
        ent_sep, _ = _entropy_from_moments(n_own, s1_own, s2_own, eps)
        ent_joint, _ = _entropy_from_moments(n_joint, s1_joint, s2_joint, eps)
        ok = (
            q_mask
            & (n_oth >= 1)  # overlap requirement
            & (n_own > 2)  # Covariance() rejects <= 2 rows
            & (n_joint > 2)
            & jnp.isfinite(ent_sep) & jnp.isfinite(ent_joint)
        )
        return ent_sep, ent_joint, ok

    es_s, ej_s, ok_s = side(src_xy, src_mask, src_xy, src_mask, ref_xy, ref_mask)
    es_r, ej_r, ok_r = side(ref_xy, ref_mask, ref_xy, ref_mask, src_xy, src_mask)

    ok = jnp.concatenate([ok_s, ok_r])
    sep = jnp.concatenate([es_s, es_r])
    joint = jnp.concatenate([ej_s, ej_r])
    count_valid = jnp.sum(ok)
    denom = jnp.maximum(count_valid.astype(src_xy.dtype), 1.0)
    sep_mean = jnp.sum(jnp.where(ok, sep, 0.0)) / denom
    joint_mean = jnp.sum(jnp.where(ok, joint, 0.0)) / denom
    merged = jnp.sum(src_mask) + jnp.sum(ref_mask)
    overlap = count_valid / jnp.maximum(merged, 1)
    return CoralResult(joint=joint_mean, sep=sep_mean, overlap=overlap,
                       valid=overlap >= 0.1)


def coral_quality(src: PointCloud, ref: PointCloud, radius: float = 1.0,
                  eps: float = 1e-8) -> CoralResult:
    """CorAl quality of two WORLD-FRAME peak clouds.

    Callers transform the clouds by their poses first (the reference wraps
    scans into PoseScan and calls GetCloudCopy(T), AlignmentQuality.cpp:104).
    """
    return _coral_impl(src.xy, src.mask, ref.xy, ref.mask,
                       jnp.asarray(radius, src.xy.dtype),
                       jnp.asarray(eps, src.xy.dtype))


def compact_cloud(cloud: PointCloud, capacity: int) -> PointCloud:
    """Reduce a padded cloud to ``capacity`` slots, keeping the strongest
    returns (used to bound verification cost for large k-strongest settings)."""
    score = jnp.where(cloud.mask, cloud.intensity, -1.0)
    _, idx = jax.lax.top_k(score, capacity)
    return PointCloud(
        xy=cloud.xy[idx],
        intensity=cloud.intensity[idx],
        mask=cloud.mask[idx] & (score[idx] >= 0),
    )
