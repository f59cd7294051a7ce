"""Additional alignment-quality metrics (reference C19).

Batched re-designs of the secondary AlignmentQuality subclasses
(coral_alignment_quality AlignmentQuality.h:119-236):

- ``p2p_quality``: per source point, squared distance to its nearest ref
  neighbor within ``radius``; quality = [mean, ...] of those residuals
  (p2pQuality ctor + GetQualityMeasure),
- ``p2d_quality``: Mahalanobis point-to-distribution score of source points
  against CFEAR cells of the reference (p2dQuality),
- ``cartesian_absdiff_quality``: mean absolute difference of two Cartesian
  occupancy/intensity images rendered from the clouds (CorAlCartQuality),
- ``keypoint_repeatability``: fraction of source points with a ref neighbor
  within ``radius`` (keypointRepetability).

All are masked dense ops over padded clouds — no kd-trees.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.types import Cells, PointCloud


def _nn_sq_dists(src: PointCloud, ref: PointCloud):
    d2 = (
        jnp.sum(src.xy ** 2, 1)[:, None]
        + jnp.sum(ref.xy ** 2, 1)[None, :]
        - 2.0 * jnp.matmul(src.xy, ref.xy.T,
                           precision=jax.lax.Precision.HIGHEST)
    )
    d2 = jnp.where(ref.mask[None, :], d2, jnp.inf)
    return jnp.min(d2, axis=1)


@jax.jit
def p2p_quality(src: PointCloud, ref: PointCloud, radius: float = 2.0):
    """(mean NN squared distance, hit count) over neighbors within radius."""
    nn = _nn_sq_dists(src, ref)
    ok = src.mask & (nn <= radius * radius)
    n = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(jnp.where(ok, nn, 0.0)) / n, jnp.sum(ok)


@jax.jit
def keypoint_repeatability(src: PointCloud, ref: PointCloud,
                           radius: float = 1.0):
    """Fraction of valid source points with a ref neighbor within radius."""
    nn = _nn_sq_dists(src, ref)
    ok = src.mask & (nn <= radius * radius)
    return jnp.sum(ok) / jnp.maximum(jnp.sum(src.mask), 1)


@jax.jit
def p2d_quality(src: PointCloud, cells: Cells, radius: float = 2.0,
                regularization: float = 0.01):
    """Mean Mahalanobis distance of source points to the nearest CFEAR cell
    distribution within ``radius`` (p2dQuality, AlignmentQuality.h:154)."""
    d2 = (
        jnp.sum(src.xy ** 2, 1)[:, None]
        + jnp.sum(cells.mean ** 2, 1)[None, :]
        - 2.0 * jnp.matmul(src.xy, cells.mean.T,
                           precision=jax.lax.Precision.HIGHEST)
    )
    d2 = jnp.where(cells.valid[None, :], d2, jnp.inf)
    nn = jnp.argmin(d2, axis=1)
    nn_d2 = jnp.take_along_axis(d2, nn[:, None], 1)[:, 0]
    ok = src.mask & (nn_d2 <= radius * radius)

    mu = cells.mean[nn]
    cov = cells.cov[nn] + regularization * jnp.eye(2)
    e = src.xy - mu
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
    inv00 = cov[:, 1, 1] / det
    inv11 = cov[:, 0, 0] / det
    inv01 = -cov[:, 0, 1] / det
    maha = (e[:, 0] ** 2 * inv00 + 2 * e[:, 0] * e[:, 1] * inv01
            + e[:, 1] ** 2 * inv11)
    n = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(jnp.where(ok, maha, 0.0)) / n, jnp.sum(ok)


@partial(jax.jit, static_argnames=("size",))
def render_cartesian(cloud: PointCloud, extent: float, size: int = 128):
    """Scatter-add a cloud into a [size, size] intensity image."""
    scale = size / (2.0 * extent)
    ij = jnp.floor((cloud.xy + extent) * scale).astype(jnp.int32)
    inside = cloud.mask & jnp.all((ij >= 0) & (ij < size), axis=1)
    lin = jnp.where(inside, ij[:, 0] * size + ij[:, 1], size * size)
    img = jax.ops.segment_sum(
        jnp.where(inside, cloud.intensity, 0.0), lin,
        num_segments=size * size + 1)
    return img[:-1].reshape(size, size)


@partial(jax.jit, static_argnames=("size",))
def cartesian_absdiff_quality(src: PointCloud, ref: PointCloud,
                              extent: float = 100.0, size: int = 128):
    """Mean |img_src - img_ref| over occupied pixels (CorAlCartQuality)."""
    a = render_cartesian(src, extent, size)
    b = render_cartesian(ref, extent, size)
    occupied = (a > 0) | (b > 0)
    n = jnp.maximum(jnp.sum(occupied), 1)
    return jnp.sum(jnp.where(occupied, jnp.abs(a - b), 0.0)) / n
