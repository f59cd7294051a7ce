"""Secondary quality metrics (C19): aligned pairs must score better than
misaligned pairs on every metric."""
import numpy as np
import jax.numpy as jnp
import pytest

from tbv_slam_public_tpu.core.types import Cells, PointCloud, make_cells
from tbv_slam_public_tpu.ops import quality


def _cloud(rng, n=300, shift=0.0):
    xy = rng.uniform(-20, 20, (n, 2)).astype(np.float32)
    return PointCloud(
        xy=jnp.asarray(xy + shift),
        intensity=jnp.asarray(rng.uniform(60, 200, n).astype(np.float32)),
        mask=jnp.ones(n, bool)), xy


def test_p2p_quality_orders(rng):
    ref, xy = _cloud(rng)
    src_good = PointCloud(xy=jnp.asarray(xy + rng.normal(0, 0.05, xy.shape)
                                         .astype(np.float32)),
                          intensity=ref.intensity, mask=ref.mask)
    src_bad = PointCloud(xy=jnp.asarray(xy + 1.5), intensity=ref.intensity,
                         mask=ref.mask)
    good, n_good = quality.p2p_quality(src_good, ref)
    bad, n_bad = quality.p2p_quality(src_bad, ref)
    assert float(good) < float(bad)
    assert int(n_good) == 300


def test_repeatability(rng):
    ref, xy = _cloud(rng)
    src = PointCloud(xy=jnp.asarray(xy + 0.2), intensity=ref.intensity,
                     mask=ref.mask)
    r = quality.keypoint_repeatability(src, ref, radius=1.0)
    assert float(r) > 0.95
    far = PointCloud(xy=jnp.asarray(xy + 50.0), intensity=ref.intensity,
                     mask=ref.mask)
    assert float(quality.keypoint_repeatability(far, ref, radius=1.0)) < 0.2


def test_p2d_quality(rng):
    n_cells = 32
    cells = make_cells(n_cells)
    centers = rng.uniform(-10, 10, (n_cells, 2)).astype(np.float32)
    cells = cells.replace(
        mean=jnp.asarray(centers),
        cov=jnp.broadcast_to(0.2 * jnp.eye(2), (n_cells, 2, 2)),
        valid=jnp.ones(n_cells, bool))
    pts = np.repeat(centers, 4, axis=0) + rng.normal(0, 0.1, (n_cells * 4, 2))
    src = PointCloud(xy=jnp.asarray(pts.astype(np.float32)),
                     intensity=jnp.ones(n_cells * 4),
                     mask=jnp.ones(n_cells * 4, bool))
    good, _ = quality.p2d_quality(src, cells)
    src_off = src.replace(xy=src.xy + 0.8)
    bad, _ = quality.p2d_quality(src_off, cells)
    assert float(good) < float(bad)


def test_cartesian_absdiff(rng):
    ref, xy = _cloud(rng)
    same = quality.cartesian_absdiff_quality(ref, ref, extent=25.0)
    assert float(same) == 0.0
    shifted = PointCloud(xy=ref.xy + 3.0, intensity=ref.intensity,
                         mask=ref.mask)
    assert float(quality.cartesian_absdiff_quality(shifted, ref,
                                                   extent=25.0)) > 0.0
