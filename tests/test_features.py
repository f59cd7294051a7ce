"""Tests for CFEAR oriented-surface-point extraction (reference
pointnormal.cpp:7-297 semantics)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tbv_slam_public_tpu.core.config import FeatureConfig
from tbv_slam_public_tpu.core.types import PointCloud
from tbv_slam_public_tpu.ops import features


def make_cloud(xy, intensity=None):
    xy = np.asarray(xy, np.float32)
    n = xy.shape[0]
    if intensity is None:
        intensity = np.full(n, 160.0, np.float32)
    cap = max(64, n)
    pad = cap - n
    return PointCloud(
        xy=jnp.asarray(np.pad(xy, ((0, pad), (0, 0)))),
        intensity=jnp.asarray(np.pad(np.asarray(intensity, np.float32), (0, pad))),
        mask=jnp.asarray(np.arange(cap) < n),
    )


CFG = FeatureConfig(resolution=2.0, cell_capacity=32, grid_extent=50.0)


def test_eigh2x2_matches_numpy(rng):
    for _ in range(50):
        a = rng.normal(size=(2, 2))
        cov = (a @ a.T).astype(np.float32)
        lmin, lmax, v = features.eigh2x2(jnp.asarray(cov)[None])
        w, vecs = np.linalg.eigh(cov)
        np.testing.assert_allclose(float(lmin[0]), w[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(lmax[0]), w[1], rtol=1e-4, atol=1e-5)
        vn = np.asarray(v[0])
        cosang = abs(np.dot(vn, vecs[:, 0]))
        assert cosang > 1 - 1e-4


def test_line_cloud_normal_perpendicular(rng):
    """Points along a line -> normal perpendicular to it, oriented to origin."""
    t = np.linspace(-1.5, 1.5, 40)
    direction = np.array([np.cos(0.7), np.sin(0.7)])
    center = np.array([10.0, 5.0])
    pts = center + t[:, None] * direction
    pts += rng.normal(scale=0.01, size=pts.shape)
    cells = features.compute_cells(make_cloud(pts), CFG)
    valid = np.asarray(cells.valid)
    assert valid.sum() >= 1
    n = np.asarray(cells.normal)[valid]
    # perpendicular to the line direction
    assert np.all(np.abs(n @ direction) < 0.05)
    # oriented towards the sensor origin
    mu = np.asarray(cells.mean)[valid]
    assert np.all(np.sum(n * (0 - mu), axis=1) > 0)


def test_weighted_mean_covariance_golden():
    """Golden check of the intensity-weighted mean/cov (pointnormal.cpp:7-35)."""
    rng = np.random.default_rng(3)
    pts = np.array([[1.0, 1.0]]) + rng.normal(scale=0.5, size=(30, 2))
    intensity = rng.uniform(80, 200, size=30)
    cfg = FeatureConfig(resolution=4.0, cell_capacity=8, grid_extent=20.0,
                        max_cond=1e9, min_det=1e-12)
    cells = features.compute_cells(make_cloud(pts, intensity), cfg)
    valid = np.asarray(cells.valid)
    assert valid.sum() >= 1
    # pick the cell whose neighborhood covers all points (radius 4 > spread)
    idx = int(np.argmax(np.asarray(cells.nsamples)))
    assert np.asarray(cells.nsamples)[idx] == 30

    w = np.maximum(intensity - 60.0, 0)
    w = w / w.sum()
    mu = (w[:, None] * pts).sum(0)
    d = pts - mu
    cov = (w[:, None, None] * d[:, :, None] * d[:, None, :]).sum(0)
    np.testing.assert_allclose(np.asarray(cells.mean)[idx], mu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cells.cov)[idx], cov, atol=1e-3)
    lmin, lmax = np.linalg.eigvalsh(cov)
    plan = np.log1p(abs(lmax / lmin) / 2)
    np.testing.assert_allclose(np.asarray(cells.planarity)[idx], plan, rtol=1e-3)


def test_min_neighbor_gate():
    pts = np.array([[5.0, 5.0], [5.2, 5.0], [5.0, 5.2]])  # only 3 points
    cells = features.compute_cells(make_cloud(pts), CFG)
    assert int(np.asarray(cells.valid).sum()) == 0


def test_degenerate_line_rejected_by_det_gate():
    """A perfect line has det ~ 0 -> invalid under the 1e-5 det gate."""
    t = np.linspace(-1, 1, 20)
    pts = np.stack([t * 0.8 + 3.0, np.full_like(t, 2.0)], axis=1)
    cells = features.compute_cells(make_cloud(pts), CFG)
    assert int(np.asarray(cells.valid).sum()) == 0


def test_transform_cells_roundtrip(rng):
    pts = rng.uniform(-20, 20, size=(200, 2)).astype(np.float32)
    cells = features.compute_cells(
        make_cloud(pts), FeatureConfig(resolution=3.0, cell_capacity=64,
                                       grid_extent=50.0, max_cond=1e9,
                                       min_det=1e-12))
    pose = jnp.asarray([1.0, -2.0, 0.6], jnp.float32)
    fwd = features.transform_cells(cells, pose)
    from tbv_slam_public_tpu.core import se2
    back = features.transform_cells(fwd, se2.inverse(pose))
    np.testing.assert_allclose(np.asarray(back.mean), np.asarray(cells.mean),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(back.normal), np.asarray(cells.normal),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(back.cov), np.asarray(cells.cov),
                               atol=1e-4)
